package graft.core

/** Recursive delete-at-exit for scratch DIRECTORIES.
  *
  * `File.deleteOnExit` only removes empty files, so every operator or
  * harness that materializes per-run state under `java.io.tmpdir` (x38's
  * incremental-dedup state, the rehearsal's lake chains and ANN index
  * roots) used to leak it — measured at ~8.5 GB of orphans after one
  * round of rehearsals, enough to matter on this host where the deep
  * decades' shuffle spill already runs the disk to the edge. Deletion
  * must wait for JVM exit (not op end) because the registrant usually
  * returns a LAZY DataFrame over the scratch; the shutdown hook runs
  * after every action has finished. Failures are swallowed: reaping is
  * best-effort hygiene, never worth failing a result for.
  */
object Scratch {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val hookOnce: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.forEach { f =>
        try org.apache.commons.io.FileUtils.deleteDirectory(f)
        catch { case _: Throwable => () }
      }))

  /** Register `dir` for recursive deletion at JVM exit; returns it. */
  def reapAtExit(dir: String): String = {
    hookOnce
    roots.add(new java.io.File(dir))
    dir
  }
}
