package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version-pointer table layout: the truly gap-free publish that an
  * in-place directory swap cannot provide (between "move old aside" and
  * "move staging in" the table path does not exist; see
  * [[LakeWriter.compact]]'s contract note).
  *
  * Layout under a table root:
  * {{{
  *   root/v000001/...parquet     immutable version directories
  *   root/v000002/...parquet
  *   root/_CURRENT               one line: name of the live version dir
  * }}}
  *
  * A publish writes a brand-new version directory, then repoints
  * `_CURRENT` with an atomic file replace (write `_CURRENT.tmp`, then
  * `ATOMIC_MOVE` onto `_CURRENT`). Readers resolve the pointer and read
  * an immutable directory, so there is NO instant at which the table is
  * missing or partially written — the reader sees the old version until
  * the exact rename instant, the new one after.
  *
  * Crash safety (single-writer discipline, which the orchestrator's
  * job-control layer provides): a crash before the pointer move leaves an
  * orphan version directory that `_CURRENT` never references — readers
  * are unaffected and [[vacuum]] reclaims it. A crash after the move is a
  * completed publish. No recovery step is ever required to read.
  *
  * Scale notes: this is the same indirection Delta/Iceberg implement with
  * a log/manifest — on an object store the pointer becomes a small
  * put-if-match object, and version directories are never renamed (S3
  * renames are copies; the pointer is the only thing that changes).
  * [[vacuum]] keeps the last `keep` versions so in-flight readers of the
  * previous version finish before their files disappear.
  */
object Versioned {

  private val Pointer = "_CURRENT"
  private val VerDir = """v(\d{6})""".r

  private def root(p: String): Path = Paths.get(p.stripSuffix("/"))

  private def listVersions(rootPath: Path): Seq[Int] =
    if (!Files.isDirectory(rootPath)) Nil
    else
      Files.list(rootPath).iterator.asScala
        .map(_.getFileName.toString)
        .collect { case VerDir(n) => n.toInt }
        .toSeq
        .sorted

  /** The live version number, if the table has ever been published. */
  def currentVersion(tableRoot: String): Option[Int] = {
    val ptr = root(tableRoot).resolve(Pointer)
    if (!Files.exists(ptr)) None
    else new String(Files.readAllBytes(ptr), "UTF-8").trim match {
      case VerDir(n) => Some(n.toInt)
      case other => throw new IllegalStateException(
        s"corrupt $Pointer pointer: '$other'")
    }
  }

  private def dirName(v: Int): String = f"v$v%06d"

  /** Publish `df` as the next version and atomically repoint readers to
    * it. Returns the published version number. The previous version's
    * files are untouched (reclaim with [[vacuum]]).
    */
  def publish(
      df: DataFrame,
      tableRoot: String,
      maxRecordsPerFile: Long = LakeWriter.ProductionMaxRecordsPerFile): Int = {
    val rootPath = root(tableRoot)
    Files.createDirectories(rootPath)
    // next = max over DIRECTORIES (not the pointer): a crashed publish
    // leaves an orphan dir above the pointer, and reusing its number
    // would write into a non-empty directory
    val next = listVersions(rootPath).lastOption.getOrElse(0) + 1
    val target = rootPath.resolve(dirName(next))
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "snappy")
      .parquet(target.toString)
    val tmp = rootPath.resolve(Pointer + ".tmp")
    Files.write(tmp, (dirName(next) + "\n").getBytes("UTF-8"))
    Files.move(tmp, rootPath.resolve(Pointer),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read the live version. Never observes a partial or missing table:
    * the pointer flips atomically between immutable directories.
    */
  def read(spark: SparkSession, tableRoot: String): DataFrame = {
    val v = currentVersion(tableRoot).getOrElse(
      throw new IllegalStateException(s"no published version under $tableRoot"))
    spark.read.parquet(root(tableRoot).resolve(dirName(v)).toString)
  }

  /** Rewrite the live version into ceil(bytes/targetBytes) files and
    * publish the result — [[LakeWriter.compact]] semantics without the
    * reader-visible not-found window. Returns the new version number.
    */
  def compact(
      spark: SparkSession,
      tableRoot: String,
      targetBytes: Long = 256L * 1024 * 1024): Int = {
    val df = read(spark, tableRoot)
    val totalBytes = df.inputFiles.map(f =>
      Files.size(Paths.get(new java.net.URI(f)))).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    publish(df.repartition(nFiles), tableRoot)
  }

  /** Delete version directories other than the `keep` most recent
    * published ones (the live version is always kept). Orphans ABOVE the
    * pointer — leftovers of crashed publishes — are also reclaimed; under
    * the single-writer discipline nothing else writes there. Returns the
    * number of directories removed.
    */
  def vacuum(tableRoot: String, keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the live version")
    val rootPath = root(tableRoot)
    val current = currentVersion(tableRoot).getOrElse(return 0)
    val published = listVersions(rootPath).filter(_ <= current)
    val retained = published.takeRight(keep).toSet
    val doomed = listVersions(rootPath).filterNot(v => retained(v) || v == current)
    doomed.foreach { v =>
      org.apache.commons.io.FileUtils
        .deleteDirectory(rootPath.resolve(dirName(v)).toFile)
    }
    doomed.size
  }
}
