package graft.orchestrate

import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** Date-range backfill planning — the reference's operational loop
  * (re-running the flagship over [start, end) windows) made first-class:
  * split a range into half-open chunks, run each as a job whose write is
  * idempotent (dynamic partition overwrite / run-index folders), so a
  * failed backfill resumes by re-running only its failed windows.
  *
  * Windows are emitted as [[Orchestrator.DagJob]]s with NO dependencies
  * between them (each window's output partitions are disjoint) — the
  * whole backfill runs at pool concurrency, and [[Orchestrator.runDag]]
  * cascade-skips nothing on an isolated window failure. Chain a
  * downstream job on all windows when publication must gate on
  * completeness.
  */
object Backfill {

  /** Half-open, contiguous, gap-free chunks covering [start, end):
    * `[s, s+chunkDays), [s+chunkDays, ...)...`, last chunk clamped to
    * `end`. Dates are ISO `yyyy-MM-dd` strings (the engine's date-window
    * convention — string order ≡ date order).
    */
  def windows(
      startInclusive: String,
      endExclusive: String,
      chunkDays: Int): Seq[(String, String)] = {
    require(chunkDays >= 1, s"chunkDays must be >= 1, got $chunkDays")
    val start = LocalDate.parse(startInclusive)
    val end = LocalDate.parse(endExclusive)
    require(!end.isBefore(start), s"end $endExclusive before start $startInclusive")
    val nDays = ChronoUnit.DAYS.between(start, end)
    (0L until nDays by chunkDays.toLong).map { off =>
      val lo = start.plusDays(off)
      val hi = start.plusDays(math.min(off + chunkDays, nDays))
      (lo.toString, hi.toString)
    }
  }

  /** One independent DagJob per window, id `prefix@<start>`. */
  def jobs(
      startInclusive: String,
      endExclusive: String,
      chunkDays: Int,
      prefix: String = "backfill"): Seq[Orchestrator.DagJob] =
    windows(startInclusive, endExclusive, chunkDays)
      .map { case (lo, _) => Orchestrator.DagJob(s"$prefix@$lo") }

  /** Window bounds back out of a job id minted by [[jobs]]. */
  def windowOf(
      job: Orchestrator.DagJob,
      startInclusive: String,
      endExclusive: String,
      chunkDays: Int): (String, String) = {
    val lo = job.id.substring(job.id.indexOf('@') + 1)
    windows(startInclusive, endExclusive, chunkDays)
      .find(_._1 == lo)
      .getOrElse(throw new IllegalArgumentException(s"no window starts at $lo"))
  }
}
