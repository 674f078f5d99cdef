package graft.orchestrate

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

/** Driver-side multi-table orchestrator (SURVEY §2.10 O1-O6).
  *
  * Mirrors the reference's priority-group dispatcher
  * (`test_glue_job.ipynb` cell `9a918133`): jobs carry a priority and a
  * parallel flag; priorities run in ascending order with a barrier between
  * groups; within a group, sequential jobs run first one-by-one, then
  * parallel jobs fan out over a fixed thread pool with per-job failure
  * capture.
  *
  * Spark-specific: concurrent driver threads submitting jobs against one
  * shared SparkSession are the supported multi-tenancy model; pair with
  * `spark.scheduler.mode=FAIR` (set in graft.core.Sessions) so parallel
  * jobs share executors fairly instead of FIFO-starving.
  */
object Orchestrator {

  /** O1: job-control row (`{table_id, target_table, piority, parallel_run}`
    * — reference misspelling preserved in the source concept, not the API).
    */
  final case class JobSpec(
      tableId: Int,
      targetTable: String,
      priority: Int,
      parallelRun: Boolean)

  final case class JobResult(
      spec: JobSpec,
      outcome: Try[Unit],
      durationMs: Long,
      attempts: Int = 1)

  /** O1: load the job-control list from a DataFrame — the reference's
    * `get_job_control_list` reads `{table_id, target_table, piority,
    * parallel_run}` rows from a metadata table (`test_glue_job.ipynb`
    * cell `9a918133`); this accepts any frame with those columns
    * (reference's `piority` spelling or the corrected `priority`).
    * Collecting is correct here: job-control is metadata (dozens of
    * rows), not data.
    */
  def jobsFrom(df: org.apache.spark.sql.DataFrame): Seq[JobSpec] = {
    val cols = df.columns.toSet
    val prio = if (cols.contains("priority")) "priority" else "piority"
    df.select("table_id", "target_table", prio, "parallel_run")
      .collect()
      .map { r =>
        JobSpec(
          r.get(0).toString.toInt,
          r.getString(1),
          r.get(2).toString.toInt,
          r.get(3) match {
            case b: java.lang.Boolean => b.booleanValue()
            case s => s.toString.toBoolean
          })
      }
      .toSeq
  }

  /** Run all jobs honoring priority-group barriers and the
    * sequential-then-parallel discipline within each group (O2-O4).
    * Failures are captured per-job, never aborting the run (the
    * reference's per-future try/except). With `abortOnGroupFailure`,
    * later priority groups are skipped once a group has a failure —
    * the barrier semantics a dependency chain usually wants (group N+1
    * consumes group N's outputs).
    */
  def run(
      jobs: Seq[JobSpec],
      maxConcurrentThreads: Int = 3,
      abortOnGroupFailure: Boolean = false,
      maxAttempts: Int = 1,
      retryBackoffMs: Long = 0L)(
      process: JobSpec => Unit): Seq[JobResult] = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val pool = Executors.newFixedThreadPool(maxConcurrentThreads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      var aborted = false
      jobs.map(_.priority).distinct.sorted.flatMap { priority =>
        if (aborted) Seq.empty
        else {
          val group = jobs.filter(_.priority == priority)
          val (parallel, sequential) = group.partition(_.parallelRun)
          val attempt = timed(process, maxAttempts, retryBackoffMs) _
          val seqResults = sequential.map(attempt)
          val parResults =
            if (parallel.isEmpty) Seq.empty
            else Await.result(
              Future.sequence(parallel.map(j => Future(attempt(j)))),
              Duration.Inf)
          val results = seqResults ++ parResults
          if (abortOnGroupFailure && results.exists(_.outcome.isFailure))
            aborted = true
          results
        }
      }
    } finally pool.shutdown()
  }

  /** Per-job retry with linear backoff (O-ext): transient failures —
    * executor OOM, S3 throttling, metastore hiccups — are the norm in
    * long ingestion runs; a bounded in-place retry beats failing the
    * whole group barrier. The job body must be idempotent (the lake
    * writer's dynamic-partition overwrite / run-index folders are).
    */
  private def timed(
      process: JobSpec => Unit,
      maxAttempts: Int,
      backoffMs: Long)(spec: JobSpec): JobResult = {
    val t0 = System.nanoTime()
    var attempts = 0
    var outcome: Try[Unit] = null
    while ({
      attempts += 1
      outcome = Try(process(spec))
      outcome.isFailure && attempts < maxAttempts
    }) if (backoffMs > 0) Thread.sleep(backoffMs * attempts)
    JobResult(spec, outcome, (System.nanoTime() - t0) / 1000000L, attempts)
  }
}
