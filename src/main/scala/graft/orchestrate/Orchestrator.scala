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

  /** Run `body` with this thread's Spark jobs assigned to FAIR scheduler
    * pool `name`. `spark.scheduler.mode=FAIR` alone is NOT enough for
    * parallel orchestrator jobs to share executors fairly: every job
    * lands in the "default" pool, whose INTERNAL scheduling is FIFO — a
    * long stage of job A starves job B's stages until it drains. One
    * pool per job (undeclared pools get equal weight and FAIR treatment
    * BETWEEN pools) restores round-robin between concurrent jobs.
    * Measured, twice (both artifacts committed): ORCH_REHEARSAL.json
    * (3 real families at 10×, n=3) shows pool-vs-default walls within
    * noise (10.10 vs 10.91 floor) — that mix never saturates all 32
    * slots for long. FAIRNESS_PROBE.json then forced the saturating
    * shape (200-task CPU-bound stage vs a 0.09 s job, n=9): the small
    * job degrades to ~0.5 s median in BOTH modes — on local[32] the
    * scheduler grants slots at task-finish boundaries either way, and
    * the hard FIFO-starvation story did not reproduce. Keep per-job
    * pools anyway: they make the schedule independent of submission
    * order, are where weight/minShare levers attach on a real cluster
    * (where locality delay and executor-grain offers change the
    * picture), and cost nothing. The
    * property is thread-local and the orchestrator's pool threads are
    * reused across jobs, so it is set around the body and the PREVIOUS
    * value restored after — a nested call (or a caller that already
    * assigned a pool on this thread) keeps its own assignment.
    */
  def inSparkPool[A](spark: org.apache.spark.sql.SparkSession, name: String)(
      body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", name)
    try body finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }

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

  /** Explicit-dependency job node for [[runDag]]. */
  final case class DagJob(id: String, dependsOn: Set[String] = Set.empty)

  /** Load a dependency DAG from a metadata frame — the [[jobsFrom]]
    * analogue for [[runDag]]. Accepts `{job_id, depends_on}` rows where
    * `depends_on` is an array of ids, a comma-separated string, or
    * null/empty for roots. Collecting is correct: job-control is
    * metadata (dozens of rows), not data.
    */
  def dagFrom(df: org.apache.spark.sql.DataFrame): Seq[DagJob] =
    df.select("job_id", "depends_on")
      .collect()
      .map { r =>
        val deps: Set[String] = r.get(1) match {
          case null => Set.empty
          case xs: scala.collection.Seq[_] =>
            xs.iterator.map(_.toString.trim).filter(_.nonEmpty).toSet
          case s: String =>
            s.split(',').iterator.map(_.trim).filter(_.nonEmpty).toSet
          case other => throw new IllegalArgumentException(
            s"unsupported depends_on value: $other")
        }
        DagJob(r.get(0).toString, deps)
      }
      .toSeq

  /** [[runDag]] outcome: `skipped` jobs never ran because a transitive
    * dependency failed (their `outcome` carries the cause).
    */
  final case class DagResult(
      id: String,
      outcome: Try[Unit],
      durationMs: Long,
      attempts: Int,
      skipped: Boolean)

  /** The reference's priority plan expressed as a DAG — the executable
    * form of "runDag strictly generalizes run": within a group,
    * sequential jobs chain in list order and parallel jobs hang off the
    * last sequential one (free to overlap each other); every group-N+1
    * job depends on ALL of group N (the barrier). Job ids are
    * `targetTable`.
    */
  def dagFromPriorities(jobs: Seq[JobSpec]): Seq[DagJob] = {
    val ids = jobs.map(_.targetTable)
    require(ids.distinct.size == ids.size,
      s"duplicate target tables: ${ids.diff(ids.distinct).distinct.mkString(", ")}")
    val groups = jobs.groupBy(_.priority).toSeq.sortBy(_._1).map(_._2)
    groups.foldLeft((Seq.empty[DagJob], Set.empty[String])) {
      case ((acc, prevGroup), group) =>
        val (parallel, sequential) = group.partition(_.parallelRun)
        val seqJobs = sequential.zipWithIndex.map { case (j, i) =>
          val dep =
            if (i == 0) prevGroup
            else Set(sequential(i - 1).targetTable)
          DagJob(j.targetTable, dep)
        }
        val parDep =
          sequential.lastOption.map(j => Set(j.targetTable)).getOrElse(prevGroup)
        val parJobs = parallel.map(j => DagJob(j.targetTable, parDep))
        (acc ++ seqJobs ++ parJobs, group.map(_.targetTable).toSet)
    }._1
  }

  /** Dependency-DAG dispatch — the finer-grained alternative to priority
    * groups: each job starts the moment ITS dependencies finish, rather
    * than when a whole group barrier clears. With a 1000-executor cluster
    * behind the session, a group barrier idles unrelated work behind the
    * group's straggler; DAG dispatch keeps the pool saturated (a priority
    * plan is expressible as the chain group(N+1) ← all of group(N), so
    * this strictly generalizes [[run]]).
    *
    * Failure semantics: a failed job (after `maxAttempts`) marks every
    * transitive dependent `skipped` — the partial-progress behavior a
    * multi-table ingestion wants (independent subtrees complete). Cycles
    * and unknown/duplicate ids are rejected up front.
    */
  def runDag(
      jobs: Seq[DagJob],
      maxConcurrentThreads: Int = 3,
      maxAttempts: Int = 1,
      retryBackoffMs: Long = 0L)(
      process: DagJob => Unit): Seq[DagResult] = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val ids = jobs.map(_.id)
    require(ids.distinct.size == ids.size,
      s"duplicate job ids: ${ids.diff(ids.distinct).distinct.mkString(", ")}")
    val known = ids.toSet
    jobs.foreach { j =>
      val missing = j.dependsOn.diff(known)
      require(missing.isEmpty,
        s"job '${j.id}' depends on unknown job(s): ${missing.mkString(", ")}")
    }
    // Kahn's algorithm up front: reject cycles before running anything.
    val dependents: Map[String, Seq[String]] = jobs
      .flatMap(j => j.dependsOn.map(_ -> j.id))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    locally {
      val indeg = scala.collection.mutable.Map(jobs.map(j => j.id -> j.dependsOn.size): _*)
      val queue = scala.collection.mutable.Queue(jobs.collect {
        case j if j.dependsOn.isEmpty => j.id
      }: _*)
      var seen = 0
      while (queue.nonEmpty) {
        val id = queue.dequeue(); seen += 1
        dependents.getOrElse(id, Nil).foreach { d =>
          indeg(d) -= 1; if (indeg(d) == 0) queue.enqueue(d)
        }
      }
      require(seen == jobs.size,
        s"dependency cycle among: ${indeg.collect { case (k, v) if v > 0 => k }.toSeq.sorted.mkString(", ")}")
    }

    val byId = jobs.map(j => j.id -> j).toMap
    val pool = Executors.newFixedThreadPool(maxConcurrentThreads)
    val doneQueue = new java.util.concurrent.LinkedBlockingQueue[DagResult]()
    try {
      val remainingDeps = scala.collection.mutable.Map(
        jobs.map(j => j.id -> j.dependsOn.size): _*)
      val failedOrSkipped = scala.collection.mutable.Set.empty[String]
      val results = scala.collection.mutable.ArrayBuffer.empty[DagResult]

      def submit(id: String): Unit = pool.execute { () =>
        val t0 = System.nanoTime()
        var attempts = 0
        var outcome: Try[Unit] = null
        // Try only catches NonFatal — an OOM/StackOverflow/interrupt in a
        // job body would otherwise kill this worker WITHOUT enqueuing a
        // result and deadlock the take() loop below. Every submitted job
        // must produce exactly one DagResult, whatever it throws.
        try
          while ({
            attempts += 1
            outcome = Try(process(byId(id)))
            outcome.isFailure && attempts < maxAttempts
          }) if (retryBackoffMs > 0) Thread.sleep(retryBackoffMs * attempts)
        catch {
          case t: Throwable => outcome = scala.util.Failure(t)
        }
        doneQueue.put(DagResult(
          id, outcome, (System.nanoTime() - t0) / 1000000L,
          math.max(1, attempts), skipped = false))
      }

      jobs.foreach(j => if (j.dependsOn.isEmpty) submit(j.id))
      while (results.size < jobs.size) {
        val res = doneQueue.take()
        results += res
        if (res.outcome.isFailure || res.skipped) failedOrSkipped += res.id
        dependents.getOrElse(res.id, Nil).foreach { d =>
          remainingDeps(d) -= 1
          if (remainingDeps(d) == 0) {
            val badDeps = byId(d).dependsOn.intersect(failedOrSkipped)
            if (badDeps.nonEmpty)
              // cascade through the completion queue so THIS job's own
              // dependents get skipped by the same path
              doneQueue.put(DagResult(
                d,
                scala.util.Failure(new IllegalStateException(
                  s"skipped: dependency failed (${badDeps.toSeq.sorted.mkString(", ")})")),
                0L, 0, skipped = true))
            else submit(d)
          }
        }
      }
      results.toSeq
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
