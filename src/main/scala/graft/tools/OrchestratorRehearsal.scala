package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.orchestrate.Orchestrator
import graft.orchestrate.Orchestrator.JobSpec
import graft.tools.ScaleRehearsal.{jsonStr, num}

/** Concurrent-dispatch rehearsal for the reference's orchestrator shape
  * (VERDICT r10 #2): the priority-group dispatcher
  * (`test_glue_job.ipynb` cell `9a918133` ≙ [[Orchestrator.run]],
  * `MAX_CONCURRENT_THREADS = 3`) is spec-tested with mock jobs, but the
  * production shape — several HEAVY engine jobs sharing one
  * SparkSession under FAIR scheduling — was configured, never measured.
  *
  * This main runs a 3-wide parallel group of real catalog families
  * (flagship star q10, TF-IDF x37, incremental dedup x38) at a
  * rehearsal decade, each in its own FAIR pool
  * ([[Orchestrator.inSparkPool]] — mode=FAIR alone leaves every job in
  * the FIFO-internal default pool), and records per iteration:
  *  - sequential wall (jobs one-by-one, the barrier baseline) and
  *    per-job secs
  *  - concurrent wall (Orchestrator.run, 3 threads) and per-job secs —
  *    the per-job concurrent/sequential floor ratio is the INTERFERENCE
  *    gauge (a job can legitimately slow while sharing cores; the group
  *    wall must shrink for concurrency to pay)
  *  - max persistent-RDD count SAMPLED during the concurrent group
  *    (CacheHygieneSpec's ≤1-per-call contract has never been observed
  *    under concurrency — three cache-borrowing jobs may legitimately
  *    hold up to one entry each, but a LEAK under concurrency would
  *    show as growth across iterations)
  *  - result checksums (order-independent xxhash64 sum + row count)
  *    computed sequentially and then again under concurrent dispatch —
  *    `hash_match` pins result-equality at the rehearsal decade.
  *  - a SECOND concurrent phase with every job left in the default pool
  *    (`mode=FAIR` alone — the misconfiguration inSparkPool exists to
  *    fix), plus per-job start→finish spans for both phases: all three
  *    dispatcher threads fire at t≈0, so FIFO-in-pool starvation shows
  *    as a stretched finish spread, not a late start.
  *
  * Usage: runMain graft.tools.OrchestratorRehearsal [dir] [outJson] [iters]
  * (defaults: target/scale10, ORCH_REHEARSAL.json, SPARK_GRAFT_REHEARSAL_N
  * or 2)
  */
object OrchestratorRehearsal {

  private val Jobs = Seq("q10_flagship_document", "x37_tfidf",
    "x38_incremental_dedup")

  private def runJob(spark: SparkSession, name: String, dir: String,
      pooled: Boolean = true): Unit = {
    def body(): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    if (pooled) Orchestrator.inSparkPool(spark, name)(body()) else body()
  }

  /** Order-independent result checksum: sum of per-row xxhash64 over all
    * columns (sorted names, cast to string) + row count. Commutative, so
    * concurrent and sequential executions of the same query must agree
    * exactly whatever partition order the scheduler produced. The sum
    * runs in decimal(38,0) — a long sum of 64-bit hashes overflows at
    * decade scale and ANSI mode (the engine default) correctly refuses.
    */
  private def checksum(spark: SparkSession, name: String, dir: String): (String, Long) = {
    val df = SparkEntry.queries(name)(spark, dir)
    val strs = df.columns.sorted.toIndexedSeq.map(c => col(c).cast("string"))
    val r = df.select(xxhash64(strs: _*).cast("decimal(38,0)").as("h"))
      .agg(coalesce(sum(col("h")), lit(0L)).cast("string"), count(lit(1))).head()
    (r.getString(0), r.getLong(1))
  }

  private def cleanup(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    System.gc()
  }

  /** Samples the session's persistent-RDD count while a concurrent group
    * runs — the cache-hygiene gauge the spec contract can't see.
    */
  private final class RddSampler(spark: SparkSession) extends Thread {
    @volatile private var running = true
    @volatile var max = 0
    setDaemon(true)
    override def run(): Unit = while (running) {
      max = math.max(max, spark.sparkContext.getPersistentRDDs.size)
      Thread.sleep(100)
    }
    def finish(): Int = { running = false; join(2000); max }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/scale10")
    val outJson = args.lift(1).getOrElse("ORCH_REHEARSAL.json")
    val iters = args.lift(2).map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_N", "2").toInt)
    val threads = 3 // the reference's MAX_CONCURRENT_THREADS
    val spark = graft.core.Sessions.local()
    spark.range(1000000L).selectExpr("sum(id)").collect() // session warmup

    val specs = Jobs.zipWithIndex.map { case (n, i) =>
      JobSpec(i, n, priority = 1, parallelRun = true)
    }
    val seqJob = Jobs.map(_ -> Seq.newBuilder[Double]).toMap
    val concJob = Jobs.map(_ -> Seq.newBuilder[Double]).toMap
    val nopoolJob = Jobs.map(_ -> Seq.newBuilder[Double]).toMap
    val seqWall, concWall, nopoolWall = Seq.newBuilder[Double]
    // per-phase failure builders (ADVICE r13 #3): each phase's JSON object
    // carries its OWN failed array — placement encodes the phase, so no
    // "[label]" prefix and no cross-phase leakage
    val concFailed = Map("pool" -> Seq.newBuilder[String],
      "nopool" -> Seq.newBuilder[String])
    val seqFailed = Seq.newBuilder[String]
    // per-iteration start→finish offsets (s, relative to group start) for
    // each job under concurrent dispatch — the starvation gauge: FIFO
    // inside one pool lets a long stage of job A push job B's FINISH out
    // even though B started immediately (all 3 dispatcher threads fire at
    // t≈0); FAIR pools should pull the finish spread back in
    val spanJson = Map("pool" -> Seq.newBuilder[String],
      "nopool" -> Seq.newBuilder[String])
    var maxRdds = 0

    def concPhase(label: String, pooled: Boolean, iter: Int,
        wall: scala.collection.mutable.Builder[Double, Seq[Double]],
        perJob: Map[String, scala.collection.mutable.Builder[Double, Seq[Double]]])
        : Unit = {
      val sampler = new RddSampler(spark)
      sampler.start()
      val spans = new java.util.concurrent.ConcurrentHashMap[String, (Double, Double)]()
      val t1 = System.nanoTime()
      val results = Orchestrator.run(specs, maxConcurrentThreads = threads) { s =>
        val a = (System.nanoTime() - t1) / 1e9
        try runJob(spark, s.targetTable, dir, pooled)
        finally spans.put(s.targetTable, (a, (System.nanoTime() - t1) / 1e9))
      }
      val cw = (System.nanoTime() - t1) / 1e9
      wall += cw
      maxRdds = math.max(maxRdds, sampler.finish())
      results.foreach { r =>
        if (r.outcome.isSuccess) perJob(r.spec.targetTable) += r.durationMs / 1000.0
        else concFailed(label) += s"${r.spec.targetTable}: ${r.outcome.failed.get.getMessage}"
        System.err.println(f"[orch] $label iter=$iter ${r.spec.targetTable} " +
          f"${r.durationMs / 1000.0}%.2f s ok=${r.outcome.isSuccess}")
      }
      spanJson(label) += Jobs.map { n =>
        Option(spans.get(n)) match {
          case Some((a, b)) => s""""$n":{"start":${num(a, 2)},"end":${num(b, 2)}}"""
          case None => s""""$n":null"""
        }
      }.mkString("{", ",", "}")
      System.err.println(f"[orch] $label iter=$iter wall $cw%.2f s max_rdds=${sampler.max}")
      cleanup(spark)
    }

    (0 until iters).foreach { i =>
      // sequential baseline: same jobs, one at a time. Guarded per job so
      // a single failure still leaves an artifact (the concurrent phase
      // records failures; the baseline must not be the weaker link).
      val t0 = System.nanoTime()
      Jobs.foreach { n =>
        val t = System.nanoTime()
        scala.util.Try(runJob(spark, n, dir)) match {
          case scala.util.Success(_) =>
            val s = (System.nanoTime() - t) / 1e9
            seqJob(n) += s
            System.err.println(f"[orch] seq  iter=$i $n $s%.2f s")
          case scala.util.Failure(e) =>
            seqFailed += s"$n: ${e.getMessage}"
            System.err.println(s"[orch] seq  iter=$i $n FAILED: ${e.getMessage}")
        }
      }
      val sw = (System.nanoTime() - t0) / 1e9
      seqWall += sw
      System.err.println(f"[orch] seq  iter=$i wall $sw%.2f s")
      cleanup(spark)

      // concurrent group: the reference's parallel dispatch, real jobs —
      // once per-job FAIR pools (the engine posture), once with every job
      // left in the FIFO-internal default pool (mode=FAIR alone), so the
      // inSparkPool scaladoc's starvation claim carries a measured delta
      concPhase("pool", pooled = true, i, concWall, concJob)
      concPhase("nopool", pooled = false, i, nopoolWall, nopoolJob)
    }

    // result-equality under concurrent dispatch (untimed): checksum each
    // job sequentially, then re-checksum with all three racing
    val seqSums = Jobs.map(n => n -> checksum(spark, n, dir)).toMap
    cleanup(spark)
    val concSums = new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
    Orchestrator.run(specs, maxConcurrentThreads = threads) { s =>
      val c = Orchestrator.inSparkPool(spark, s.targetTable) {
        checksum(spark, s.targetTable, dir)
      }
      concSums.put(s.targetTable, c)
    }
    val hashMatch = Jobs.forall(n => seqSums(n) == concSums.get(n))
    cleanup(spark)

    // materialize every builder exactly once (Builder.result() is not
    // guaranteed re-callable)
    val seqJobR = Jobs.map(n => n -> seqJob(n).result()).toMap
    val concJobR = Jobs.map(n => n -> concJob(n).result()).toMap
    val nopoolJobR = Jobs.map(n => n -> nopoolJob(n).result()).toMap
    def perJob(m: Map[String, Seq[Double]]) =
      Jobs.map { n =>
        s""""$n":${m(n).map(s => num(s)).mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
    val seqW = seqWall.result()
    val concW = concWall.result()
    val nopoolW = nopoolWall.result()
    def ratios(m: Map[String, Seq[Double]]) = Jobs.map { n =>
      val sq = seqJobR(n); val cc = m(n)
      if (sq.nonEmpty && cc.nonEmpty) s""""$n":${num(cc.min / sq.min, 2)}"""
      else s""""$n":null"""
    }.mkString("{", ",", "}")
    def phaseJson(perJobR: Map[String, Seq[Double]], w: Seq[Double],
        failed: Seq[String]) =
      s"""{"per_job":${perJob(perJobR)},"wall":${
        w.map(s => num(s)).mkString("[", ",", "]")},"failed":[${
        failed.map(f => s""""${jsonStr(f)}"""").mkString(",")}]}"""
    val json =
      s"""{"jobs":[${Jobs.map(j => s""""$j"""").mkString(",")}],""" +
        s""""dir":"${jsonStr(dir)}","threads":$threads,"iters":$iters,""" +
        s""""sequential":${phaseJson(seqJobR, seqW, seqFailed.result())},""" +
        s""""concurrent":${phaseJson(concJobR, concW, concFailed("pool").result())},""" +
        s""""concurrent_nopool":${phaseJson(nopoolJobR, nopoolW, concFailed("nopool").result())},""" +
        s""""spans":{"pool":${spanJson("pool").result().mkString("[", ",", "]")},""" +
        s""""nopool":${spanJson("nopool").result().mkString("[", ",", "]")}},""" +
        s""""wall_floor_sequential":${num(seqW.min)},""" +
        s""""wall_floor_concurrent":${num(concW.min)},""" +
        s""""wall_floor_concurrent_nopool":${num(nopoolW.min)},""" +
        s""""speedup_floor":${num(seqW.min / concW.min, 2)},""" +
        s""""speedup_floor_nopool":${num(seqW.min / nopoolW.min, 2)},""" +
        s""""interference_floor_ratio":${ratios(concJobR)},""" +
        s""""interference_floor_ratio_nopool":${ratios(nopoolJobR)},""" +
        s""""max_rdds_concurrent":$maxRdds,""" +
        s""""hash_match":$hashMatch,""" +
        s""""checksums":{${Jobs.map { n =>
          val (h, c) = seqSums(n)
          s""""$n":{"sum":"$h","rows":$c}"""
        }.mkString(",")}}}"""
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
