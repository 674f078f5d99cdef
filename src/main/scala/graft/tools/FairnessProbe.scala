package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.orchestrate.Orchestrator
import graft.tools.ScaleRehearsal.num

/** Positive witness for the [[Orchestrator.inSparkPool]] starvation
  * claim (SURVEY §13.1): ORCH_REHEARSAL's three-family mix showed NO
  * pool-vs-default delta because those jobs never saturate all 32 slots
  * for long — FIFO backfills idle slots regardless. This probe builds
  * the shape the claim is actually about: a SATURATING job (many more
  * pending tasks than slots, each non-trivial) racing a TINY job on the
  * same session, and measures the tiny job's completion latency
  *  - alone (baseline),
  *  - under saturation with BOTH jobs in the FIFO-internal default pool
  *    (`spark.scheduler.mode=FAIR` alone — the misconfiguration), and
  *  - under saturation with each thread in its OWN pool via
  *    `inSparkPool` (the engine posture).
  * FIFO-in-pool offers every slot to the earlier-submitted job while it
  * has pending tasks, so the tiny job should wait ~the saturator's
  * remaining runtime; FAIR between pools entitles the tiny job's pool
  * to slots at the next task boundary, so its latency should drop to
  * ~a task duration. Emits FAIRNESS_PROBE.json.
  *
  * Usage: runMain graft.tools.FairnessProbe [outJson] [samples]
  */
object FairnessProbe {

  // ~200×scale CPU-bound tasks of ~100-300 ms each: pending-task queue
  // stays deep for the whole probe window on 32 slots. `scale` deepens
  // the queue (more tasks of the SAME size — per-task duration is what
  // the starvation story is about) so a faster host can't drain the
  // saturator mid-probe (VERDICT r13 #6).
  private def saturator(spark: SparkSession, scale: Int): Unit =
    spark.range(0L, 6000000000L * scale, 1L, 200 * scale)
      .select(sum(xxhash64(col("id")).cast("decimal(38,0)")))
      .write.format("noop").mode("overwrite").save()

  private def tiny(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 1000000L, 1L, 4).agg(sum(col("id"))).collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Run tiny-job latencies while a saturator runs on another thread;
    * `pooled` puts each thread in its own pool. Samples start only after
    * the saturator has been running ~1 s (queue is deep). A sample the
    * saturator drained under is discarded (it no longer measures
    * contention) and ENDS the phase — once the saturator is done there
    * is no contention left to sample, so the loop exits with whatever
    * valid latencies it collected (at most one discard per phase; the
    * 4×samples iteration cap is a hang backstop, ADVICE r14 #4). A
    * shortfall is never silent: the artifact reports the discard count
    * and `min_n_ok`, and main() exits nonzero when the latter is false.
    */
  private def measure(spark: SparkSession, pooled: Boolean, samples: Int,
      scale: Int): (Seq[Double], Int) = {
    @volatile var satDone = false
    val sat = new Thread(() => {
      val body = () => saturator(spark, scale)
      try if (pooled) Orchestrator.inSparkPool(spark, "saturator")(body())
      else body()
      finally satDone = true
    })
    sat.start()
    Thread.sleep(1000)
    var kept = List.empty[Double]
    var discarded = 0
    var iters = 0
    while (kept.size < samples && !satDone && iters < samples * 4) {
      val s =
        if (pooled) Orchestrator.inSparkPool(spark, "latency")(tiny(spark))
        else tiny(spark)
      if (!satDone) kept ::= s else discarded += 1
      iters += 1
    }
    sat.join()
    (kept.reverse, discarded)
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.lift(0).getOrElse("FAIRNESS_PROBE.json")
    val samples = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.core.Sessions.local()
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    val alone = (0 until samples).map(_ => tiny(spark))
    val t0 = System.nanoTime()
    saturator(spark, 1)
    val satAlone = (System.nanoTime() - t0) / 1e9
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted // even n: average the two middle elements
      (s((s.size - 1) / 2) + s(s.size / 2)) / 2
    }
    // size the saturator to the HOST: it must outlast ~1 s of warmup plus
    // `samples` contended latencies with 1.5× headroom, so a faster host
    // deepens the queue instead of quietly producing a 2-sample "no
    // starvation" claim (VERDICT r13 #6)
    val window = 1.0 + samples * math.max(0.4, 5 * median(alone))
    val scale = math.max(1, math.ceil(1.5 * window / satAlone).toInt)
    val (nopool, nopoolDropped) = measure(spark, pooled = false, samples, scale)
    val (pool, poolDropped) = measure(spark, pooled = true, samples, scale)

    def stats(xs: Seq[Double], dropped: Int) =
      if (xs.isEmpty) s"""{"n":0,"samples_discarded":$dropped}"""
      else {
        val s = xs.sorted
        s"""{"n":${xs.size},"min":${num(s.head, 3)},"median":${
          num(median(xs), 3)},"max":${num(s.last, 3)},"samples_discarded":$dropped}"""
      }
    val minN = math.ceil(samples / 2.0).toInt
    val minNOk = nopool.size >= minN && pool.size >= minN
    if (!minNOk)
      System.err.println(s"[fairness] ERROR: collected n " +
        s"(${nopool.size}/${pool.size}) below $minN of $samples requested " +
        "despite saturator scaling — medians are indicative only; " +
        "exiting nonzero so an automated re-run can't archive this probe")
    val json =
      s"""{"saturator_secs_alone":${num(satAlone, 2)},""" +
        s""""saturator_scale":$scale,""" +
        s""""tiny_alone":${stats(alone, 0)},""" +
        s""""tiny_under_saturation_default_pool":${stats(nopool, nopoolDropped)},""" +
        s""""tiny_under_saturation_own_pools":${stats(pool, poolDropped)},""" +
        s""""samples_requested":$samples,""" +
        s""""min_n_ok":$minNOk}"""
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
    // hard-fail AFTER the artifact is written (VERDICT r14 #7): the JSON
    // still lands for inspection, but the nonzero exit stops an automated
    // harness from quietly archiving an under-sampled probe
    if (!minNOk) sys.exit(1)
  }
}
