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

  // ~200 CPU-bound tasks of ~100-300 ms each: pending-task queue stays
  // deep for the whole probe window on 32 slots
  private def saturator(spark: SparkSession): Unit =
    spark.range(0L, 6000000000L, 1L, 200)
      .select(sum(xxhash64(col("id")).cast("decimal(38,0)")))
      .write.format("noop").mode("overwrite").save()

  private def tiny(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 1000000L, 1L, 4).agg(sum(col("id"))).collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Run `samples` tiny-job latencies while a saturator runs on another
    * thread; `pooled` puts each thread in its own pool. Samples start
    * only after the saturator has been running ~1 s (queue is deep) and
    * stop if it drains early (latency would no longer measure contention).
    */
  private def measure(spark: SparkSession, pooled: Boolean, samples: Int): Seq[Double] = {
    @volatile var satDone = false
    val sat = new Thread(() => {
      val body = () => saturator(spark)
      try if (pooled) Orchestrator.inSparkPool(spark, "saturator")(body())
      else body()
      finally satDone = true
    })
    sat.start()
    Thread.sleep(1000)
    val out = Seq.newBuilder[Double]
    var i = 0
    while (i < samples && !satDone) {
      val s =
        if (pooled) Orchestrator.inSparkPool(spark, "latency")(tiny(spark))
        else tiny(spark)
      if (!satDone) out += s // discard a sample the saturator drained under
      i += 1
    }
    sat.join()
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.lift(0).getOrElse("FAIRNESS_PROBE.json")
    val samples = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.core.Sessions.local()
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    val alone = (0 until samples).map(_ => tiny(spark))
    val t0 = System.nanoTime()
    saturator(spark)
    val satAlone = (System.nanoTime() - t0) / 1e9
    val nopool = measure(spark, pooled = false, samples)
    val pool = measure(spark, pooled = true, samples)

    def stats(xs: Seq[Double]) =
      if (xs.isEmpty) """{"n":0}"""
      else {
        val s = xs.sorted
        s"""{"n":${xs.size},"min":${num(s.head, 3)},"median":${
          num(s(s.size / 2), 3)},"max":${num(s.last, 3)}}"""
      }
    val json =
      s"""{"saturator_secs_alone":${num(satAlone, 2)},""" +
        s""""tiny_alone":${stats(alone)},""" +
        s""""tiny_under_saturation_default_pool":${stats(nopool)},""" +
        s""""tiny_under_saturation_own_pools":${stats(pool)},""" +
        s""""samples_requested":$samples}"""
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
