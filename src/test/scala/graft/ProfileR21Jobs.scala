package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** r21 probe: per-JOB timeline of a named query — how many Spark jobs a
  * single evaluation launches and where the wall-clock goes (job gaps =
  * driver-side planning/broadcast latency). Usage:
  *   Test/runMain graft.ProfileR21Jobs x104_fuzzy_join [x31_...]
  */
object ProfileR21Jobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long)] // id, start, end
    val starts = mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { starts(js.jobId) = js.time }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        synchronized { jobs += ((je.jobId, starts.getOrElse(je.jobId, je.time), je.time)) }
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm once
      noop(fn(spark, dir))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      Thread.sleep(200)
      synchronized { jobs.clear() }
      val t0 = System.currentTimeMillis()
      noop(fn(spark, dir))
      val t1 = System.currentTimeMillis()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      Thread.sleep(300)
      val snap = synchronized { jobs.toVector.sortBy(_._2) }
      println(f"[jobs] $name total ${(t1 - t0) / 1e3}%.3f s, ${snap.size} jobs")
      var prevEnd = t0
      snap.foreach { case (id, s, e) =>
        val gap = (s - prevEnd) / 1e3
        println(f"[jobs]   job=$id%-4d gap=$gap%6.3f run=${(e - s) / 1e3}%6.3f s")
        prevEnd = math.max(prevEnd, e)
      }
      println(f"[jobs]   tail-gap=${(t1 - prevEnd) / 1e3}%.3f s")
    }
    spark.stop()
  }
}
