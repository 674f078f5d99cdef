package graft

import org.apache.spark.sql.SparkSession

/** Reproduces the Bench session environment (conf + inter-query cleanup)
  * for a handful of queries to isolate why catalog timings diverge from
  * standalone profiler timings (test source set).
  */
object ProfileBenchEnv {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val names = Seq("x104_fuzzy_join", "x41_ann_lsh", "x43_ann_ivf")
    (1 to 3).foreach { round =>
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val rdds = spark.sparkContext.getPersistentRDDs.size
        println(f"[prof] r$round $n: $sec%.2f s (rdds=$rdds)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
      }
    }
    spark.stop()
  }
}
