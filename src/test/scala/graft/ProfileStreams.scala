package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the streaming entries' fixed overhead (test
  * source set): times each catalog stream entry twice (cold/warm) at
  * sf0.1 and prints the micro-batch duration breakdown of one stream.
  */
object ProfileStreams {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val names = Seq("x61_event_hourly_stream", "x65_dedup_stream",
      "x67_enrich_stream", "x69_sessionize_stream",
      "x73_interval_join_stream", "x88_cdc_apply_stream",
      "x110_event_dedup_stream")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      t(s"$n cold")(fn(spark, dir).write.format("noop").mode("overwrite").save())
      t(s"$n warm")(fn(spark, dir).write.format("noop").mode("overwrite").save())
    }
    // breakdown: re-run x61's stream shape directly, dumping progress
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("prof-ckpt").toString
    val srcDir = java.nio.file.Files.createTempDirectory("prof-src")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val raw = graft.streaming.Streams
      .eventsStream(ss, srcDir.toString, s"$dir/events.parquet")
    // the REAL x61 agg (sum of money-cast + select), not a count-only toy
    val agg = raw.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.core.Casts.asMoney(col("value")))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    (1 to 2).foreach { run =>
      val ck2 = java.nio.file.Files.createTempDirectory("prof-ckpt").toString
      val t0 = System.nanoTime()
      val q = agg.writeStream.format("memory").queryName(s"prof_x61_$run")
        .outputMode("complete")
        .option("checkpointLocation", ck2)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val tStream = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      ss.table(s"prof_x61_$run")
        .orderBy(col("window_start"), col("event_type"))
        .write.format("noop").mode("overwrite").save()
      val tSink = (System.nanoTime() - t1) / 1e9
      println(f"[prof] run$run real-x61 stream: $tStream%.2f s, sink+orderBy+noop: $tSink%.2f s")
      q.recentProgress.foreach { p =>
        println(s"[prof] run$run batch ${p.batchId} durationMs=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
