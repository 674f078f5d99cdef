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
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val raw = ss.readStream
      .schema(graft.streaming.Streams.EventsRawSchema)
      .parquet(srcDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val agg = raw.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val t0 = System.nanoTime()
    val q = agg.writeStream.format("memory").queryName("prof_x61")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println(f"[prof] direct x61-shape total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    q.recentProgress.foreach { p =>
      println(s"[prof] batch ${p.batchId} durationMs=${p.durationMs}")
    }
    spark.stop()
  }
}
