package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * The reference (AWS Glue PySpark jobs) relies on Glue's session defaults;
  * our engine pins the settings that matter at 100 TB: AQE (runtime coalesce,
  * skew-join splitting, SMJ→BHJ demotion), partition counts sized to cores in
  * local mode, and a UTC session so date arithmetic is reproducible against
  * the DuckDB oracle.
  */
object Sessions {

  /** Shuffle partitions: on a real cluster this should be ~2-3× total cores
    * (or left to AQE's coalescing with a high initial number); in local[N]
    * test mode, N is correct — 200 default partitions on 60k rows is pure
    * scheduling overhead.
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.scheduler.mode", "FAIR") // concurrent orchestrator jobs share fairly
      // Session-level, set ONCE here — not inside table loaders, where a
      // mid-flight conf write would race concurrent orchestrator jobs.
      // Widens the accepted events.ts encodings: a legacy TIMESTAMP(NANOS)
      // file reads as long (EventTime.canonicalTs converts); current
      // micros-NTZ/TIMESTAMP files don't need it and aren't affected.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the engine's tuning to an externally-provided builder/session
    * (e.g. the driver's Verify/Bench sessions own their master/partitions).
    * Runs once at entry-point setup; loaders never mutate session conf.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
