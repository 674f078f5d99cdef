package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.core.{EventTime, Tables}
import graft.streaming.Streams

/** The encoding matrix, pinned forever (VERDICT r7 "Next round" #2): the
  * SAME logical events must decode identically through batch AND streaming
  * paths whatever the physical `ts` encoding the driver ships —
  * INT64 nanos-as-long (rounds ≤7), TIMESTAMP_NTZ micros (round 8's
  * testdata), plain TIMESTAMP (the engine's own writes). And a mis-decoded
  * encoding must REFUSE loudly, never answer with 1970-era rows.
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  // a 2024-era base well inside the plausibility band
  private val baseUs = 1704067200L * 1000000L // 2024-01-01T00:00:00Z, micros

  /** Logical fixture: (event_id, epoch-micros, user_id, type, value, props)
    * spanning four hours so the hourly agg has >1 window.
    */
  private val rows: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, baseUs + 5L * 60 * 1000000, 10L, "view", 1.5, "{}"),
    (2L, baseUs + 15L * 60 * 1000000, 10L, "view", 2.5, "{}"),
    (3L, baseUs + 65L * 60 * 1000000, 11L, "click", 0.5, "{}"),
    (4L, baseUs + 125L * 60 * 1000000, 10L, "purchase", 9.0, "{}"),
    (5L, baseUs + 185L * 60 * 1000000, 12L, "view", 3.0, "{}"))

  private def logical: DataFrame = rows
    .toDF("event_id", "us", "user_id", "event_type", "value", "props")

  /** Write the fixture as a SINGLE parquet file `<tmp>/events.parquet` in
    * the given encoding — a file, not a directory, matching the testdata
    * layout the streaming symlink sources expect. Returns the dir.
    */
  private def writeFixture(encoding: String, df: DataFrame = logical): String = {
    val dir = Files.createTempDirectory(s"graft-enc-$encoding")
    val ts = encoding match {
      case "long_nanos" => (col("us") * lit(1000L)).as("ts")
      case "ntz_micros" => timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")
      case "timestamp" => timestamp_micros(col("us")).as("ts")
      case "long_micros_drift" => col("us").as("ts") // micros in a long column
    }
    val staging = Files.createTempDirectory("graft-enc-stage")
    df.select(col("event_id"), ts, col("user_id"), col("event_type"),
      col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, dir.resolve("events.parquet"))
    dir.toString
  }

  private val encodings = Seq("long_nanos", "ntz_micros", "timestamp")

  test("Tables.events canonicalizes every physical encoding to the same instants") {
    val decoded = encodings.map { enc =>
      val e = Tables.events(spark, writeFixture(enc))
      assert(e.schema("ts").dataType === TimestampType,
        s"$enc must canonicalize to TimestampType")
      enc -> e.select($"event_id", EventTime.epochUs($"ts"))
        .as[(Long, Long)].collect().toSet
    }
    val expected = rows.map(r => (r._1, r._2)).toSet
    decoded.foreach { case (enc, got) =>
      assert(got === expected, s"encoding $enc decoded to wrong instants")
    }
  }

  test("batch hourly agg is identical across all three encodings") {
    val results = encodings.map { enc =>
      enc -> Streams.hourlyAgg(Tables.events(spark, writeFixture(enc)))
        .collect().map(_.toSeq).toSet
    }
    results.sliding(2).foreach { case Seq((a, ra), (b, rb)) =>
      assert(ra === rb, s"hourlyAgg($a) != hourlyAgg($b)")
    }
    assert(results.head._2.size > 1, "fixture must span multiple windows")
  }

  test("streaming hourly agg sniffs the encoding and matches batch for each") {
    encodings.foreach { enc =>
      val dir = writeFixture(enc)
      val streamed = Streams.hourlyAggStreaming(spark, dir)
        .select($"window_start", $"event_type", $"n_events", $"sum_value")
        .collect().map(_.toSeq).toSet
      val batch = Streams.hourlyAgg(Tables.events(spark, dir))
        .select($"window_start", $"event_type", $"n_events", $"sum_value")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch, s"stream != batch under encoding $enc")
    }
  }

  test("a mis-decodable drift refuses loudly instead of answering (batch)") {
    // Simulate the exact r7 silent-garbage mode: a LONG column that holds
    // MICROS (not the nanos the long contract promises) — `DIV 1000` lands
    // every instant in January 1970. The plausibility gate must throw.
    val dir = writeFixture("long_micros_drift")
    val e = intercept[IllegalArgumentException](
      Tables.events(spark, dir).collect())
    assert(e.getMessage.contains("plausibility"), e.getMessage)
  }

  test("a mis-decodable drift refuses loudly instead of answering (streaming)") {
    val dir = writeFixture("long_micros_drift")
    val e = intercept[IllegalArgumentException](
      Streams.hourlyAggStreaming(spark, dir))
    assert(e.getMessage.contains("plausibility"), e.getMessage)
  }

  test("a heterogeneous root (mixed encodings) refuses loudly before reading") {
    // The delivery-drift variant of the r7 bug: a long-nanos root receives
    // a later NTZ-micros delivery. The imposed LongType schema would read
    // the new file's raw micros with NO error from the parquet layer —
    // the guard must refuse at the footer before any rows flow.
    val dir = Files.createTempDirectory("graft-enc-hetero")
    def part(encoding: String, name: String): Unit = {
      val src = writeFixture(encoding)
      Files.copy(java.nio.file.Paths.get(s"$src/events.parquet"), dir.resolve(name))
    }
    part("long_nanos", "delivery-0.parquet")
    part("ntz_micros", "delivery-1.parquet")
    val raw = spark.read
      .schema("event_id long, ts long, user_id long, event_type string, " +
        "value double, props string") // the schema sniffed from delivery-0
      .parquet(dir.toString)
    val e = intercept[IllegalArgumentException](
      EventTime.assertPlausible(raw, dir.toString))
    assert(e.getMessage.contains("heterogeneous"), e.getMessage)
  }

  test("a drifted LATER delivery to an already-validated root still refuses") {
    // Memoization must be per FILE, not per root: delivery 2 arrives after
    // the root passed its first check.
    val dir = Files.createTempDirectory("graft-enc-late")
    val good = writeFixture("long_nanos")
    Files.copy(java.nio.file.Paths.get(s"$good/events.parquet"),
      dir.resolve("delivery-0.parquet"))
    def raw() = spark.read
      .schema("event_id long, ts long, user_id long, event_type string, " +
        "value double, props string")
      .parquet(dir.toString)
    EventTime.assertPlausible(raw(), dir.toString) // validates delivery-0
    val drift = writeFixture("long_micros_drift")
    Files.copy(java.nio.file.Paths.get(s"$drift/events.parquet"),
      dir.resolve("delivery-1.parquet"))
    val e = intercept[IllegalArgumentException](
      EventTime.assertPlausible(raw(), dir.toString))
    assert(e.getMessage.contains("plausibility"), e.getMessage)
  }

  test("a micros instant/NTZ mix is NOT drift — same raw INT64 under UTC") {
    // ADVICE r8: TIMESTAMP(MICROS, adjusted=true) and TIMESTAMP_NTZ(MICROS)
    // carry the same raw INT64 micros; under the UTC-pinned session the
    // adjustedToUTC flip in a later delivery is harmless and must NOT trip
    // the heterogeneity refusal (that's for raw-reinterpreting mixes only).
    val dir = Files.createTempDirectory("graft-enc-micromix")
    def part(encoding: String, name: String): Unit = {
      val src = writeFixture(encoding)
      Files.copy(java.nio.file.Paths.get(s"$src/events.parquet"), dir.resolve(name))
    }
    part("ntz_micros", "delivery-0.parquet")
    part("timestamp", "delivery-1.parquet")
    val raw = spark.read
      .schema("event_id long, ts timestamp, user_id long, event_type string, " +
        "value double, props string")
      .parquet(dir.toString)
    EventTime.assertPlausible(raw, dir.toString) // must not throw
    val got = EventTime.canonicalTs(raw)
      .select($"event_id", EventTime.epochUs($"ts")).as[(Long, Long)].collect()
    assert(got.length === rows.length * 2, "both deliveries must read")
    assert(got.toSet === rows.map(r => (r._1, r._2)).toSet,
      "instant and NTZ files must decode to the same instants")
  }

  test("a drifted LATER delivery in the scan-fallback bucket still refuses") {
    // ADVICE r8 (medium): the fallback memo was keyed on ROOT, so a later
    // delivery whose footer can't answer (INT96 here — non-INT64 physical
    // type) was never plausibility-checked at all. The fallback must scan
    // exactly the new unverdicted files, every delivery.
    val dir = Files.createTempDirectory("graft-enc-late-scan")
    def writeInt96(df: DataFrame, name: String): Unit = {
      val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      try {
        val staging = Files.createTempDirectory("graft-enc-int96")
        df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
        val part = Files.list(staging)
          .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
        Files.move(part, dir.resolve(name))
      } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    }
    def fix(us: Long) = logical
      .select(col("event_id"), timestamp_micros(lit(us)).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    writeInt96(fix(baseUs), "delivery-0.parquet") // plausible 2024 instants
    def raw() = spark.read
      .schema("event_id long, ts timestamp, user_id long, event_type string, " +
        "value double, props string")
      .parquet(dir.toString)
    EventTime.assertPlausible(raw(), dir.toString) // scan fallback, passes
    // year-2150 instants: outside the band, and only a SCAN can see it
    writeInt96(fix(5680281600L * 1000000L), "delivery-1.parquet")
    val e = intercept[IllegalArgumentException](
      EventTime.assertPlausible(raw(), dir.toString))
    assert(e.getMessage.contains("plausibility"), e.getMessage)
  }

  test("an unsupported ts type refuses at canonicalization, not downstream") {
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](EventTime.canonicalTs(bad))
    assert(e.getMessage.contains("unsupported physical encoding"))
  }

  test("epochUs is NTZ-safe and exact to the microsecond") {
    val us = baseUs + 123456789L // sub-second micros survive
    val df = Seq(1L).toDF("id")
      .select(timestamp_micros(lit(us)).as("t"),
        timestamp_micros(lit(us)).cast(TimestampNTZType).as("tn"))
    val row = df.select(EventTime.epochUs($"t"), EventTime.epochUs($"tn")).head()
    assert(row.getLong(0) === us)
    assert(row.getLong(1) === us)
  }
}
