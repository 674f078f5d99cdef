package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.Scd

/** SCD2 merge semantics: close-on-change, insert-on-new, pass-through,
  * history immutability, and idempotent re-delivery.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(rows: (Long, String, Double)*): DataFrame =
    rows.toSeq.toDF("k", "status", "price")
      .select(col("k"), col("status"), col("price"),
        lit("2020-01-01").as("eff_from"),
        lit(null).cast("string").as("eff_to"),
        lit(true).as("is_current"))

  private def collect(df: DataFrame) =
    df.select("k", "status", "price", "eff_from", "eff_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3), Option(r.getString(4)), r.getBoolean(5)))
      .toSet

  test("scd2Merge closes changed keys, inserts new keys, passes through the rest") {
    val current = snapshot((1L, "O", 10.0), (2L, "O", 20.0), (3L, "F", 30.0))
    val changes = Seq(
      (2L, "O", 25.0), // changed attr -> close + reopen
      (4L, "P", 40.0)) // new key -> insert
      .toDF("k", "status", "price")
    val out = collect(Scd.scd2Merge(current, changes, Seq("k"), "2021-06-01"))
    assert(out === Set(
      (1L, "O", 10.0, "2020-01-01", None, true),
      (2L, "O", 20.0, "2020-01-01", Some("2021-06-01"), false),
      (2L, "O", 25.0, "2021-06-01", None, true),
      (3L, "F", 30.0, "2020-01-01", None, true),
      (4L, "P", 40.0, "2021-06-01", None, true)))
  }

  test("scd2Merge re-delivery of an identical change batch is a no-op") {
    val current = snapshot((1L, "O", 10.0), (2L, "O", 20.0))
    val changes = Seq((2L, "O", 25.0)).toDF("k", "status", "price")
    val once = Scd.scd2Merge(current, changes, Seq("k"), "2021-06-01")
    val twice = Scd.scd2Merge(once, changes, Seq("k"), "2022-01-01")
    assert(collect(twice) === collect(once),
      "identical attrs must not open a new version")
  }

  test("latestWins collapses a raw change feed to one row per key") {
    val feed = Seq(
      (2L, "O", 25.0, 10L, 1L), // older delivery
      (2L, "O", 27.0, 20L, 2L), // latest -> survivor
      (4L, "P", 40.0, 5L, 3L))
      .toDF("k", "status", "price", "ts", "seq")
    val deduped = Scd.latestWins(feed, Seq("k"),
      Seq(col("ts").desc, col("seq").desc))
      .drop("ts", "seq")
    val current = snapshot((2L, "O", 20.0))
    val out = collect(Scd.scd2Merge(current, deduped, Seq("k"), "2021-06-01"))
    // without the dedupe the full-outer join fans out: two closed copies
    // of k=2 and two simultaneously-open versions — the precondition
    // latestWins exists to establish
    assert(out === Set(
      (2L, "O", 20.0, "2020-01-01", Some("2021-06-01"), false),
      (2L, "O", 27.0, "2021-06-01", None, true),
      (4L, "P", 40.0, "2021-06-01", None, true)))
    val openPerKey = Scd.scd2Merge(current, deduped, Seq("k"), "2021-06-01")
      .where(col("is_current")).groupBy(col("k")).count()
      .where(col("count") > 1).count()
    assert(openPerKey === 0L)
  }

  test("cdcApply: latest change wins, delete removes, later upsert revives") {
    val feed = Seq(
      // k=1: update then delete -> gone
      (1L, "A", 1.0, 10L, "U"), (1L, "A", 2.0, 20L, "D"),
      // k=2: delete then later upsert -> revived with the late value
      (2L, "B", 5.0, 10L, "D"), (2L, "B", 7.0, 30L, "U"),
      // k=3: plain upserts, latest value survives
      (3L, "C", 1.0, 10L, "U"), (3L, "C", 9.0, 40L, "U"))
      .toDF("k", "status", "price", "seq", "op")
    val out = Scd.cdcApply(feed, Seq("k"), Seq(col("seq").desc), "op")
      .select("k", "status", "price", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(out === Set((2L, "B", 7.0, 30L), (3L, "C", 9.0, 40L)))
    // a NULL op is an upsert, never a silent delete (null-safe filter)
    val withNull = Seq((4L, "D", 1.0, 10L, null.asInstanceOf[String]))
      .toDF("k", "status", "price", "seq", "op")
    val kept = Scd.cdcApply(withNull, Seq("k"), Seq(col("seq").desc), "op")
      .count()
    assert(kept === 1L)
  }

  test("scd2Merge never touches history rows") {
    val history = snapshot((9L, "X", 1.0))
      .withColumn("eff_to", lit("2019-01-01"))
      .withColumn("is_current", lit(false))
    val current = snapshot((9L, "Y", 2.0)).unionByName(history)
    val changes = Seq((9L, "Z", 3.0)).toDF("k", "status", "price")
    val out = collect(Scd.scd2Merge(current, changes, Seq("k"), "2021-06-01"))
    assert(out.contains((9L, "X", 1.0, "2020-01-01", Some("2019-01-01"), false)))
    assert(out === Set(
      (9L, "X", 1.0, "2020-01-01", Some("2019-01-01"), false),
      (9L, "Y", 2.0, "2020-01-01", Some("2021-06-01"), false),
      (9L, "Z", 3.0, "2021-06-01", None, true)))
  }
}
