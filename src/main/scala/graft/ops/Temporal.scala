package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (SURVEY §2.3 notes none in
  * the reference; engine extension — preference order (a): composed from
  * built-ins).
  *
  * `asofJoin`: for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key — WITHOUT a range
  * self-join. The classic scalable spelling: union both sides tagged,
  * sort within key by (time, side-priority), and carry right-side values
  * forward with an ignore-nulls `last` window. One shuffle on the key,
  * one sort — O(n log n) per key, versus the O(n·m) per key of the naive
  * `left.time >= right.time` theta join that a planner would otherwise
  * nest-loop.
  *
  * `bandedRangeJoin`: value-band equi-join — |left.v − right.v| ≤ width
  * becomes an equi-join on floor(v/width) buckets (each left row probes
  * its own and both neighbor buckets), turning an otherwise cartesian
  * range predicate into a shuffle-bounded hash join.
  */
object Temporal {

  /** As-of join on a shared key. Left columns are kept; the selected right
    * value columns arrive as `asof_<name>` (null when no prior right row).
    *
    * Determinism: right rows tied on (key, time) resolve to the one with
    * the greatest tiebreaker (max aggregate semantics via ordering).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns
    // Tag and align schemas: side 1 = right (so at equal timestamps the
    // right row sorts BEFORE the left row it should match — asof is <=).
    val taggedRight = right.select(
      col(keyCol).as("__key"),
      col(rightTimeCol).as("__t"),
      lit(0).as("__side"),
      col(rightTieBreak).as("__tie"),
      struct(rightValueCols.map(col): _*).as("__rv"))
    val taggedLeft = left.select(
      (Seq(
        col(keyCol).as("__key"),
        col(leftTimeCol).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__tie").dataType).as("__tie"),
        lit(null).cast(taggedRight.schema("__rv").dataType).as("__rv"))
        ++ leftCols.map(c => left(c).as(s"__l_$c"))): _*)
    val unioned = taggedRight
      .select((taggedRight.columns.map(col)
        ++ leftCols.map(c => lit(null).cast(taggedLeft.schema(s"__l_$c").dataType).as(s"__l_$c"))): _*)
      .unionByName(taggedLeft)
    val w = Window
      .partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
    carried
      .where(col("__side") === lit(1))
      .select(leftCols.map(c => col(s"__l_$c").as(c))
        ++ rightValueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` on the same key (the next-event attach —
    * time-to-failure, next-purchase attribution). Same single-shuffle
    * union construction as [[asofJoin]], mirrored: right rows sort AFTER
    * the left rows they may match at equal timestamps, and values are
    * carried BACKWARD with an ignore-nulls `first` over
    * [current, unbounded following].
    *
    * Determinism: right rows tied on (key, time) resolve to the SMALLEST
    * tiebreaker (first in ascending order).
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns
    // side 1 = right: at equal timestamps the right row sorts AFTER the
    // left row, and the frame starts at the left row — so an equal-ts
    // right row IS eligible (forward as-of is >=).
    val taggedRight = right.select(
      col(keyCol).as("__key"),
      col(rightTimeCol).as("__t"),
      lit(1).as("__side"),
      col(rightTieBreak).as("__tie"),
      struct(rightValueCols.map(col): _*).as("__rv"))
    val taggedLeft = left.select(
      (Seq(
        col(keyCol).as("__key"),
        col(leftTimeCol).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(taggedRight.schema("__tie").dataType).as("__tie"),
        lit(null).cast(taggedRight.schema("__rv").dataType).as("__rv"))
        ++ leftCols.map(c => left(c).as(s"__l_$c"))): _*)
    val unioned = taggedRight
      .select((taggedRight.columns.map(col)
        ++ leftCols.map(c => lit(null).cast(taggedLeft.schema(s"__l_$c").dataType).as(s"__l_$c"))): _*)
      .unionByName(taggedLeft)
    val w = Window
      .partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(0, Window.unboundedFollowing)
    val carried = unioned.withColumn("__asof", first(col("__rv"), ignoreNulls = true).over(w))
    carried
      .where(col("__side") === lit(0))
      .select(leftCols.map(c => col(s"__l_$c").as(c))
        ++ rightValueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Nearest as-of join: for each left row, the right row on the same key
    * with the SMALLEST |rightTime − leftTime| — composed from the two
    * directional joins (still two shuffles total, no range self-join).
    * Ties (equidistant before and after) resolve to the EARLIER right
    * row, matching the directional joins' determinism.
    *
    * The time columns must be numeric (epoch micros/seconds) so the
    * distance compare is exact; callers with timestamps convert with
    * `unix_micros` first.
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns
    // carry the matched right TIME through each directional join so the
    // final pick can compare distances
    val rv = rightValueCols :+ rightTimeCol
    val back = asofJoin(left, right, keyCol, leftTimeCol, rightTimeCol, rv, rightTieBreak)
    // the forward join over back's output would collide on asof_* names —
    // rename the backward outputs first
    val backRenamed = rv.foldLeft(back) { (df, c) =>
      df.withColumnRenamed(s"asof_$c", s"__back_$c")
    }
    val both = asofJoinForward(backRenamed, right, keyCol, leftTimeCol, rightTimeCol,
      rv, rightTieBreak)
    val backT = col(s"__back_$rightTimeCol")
    val fwdT = col(s"asof_$rightTimeCol")
    val lT = col(leftTimeCol)
    val pickBack = backT.isNotNull &&
      (fwdT.isNull || (lT - backT) <= (fwdT - lT)) // tie -> earlier (back)
    both.select(leftCols.map(col)
      ++ rightValueCols.map { c =>
        when(pickBack, col(s"__back_$c")).otherwise(col(s"asof_$c")).as(s"asof_$c")
      }
      :+ when(pickBack, backT).otherwise(fwdT).as(s"asof_$rightTimeCol"): _*)
  }

  /** Banded range join: pairs with |left(valueCol) − right(valueCol)| ≤
    * width, plus any extra predicate, via bucket equi-join (left probes
    * bucket−1, bucket, bucket+1).
    */
  def bandedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftValueCol: String,
      rightValueCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    def integral(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // Integral operands with a whole width bucket EXACTLY in long
    // arithmetic (no double rounding — a nanosecond-epoch long divided by
    // a small width drifts in double beyond |q| ≈ 2^52, silently dropping
    // qualifying pairs) and need only a ±1 probe. Fractional operands
    // bucket in double with a ±2 probe: both quotients are rounded, so a
    // pair at a bucket boundary can land two buckets apart — ±1 would
    // silently drop it. Probe Add/Subtract is clamped away from the Long
    // extremes so ANSI arithmetic can never overflow-throw.
    val exact = integral(left.schema(leftValueCol).dataType) &&
      integral(right.schema(rightValueCol).dataType) &&
      width >= 1 && width == math.floor(width) && width <= Long.MaxValue.toDouble
    // Overflow-free floor division for the v < 0 branch:
    // floor(v/w) = (v+1) div w − 1 (never forms v − mod, which would
    // underflow near Long.MinValue under ANSI).
    def bucketOf(c: Column): Column =
      if (exact) {
        val v = c.cast("long")
        val w = lit(width.toLong)
        when(v >= 0, call_function("div", v, w))
          .otherwise(call_function("div", v + lit(1L), w) - lit(1L))
      } else floor(c / lit(width))
    val probe = if (exact) 1 else 2
    val base = least(
      greatest(bucketOf(col(leftValueCol)), lit(Long.MinValue + probe)),
      lit(Long.MaxValue - probe))
    val probes = left.withColumn("__bucket",
      explode(array((-probe to probe).map(d => base + lit(d.toLong)): _*)))
    val build = right.withColumn("__bucket", bucketOf(col(rightValueCol)))
    probes
      .join(build, "__bucket")
      .where(abs(col(leftValueCol) - col(rightValueCol)) <= lit(width))
      .drop("__bucket")
  }

  /** Idempotency-window event dedup: within each
    * (key..., floor(epoch(ts)/windowSec)) bucket keep the FIRST event
    * (earliest ts, then lowest id — a total order), and report how many
    * duplicates were suppressed. The standard at-least-once ingestion
    * guard: retried webhooks / double-fired trackers collapse to one
    * row per window while legitimately repeated events in later windows
    * survive. Bucketed (not sliding) windows keep it one shuffle and
    * engine-exact; a retry straddling a bucket boundary survives as two
    * rows — the usual trade for a deterministic, join-free plan.
    *
    * Output: one row per kept event — (idCol, key..., bucket,
    * n_suppressed). Scale shape: ONE hash exchange on (key, bucket);
    * both window functions share it.
    */
  def idempotentEvents(
      df: DataFrame,
      idCol: String,
      tsCol: String,
      windowSec: Int,
      keyCols: String*): DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1, got $windowSec")
    require(keyCols.nonEmpty, "at least one key column is required")
    val bucket = floor(unix_timestamp(col(tsCol)) / lit(windowSec)).cast("long")
    val parts = keyCols.map(col) :+ col("__bucket")
    val w = Window.partitionBy(parts: _*).orderBy(col(tsCol), col(idCol))
    val wAll = Window.partitionBy(parts: _*)
    df.withColumn("__bucket", bucket)
      .withColumn("__rk", row_number().over(w))
      .withColumn("n_suppressed", count(lit(1)).over(wAll) - lit(1L))
      .where(col("__rk") === 1)
      .select((col(idCol) +: keyCols.map(col)) ++
        Seq(col("__bucket").as("bucket"), col("n_suppressed")): _*)
  }
}
