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
    // ±2 probe, not ±1: both quotients are rounded doubles, so a pair
    // with |l - r| <= width exactly at a bucket boundary can land two
    // buckets apart after rounding — ±1 would silently drop it. Five
    // probe rows per left row is still O(rows).
    val probes = left.withColumn("__bucket",
      explode(array(
        floor(col(leftValueCol) / lit(width)) - lit(2),
        floor(col(leftValueCol) / lit(width)) - lit(1),
        floor(col(leftValueCol) / lit(width)),
        floor(col(leftValueCol) / lit(width)) + lit(1),
        floor(col(leftValueCol) / lit(width)) + lit(2))))
    val build = right.withColumn("__bucket", floor(col(rightValueCol) / lit(width)))
    probes
      .join(build, "__bucket")
      .where(abs(col(leftValueCol) - col(rightValueCol)) <= lit(width))
      .drop("__bucket")
  }
}
