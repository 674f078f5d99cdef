package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * normalized column ranks so that range predicates on EITHER column map
  * to contiguous-ish z-ranges — after range-partitioning and sorting by
  * the z-value, each output file covers a small rectangle of the
  * (a, b) space, and parquet min/max stats prune files/row-groups for
  * filters on either dimension. A single-column sort gives perfect
  * skipping on that column and none on the other; Z-order trades a
  * little of the first for most of the second — the multi-dimensional
  * data-skipping layout Delta's OPTIMIZE ZORDER implements.
  *
  * Normalization here is min-max scaling to 16-bit buckets: one cheap
  * global aggregate for (min, max) per column, then a pure projection —
  * no per-column global sort. Heavy skew concentrates buckets (rank
  * normalization would spread them); acceptable for the id/metric/time
  * columns this targets, and documented.
  */
object ZOrder {

  /** Scale a numeric column to an integral bucket in [0, 65535] via
    * min-max normalization (constant columns land in bucket 0).
    */
  private[lake] def bucket16(x: Column, min: Double, max: Double): Column =
    if (max <= min) lit(0L)
    else least(lit(65535L),
      floor((x.cast("double") - lit(min)) / lit(max - min) * lit(65535.0))
        .cast("long"))

  /** Interleave the low 16 bits of two bucket columns into a 32-bit
    * Morton code (a gets odd bit positions, b even). Pure shift/mask
    * built-ins — codegen'd, no UDF.
    */
  private[lake] def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** Rearrange `df` along the Z-curve of (colA, colB): `nFiles` range
    * partitions of the z-value, sorted within each — the layout step of
    * [[writeZOrdered]], exposed so other writers (e.g.
    * [[Versioned.publish]] with stats) can adopt the layout.
    */
  def zArrange(
      df: DataFrame,
      colA: String,
      colB: String,
      nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val stats = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    if (stats.isNullAt(0)) return df.repartition(nFiles) // empty input
    val (aMin, aMax, bMin, bMax) =
      (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2), stats.getDouble(3))
    df.withColumn("__z", interleave16(
        bucket16(col(colA), aMin, aMax), bucket16(col(colB), bMin, bMax)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Write `df` to parquet in `nFiles` files laid out along the Z-curve
    * of (colA, colB): range-partition by z so each file owns a z-range
    * (a rectangle-ish region of the 2-D space), sort within partitions
    * so row groups inside a file are tight too. Output schema is
    * unchanged (the z-value is dropped before writing).
    *
    * Scale shape: one (min, max) aggregate + one range-exchange +
    * parallel sorted writes — the same cost as any repartitionByRange
    * write; the benefit is on every future read that filters either
    * column.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      nFiles: Int): Unit =
    zArrange(df, colA, colB, nFiles)
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
}
