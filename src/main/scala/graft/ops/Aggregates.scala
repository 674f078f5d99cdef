package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation layer (SURVEY §2.4 A1-A5).
  *
  * Scale notes baked into the choices here:
  *  - `sum`/`count` aggregates are partial (map-side combine) before the
  *    shuffle — the exchange carries one row per (partition, group), not per
  *    input row.
  *  - `collect_list(struct(…))` runs on `ObjectHashAggregateExec` with
  *    sort-based spill fallback; per-group arrays must be bounded by the
  *    data model (periods-per-payment, lineitems-per-order ≤ few thousand),
  *    never by a global key.
  *  - `conditionalSum` and `pivotSum` are equivalent (property-tested);
  *    pivot with an explicit value list avoids the extra distinct-values
  *    job Spark otherwise runs.
  */
object Aggregates {

  /** A3: `sum(when(cond, amount).otherwise(0))` — conditional aggregation
    * (`pyspark_sum_function:25-41`).
    */
  def conditionalSum(cond: Column, amount: Column): Column =
    sum(when(cond, amount).otherwise(lit(0)))

  /** A1/A2: collect group rows into a deterministically-sorted array of
    * structs (`sort_array(collect_list(struct(…)))`,
    * `ibs_ordinary_payment_utilities.py:99-101,155-252`). Struct field order
    * is the sort order; callers put the unique sequence field first.
    */
  def collectSortedStructs(fields: Column*): Column =
    sort_array(collect_list(struct(fields: _*)))

  /** A4/A5: pivot aggregation with explicit pivot values
    * (`all_from_gemini.txt:560-570`), nulls filled with 0.
    */
  def pivotSum(
      df: DataFrame,
      groupCols: Seq[Column],
      pivotCol: String,
      pivotValues: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(groupCols: _*)
      .pivot(pivotCol, pivotValues)
      .sum(valueCol)
      .na.fill(0)

  /** A4 surface-parity overload: pivot with INFERRED values — the
    * reference transcript's other pivot spelling
    * (`all_from_gemini.txt:560-570` shows both). Spark runs an extra
    * distinct-values job over `pivotCol` before planning the aggregate,
    * so at scale prefer the explicit-values form; property-tested
    * equivalent when the explicit list covers the data.
    */
  def pivotSum(
      df: DataFrame,
      groupCols: Seq[Column],
      pivotCol: String,
      valueCol: String): DataFrame =
    df.groupBy(groupCols: _*)
      .pivot(pivotCol)
      .sum(valueCol)
      .na.fill(0)
}
