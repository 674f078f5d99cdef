package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (distribution-free) statistics for corpus curation.
  *
  * Mean/stddev outlier gates collapse on the heavy-tailed length and
  * score distributions real corpora have (one 100 MB document drags the
  * mean past most of the corpus); median + MAD (median absolute
  * deviation) is the standard robust replacement — breakdown point 50%.
  */
object Robust {

  /** Per-group median/MAD outlier gate over a numeric column.
    *
    * Emits one row per input row: (idCol, keyCol, valCol, med, mad,
    * outlier) where `outlier = |val − med| > k·MAD`. A zero-MAD group
    * (over half its values identical) flags only rows strictly away
    * from the median — never the whole group.
    *
    * Exact cross-engine: Spark `percentile` and DuckDB `quantile_cont`
    * interpolate identically, and integer-valued halves are exact
    * doubles, so the flagged set oracle-hashes (the x29 precedent).
    *
    * Scale shape: two per-group aggregates (map-side combinable) joined
    * back onto the rows — the aggregate side is |groups| rows, which
    * Spark auto-broadcasts; the row side scans only (id, key, val).
    */
  def madOutliers(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val v: Column = col(valCol).cast("double")
    val d = df.select(col(idCol), col(keyCol), col(valCol))
    val med = d.groupBy(col(keyCol))
      .agg(expr(s"percentile($valCol, 0.5D)").as("med"))
    val dev = d.join(med, keyCol)
      .withColumn("__absdev", abs(v - col("med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(expr("percentile(__absdev, 0.5D)").as("mad"))
    dev.join(mad, keyCol)
      .select(col(idCol), col(keyCol), col(valCol), col("med"), col("mad"),
        (col("__absdev") > lit(k) * col("mad")).as("outlier"))
  }
}
