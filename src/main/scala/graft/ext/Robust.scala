package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (distribution-free) statistics for corpus curation.
  *
  * Mean/stddev outlier gates collapse on the heavy-tailed length and
  * score distributions real corpora have (one 100 MB document drags the
  * mean past most of the corpus); median + MAD (median absolute
  * deviation) is the standard robust replacement — breakdown point 50%.
  *
  * SCAN DISCIPLINE: both operators need their input three times (the
  * median aggregate, the MAD aggregate over deviations, and the final
  * per-row join). Callers routinely feed them an EXPENSIVE projection —
  * x112 pipes in the regex-heavy `TextAnalysis.qualityFeatures` — and
  * three scans of that projection at 100 TB is 3× the dominant cost.
  * So the narrow (id, key, val) slice is eagerly materialized ONCE
  * (`localCheckpoint` — lineage truncated, upstream never re-executed)
  * and every subsequent pass reads the checkpointed blocks. The
  * checkpoint is the operator's only persistent entry and is released
  * when the caller drops the returned frame (CacheHygieneSpec).
  */
object Robust {

  /** Materialize the narrow input slice once; all three downstream
    * passes (med, mad, final join) read these blocks instead of
    * re-running the caller's upstream plan.
    *
    * localCheckpoint, deliberately, despite two known trade-offs: (a)
    * release is by ContextCleaner when the caller drops the returned
    * frame — a `persist` would need a caller-visible release handle to
    * avoid pinning CacheManager entries forever, and this operator's
    * contract is a plain DataFrame; (b) the blocks are NOT
    * fault-tolerant — on a real cluster an executor loss kills them,
    * and since the lineage is truncated the job fails rather than
    * recomputing. Callers running multi-hour 100 TB jobs should
    * `spark.sparkContext.setCheckpointDir` + `.checkpoint()` the scored
    * input themselves if they need loss recovery; paying 3× the scan
    * (the pre-r7 shape) is strictly worse than either.
    */
  private def materializedSlice(
      df: DataFrame, idCol: String, keyCol: String, valCol: String): DataFrame =
    df.select(col(idCol), col(keyCol), col(valCol)).localCheckpoint(true)

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
    val d = materializedSlice(df, idCol, keyCol, valCol)
    val med = d.groupBy(col(keyCol))
      .agg(percentile(col(valCol).cast("double"), lit(0.5)).as("med"))
    val dev = d.join(med, keyCol)
      .withColumn("__absdev", abs(v - col("med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(percentile(col("__absdev"), lit(0.5)).as("mad"))
    dev.join(mad, keyCol)
      .select(col(idCol), col(keyCol), col(valCol), col("med"), col("mad"),
        (col("__absdev") > lit(k) * col("mad")).as("outlier"))
  }

  /** Per-group modified z-score (Iglewicz-Hoaglin):
    * z = 0.6745·(val − med) / MAD — the robust calibration that makes a
    * score threshold comparable ACROSS groups (each source's quality
    * distribution is centered and scaled by its own robust moments, so
    * one global cut like |z| > 3.5 means the same thing everywhere).
    * Zero-MAD groups (over half identical) yield null z — no rescaling
    * is meaningful there.
    *
    * Determinism: multiply-then-divide in one fixed association order —
    * IEEE ops on identical operands are identical on any engine, and the
    * operands (val, interpolated med/MAD) are cross-engine exact
    * already. Same two-aggregate scale shape as [[madOutliers]].
    */
  def robustZ(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      valCol: String): DataFrame = {
    val v: Column = col(valCol).cast("double")
    val d = materializedSlice(df, idCol, keyCol, valCol)
    val med = d.groupBy(col(keyCol))
      .agg(percentile(col(valCol).cast("double"), lit(0.5)).as("med"))
    val dev = d.join(med, keyCol)
    val mad = dev
      .withColumn("__absdev", abs(v - col("med")))
      .groupBy(col(keyCol))
      .agg(percentile(col("__absdev"), lit(0.5)).as("mad"))
    dev.join(mad, keyCol)
      .select(col(idCol), col(keyCol), col(valCol), col("med"), col("mad"),
        when(col("mad") === 0, lit(null).cast("double"))
          .otherwise(lit(0.6745) * (v - col("med")) / col("mad")).as("z"))
  }
}
