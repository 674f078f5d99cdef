package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Domain-mixture planning and resampling for training corpora.
  *
  * A pretraining corpus is assembled from sources with prescribed
  * relative weights (web 60 : code 20 : books 10 : ...) under a total
  * token budget. Given observed per-source token counts, each source
  * needs a keep-rate of
  *
  *   rate_s = min(1, budget * w_s / (W * tokens_s)),   W = sum w_s
  *
  * and the kept subset must be deterministic (re-runs and engine swaps
  * must select the SAME documents, or train/val separation silently
  * breaks downstream — the same argument as [[Sampling]]).
  *
  * The keep decision is therefore pure integer arithmetic on the
  * [[Sampling.hashBucket]] space: with 16^4 = 65536 buckets, a document
  * in source s with bucket b is kept iff
  *
  *   b * W * tokens_s  <  65536 * budget * w_s
  *
  * which is exactly `b/65536 < rate_s` with the min(1,·) clamp falling
  * out automatically (b <= 65535, so an over-allocated source where
  * budget*w_s >= W*tokens_s keeps everything). No floating point, no
  * rounding ambiguity — bit-identical across any engine with md5.
  *
  * Scale shape: the plan is one map-side-combinable groupBy over the
  * corpus producing O(sources) rows; the resample is a broadcast join of
  * that plan onto the corpus plus a per-row projection. No corpus-sized
  * shuffle anywhere.
  *
  * Exactness: the predicate products are evaluated in DECIMAL(38,0) —
  * exact integer arithmetic to 10^38, so trillion-token budgets times
  * percent-scale weights (≈10^19-10^23, past Long.MaxValue) neither
  * overflow under ANSI mode nor wrap silently without it. Weights are
  * still capped at 100000 each as a sanity bound.
  */
object Mixture {

  private val D = DecimalType(38, 0)
  private def dec(c: Column): Column = c.cast(D)

  /** Per-source token totals + the integer plan inputs.
    * Output: (source, src_tokens, weight) — O(sources) rows.
    */
  def plan(
      df: DataFrame,
      sourceCol: String,
      tokenLenCol: String,
      weights: Map[String, Long],
      defaultWeight: Long = 0L): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "mixture weights must be non-negative")
    val w = weights.toSeq.sortBy(_._1).foldRight(
      lit(defaultWeight): Column) {
      case ((src, wt), elseCol) =>
        when(col(sourceCol) === lit(src), lit(wt)).otherwise(elseCol)
    }
    df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenLenCol).cast("long")).as("src_tokens"))
      .withColumn("weight", w.cast("long"))
  }

  /** Deterministic mixture resample: keep documents so each source
    * contributes ~budget * w_s / W tokens. Returns the kept rows of `df`
    * (original columns) plus the plan columns `src_tokens` and `weight`.
    *
    * The same document set is selected on ANY engine: the predicate is
    * exact integer arithmetic over md5 buckets (see object doc). `idCol`
    * must be the unique document key — the bucket is a pure function of
    * it.
    */
  def resample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenLenCol: String,
      weights: Map[String, Long],
      budgetTokens: Long,
      defaultWeight: Long = 0L,
      salt: String = Sampling.DefaultSalt): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    require(weights.values.forall(_ <= 100000L) && defaultWeight <= 100000L,
      "individual mixture weights must be <= 100000 (sanity bound)")
    // W = sum of weights over the sources actually present, attached to
    // the plan frame itself via an unpartitioned window — the frame is
    // O(sources) rows, so the single-partition window is bounded at any
    // corpus size, and the corpus-side plan stays one broadcast hash
    // join (no scalar cross join).
    val p = plan(df, sourceCol, tokenLenCol, weights, defaultWeight)
      .withColumn("__w_total",
        sum(col("weight")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val bucket = Sampling.bucketLong(col(idCol), salt)
    df.join(broadcast(p), df(sourceCol) === p("source"))
      .where(dec(bucket) * dec(col("__w_total")) * dec(col("src_tokens")) <
        dec(lit(65536L)) * dec(lit(budgetTokens)) * dec(col("weight")))
      .drop(p("source"))
      .drop("__w_total")
  }

  /** Mixture materialization WITH repeats — the upsampling half of
    * mixture planning. When a source's token target
    * T_s = budget·w_s/W exceeds its size, [[resample]]'s keep-all clamp
    * under-delivers; training pipelines repeat such sources for several
    * epochs instead (high-quality sources are commonly seen 2-5x per
    * run). Each document of source s is emitted with an `epoch` column:
    *
    *   full epochs  e_s = floor(budget·w_s / (W·tokens_s))  — every doc,
    *     epochs 0..e_s-1;
    *   partial epoch e_s — the doc iff its hash bucket selects it for
    *     the remainder fraction r_s/(W·tokens_s), where
    *     r_s = budget·w_s − e_s·W·tokens_s:
    *
    *       bucket · W · tokens_s  <  65536 · r_s
    *
    * Downsampling is the e_s = 0 case, where this degenerates to exactly
    * [[resample]]'s predicate. Exact DECIMAL(38,0) integer arithmetic
    * throughout (see object doc) — the emitted (doc, epoch) multiset is
    * engine-independent.
    *
    * Single corpus scan: broadcast-join the O(sources) plan, compute
    * n_epochs = e_s + keep_partial per row, filter n_epochs >= 1, then
    * explode sequence(0, n_epochs-1) — a generator projection, no
    * second pass and no union. Sources with zero tokens are dropped.
    */
  def resampleEpochs(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenLenCol: String,
      weights: Map[String, Long],
      budgetTokens: Long,
      defaultWeight: Long = 0L,
      salt: String = Sampling.DefaultSalt): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    require(weights.values.forall(_ <= 100000L) && defaultWeight <= 100000L,
      "individual mixture weights must be <= 100000 (sanity bound)")
    val p = plan(df, sourceCol, tokenLenCol, weights, defaultWeight)
      .withColumn("__w_total",
        sum(col("weight")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("src_tokens") > 0)
      // exact decimal plan columns: full epochs + partial-epoch remainder.
      // `div` (integral division), not `/`: Spark's `/` is DOUBLE
      // division, which silently rounds past 2^53.
      .withColumn("__denom", dec(col("__w_total")) * dec(col("src_tokens")))
      .withColumn("__full",
        expr(s"(CAST(${budgetTokens} AS DECIMAL(38,0)) * weight) div __denom"))
      .withColumn("__rem",
        dec(lit(budgetTokens)) * dec(col("weight"))
          - dec(col("__full")) * col("__denom"))
    val bucket = Sampling.bucketLong(col(idCol), salt)
    df.join(broadcast(p), df(sourceCol) === p("source"))
      .withColumn("__keep",
        (dec(bucket) * col("__denom") < dec(lit(65536L)) * col("__rem"))
          .cast("long"))
      .withColumn("__n_epochs", col("__full") + col("__keep"))
      .where(col("__n_epochs") >= 1)
      .select(df("*"), col("src_tokens"), col("weight"),
        explode(sequence(lit(0L), col("__n_epochs") - 1)).as("epoch"))
  }
}
