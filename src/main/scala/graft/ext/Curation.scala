package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** End-to-end training-corpus curation: the composition every LLM data
  * pipeline runs, built entirely from this engine's operators —
  *
  *   1. scrub PII/noise ([[TextAnalysis.scrub]]);
  *   2. quality gate ([[TextAnalysis.qualityFeatures]] composite ≥ τ);
  *   3. dedup: exact + near-dup clustering ([[Dedup.clusters]]), keeping
  *      ONE survivor per connected component (min doc id) — pair-wise
  *      deletion alone would over-delete chains ({A,B},{B,C} must keep A,
  *      not just drop B and C);
  *   4. (optional) bounded partitioned lake write
  *      ([[graft.lake.LakeWriter]]).
  *
  * Plan shape: steps 1-2 are narrow projections; step 3 is the bucketed
  * near-dup machinery; survivor selection is a broadcast-able semi-join
  * of ids. Nothing here adds a shuffle beyond what dedup itself needs.
  */
object Curation {

  /** Curated survivors: docs that pass the quality gate AND are their
    * near-dup component's minimum id among gate-passing docs. Returns
    * (doc_id, lang, component, quality_score, scrubbed_md5, n_tokens).
    *
    * Survivor rule detail: components are computed over the FULL corpus
    * (dedup semantics must not depend on the quality gate), then the
    * survivor of each component is the min gate-passing member.
    */
  def curate(
      docs: DataFrame,
      qualityThreshold: Double,
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.3): DataFrame = {
    val quality = TextAnalysis.qualityFeatures(docs, "text")
      .select(col("doc_id"), col("lang"), col("quality_score"),
        md5(TextAnalysis.scrub(col("text"))).as("scrubbed_md5"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
    val comp = Dedup.clusters(docs, "doc_id", "text", shingleN, jaccardThreshold)
    val gated = quality
      .where(col("quality_score") >= lit(qualityThreshold))
      .join(comp, "doc_id")
    // Survivor = the min gate-passing id of its component. A window over
    // ONE evaluation of `gated` (ids are unique, so `doc_id == min over
    // component` keeps exactly the groupBy+semi-join's rows) — the join
    // spelling evaluated the whole quality projection twice: once as the
    // aggregate input and once as the probe side.
    val wComp = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
    gated
      .withColumn("__min_id", min(col("doc_id")).over(wComp))
      .where(col("doc_id") === col("__min_id"))
      .select(col("doc_id"), col("lang"), col("component"),
        col("quality_score").cast(DoubleType).as("quality_score"),
        col("scrubbed_md5"), col("n_tokens"))
  }

  /** Curate and land in the lake: partitioned by lang, file sizes bounded
    * — the reference's writer discipline applied to the curated corpus.
    * Returns the curated DataFrame that was written.
    */
  def curateToLake(
      spark: SparkSession,
      docs: DataFrame,
      outDir: String,
      qualityThreshold: Double,
      maxRecordsPerFile: Int = 2000000): DataFrame = {
    val curated = curate(docs, qualityThreshold)
    curated.write
      .mode("append")
      .partitionBy("lang")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(outDir)
    curated
  }
}
