package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model rarity scoring — the CCNet-style
  * "does this document look like the corpus" quality filter, with the
  * model trained on the corpus itself in the same pass.
  *
  * The classic formulation scores a document by perplexity under a
  * smoothed n-gram model. Cross-engine bit-exactness forbids
  * transcendentals in oracle-hashed output (log/exp round differently),
  * so the score is re-expressed in integers: a bigram (w1,w2) is RARE
  * iff its add-one-smoothed conditional probability is below 1/R,
  *
  *   (c12 + 1) / (c1 + V)  <  1/R    <=>    R * (c12 + 1)  <  c1 + V
  *
  * where c12 = corpus count of the bigram, c1 = corpus count of w1 as a
  * bigram head, V = corpus vocabulary size. The per-document score is
  * then rare_bigrams / n_bigrams — one integer division at the end, the
  * only float in the operator. High rarity = the document's word
  * transitions are unusual for the corpus = filter candidate.
  *
  * Scale shape: bigram extraction is a pure projection (slice + zip +
  * explode — no window, no shuffle); the model is two map-side-
  * combinable groupBys (bigram counts, head counts) whose results are
  * model-sized, not corpus-sized; scoring joins the exploded bigrams to
  * the model on (w1,w2) — an equi-join Spark plans as broadcast when the
  * model fits (typical: vocab^2 is bounded by language, not corpus) and
  * shuffled-hash otherwise; the per-doc rollup re-aggregates on doc_id.
  */
object LmScore {

  /** One row per document: (idCol, n_bigrams, n_rare, rarity).
    * Documents with fewer than 2 tokens have no bigrams and are dropped
    * (no transitions to judge — scoring them 0 would mark garbage
    * one-token docs as maximally corpus-like).
    */
  def bigramRarity(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rarityFactor: Long = 50L): DataFrame = {
    require(rarityFactor >= 1, s"rarityFactor must be >= 1, got $rarityFactor")
    val toks = TextAnalysis.tokens(col(textCol))
    // (doc, w1, w2) per adjacent pair — projection only, no shuffle
    val bigrams = df
      .select(col(idCol), toks.as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col(idCol),
        explode(arrays_zip(
          slice(col("__t"), lit(1), size(col("__t")) - 1).as("w1"),
          slice(col("__t"), lit(2), size(col("__t")) - 1).as("w2"))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // head counts roll up from the MODEL-sized c12 frame, not the
    // corpus-sized bigram frame — one fewer corpus scan (at real scale
    // you'd persist c12 once and score many corpora against it)
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = df
      .select(explode(toks).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    bigrams
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__rare",
        (lit(rarityFactor) * (col("c12") + lit(1L)) < col("c1") + col("v"))
          .cast("long"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__rare")).as("n_rare"))
      .withColumn("rarity",
        col("n_rare").cast("double") / col("n_bigrams").cast("double"))
  }
}
