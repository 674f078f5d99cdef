package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Fuzzy (approximate-key) join — the record-linkage / entity-resolution
  * primitive: match rows of two tables whose STRING keys are similar but
  * not equal (typos, re-encodings, source-specific formatting), via
  * character n-gram jaccard.
  *
  * Candidate generation is an inverted-index equi-join on distinct char
  * n-grams (never a cartesian compare), then exact jaccard verification:
  * the same two-phase shape as [[Dedup.jaccardPairs]], across two frames
  * and at character granularity (word shingles are useless on
  * single-token keys like ids and names).
  *
  * Stop-gram pruning (`maxGramFreq`) is PART OF THE SEMANTICS, not a
  * best-effort heuristic: id-style keys share constant prefixes
  * ("Customer#0000...") whose grams pair everything with everything —
  * quadratic — and carry zero matching signal. Grams whose combined
  * occurrence count exceeds the cap are excluded from the GRAM SPACE
  * entirely: candidate generation, intersection counts, AND the per-key
  * sizes all live in the surviving (discriminative) grams, so jaccard
  * measures similarity over the grams that distinguish keys — the
  * spirit of IDF-weighted matching, as one deterministic,
  * engine-independent rule an oracle can mirror. (Counting pruned grams
  * in sizes but not intersections would crush every score toward 0 —
  * the failure mode this definition avoids.) Keys whose grams are ALL
  * pruned have no discriminative content and match nothing.
  */
object Fuzzy {

  /** Distinct character n-grams of lower(trim(key)); keys shorter than
    * `n` contribute themselves as a single gram (still matchable).
    */
  def charGrams(key: Column, n: Int): Column = {
    val s = lower(trim(key))
    when(length(s) >= n,
      array_distinct(transform(
        sequence(lit(1), length(s) - lit(n - 1)),
        i => s.substr(i, lit(n)))))
      .otherwise(array(s))
  }

  /** One row per (id_l, id_r) pair with jaccard >= threshold:
    * (id_l, id_r, n_common, n_l, n_r, jaccard) — all counts over the
    * post-pruning gram space (see object doc).
    */
  /** @param maxGramShare drop grams appearing in more than this fraction
    *        of all keys (0 = off). A RELATIVE cap behaves uniformly at
    *        every data scale — an absolute count sits in a different
    *        regime at each SF (a boundary gram below the cap at one
    *        scale and above it at 10x silently flips which pairs match).
    *        The key totals are two counts collected up front (the
    *        budget-guard precedent); df <= share·total compares
    *        identically on any IEEE engine.
    */
  def fuzzyJoin(
      left: DataFrame,
      leftId: String,
      leftKey: String,
      right: DataFrame,
      rightId: String,
      rightKey: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxGramFreq: Long = 0L,
      maxGramShare: Double = 0.0,
      maxCandidatePairs: Long = 200000000L): DataFrame = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(maxGramShare >= 0 && maxGramShare <= 1,
      s"maxGramShare in [0,1], got $maxGramShare")
    // materialize each side's exploded grams once: consumed by sizes,
    // the freq prune, and the join (the jaccardPairs discipline)
    val l0 = left.select(col(leftId).as("id_l"),
      explode(charGrams(col(leftKey), n)).as("g")).localCheckpoint(true)
    val r0 = right.select(col(rightId).as("id_r"),
      explode(charGrams(col(rightKey), n)).as("g")).localCheckpoint(true)
    val shareCap: Option[Double] =
      if (maxGramShare <= 0) None
      else Some(maxGramShare * (left.count() + right.count()).toDouble)
    val cap: Option[Column] = (maxGramFreq, shareCap) match {
      case (f, Some(s)) if f > 0 => Some(least(lit(f.toDouble), lit(s)))
      case (f, None) if f > 0 => Some(lit(f.toDouble))
      case (_, Some(s)) => Some(lit(s))
      case _ => None
    }
    val (lp, rp) = cap match {
      case None => (l0, r0)
      case Some(c) =>
        // combined-count rule: one freq frame over both sides, so the
        // prune is symmetric and engine-independent
        val keep = l0.select(col("g")).unionAll(r0.select(col("g")))
          .groupBy(col("g")).agg(count(lit(1)).as("df"))
          .where(col("df").cast(DoubleType) <= c).select(col("g"))
        (l0.join(broadcast(keep), "g").localCheckpoint(true),
          r0.join(broadcast(keep), "g").localCheckpoint(true))
    }
    // sizes in the SAME gram space as the intersections (object doc)
    val sizesL = lp.groupBy(col("id_l")).agg(count(lit(1)).as("n_l"))
    val sizesR = rp.groupBy(col("id_r")).agg(count(lit(1)).as("n_r"))
    if (maxCandidatePairs > 0) {
      val fl = lp.groupBy("g").agg(count(lit(1)).as("dl"))
      val fr = rp.groupBy("g").agg(count(lit(1)).as("dr"))
      val est = fl.join(fr, "g")
        .agg(sum(col("dl").cast(DoubleType) * col("dr").cast(DoubleType)))
        .head.getAs[Any](0) match {
          case null => 0.0
          case d: java.lang.Double => d.doubleValue
        }
      require(est <= maxCandidatePairs.toDouble,
        f"fuzzyJoin would generate ~$est%.3g candidate pairs " +
          f"(budget $maxCandidatePairs); tighten maxGramFreq or raise " +
          "maxCandidatePairs deliberately")
    }
    lp.join(rp, Seq("g"))
      .groupBy(col("id_l"), col("id_r"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizesL, Seq("id_l"))
      .join(sizesR, Seq("id_r"))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType)
          / (col("n_l") + col("n_r") - col("n_common")).cast(DoubleType))
      .where(col("jaccard") >= lit(threshold))
      .select(col("id_l"), col("id_r"), col("n_common"),
        col("n_l"), col("n_r"), col("jaccard"))
  }
}
