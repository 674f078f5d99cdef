package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BpeMergePair

/** Distributed BPE tokenizer training — learn merge rules from corpus
  * word frequencies (Sennrich et al. 2016, the standard subword-vocab
  * construction for LLM tokenizers), Spark-first:
  *
  *   1. word frequencies: one map-side-combinable groupBy over the
  *      corpus → a VOCABULARY-sized frame (all later work is on this
  *      frame, never the corpus again);
  *   2. each round: adjacent-symbol pair counts weighted by word count
  *      (slice+zip projection + groupBy), argmax collected as ONE row
  *      (ties break lexicographically, so training is deterministic);
  *   3. the winning pair merges in every word via the compiled greedy
  *      [[BpeMergePair]] walk; `localCheckpoint` truncates the plan
  *      each round (K rounds would otherwise nest K expression layers —
  *      the iterative-loop rule from the dedup clustering work).
  *
  * Driver-side state is O(numMerges) merge rules — never data. Rounds
  * are sequential by nature (merge k+1's counts depend on merge k); the
  * parallelism is within each round, over the vocabulary — and each
  * round BATCHES up to `maxMergesPerRound` provably-independent merges
  * (see [[learn]]), so a 32k vocabulary costs ~vocab/batch rounds, not
  * 32k driver round-trips.
  *
  * No DuckDB oracle: the greedy merge's sequential dependence has no
  * safe SQL spelling (string-replace re-spellings break on
  * shared-boundary repeats), so correctness is spec-pinned against an
  * in-memory reference implementation on the classic corpus — the
  * hash-family precedent (x32/x33).
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Character-split expression for a word column (explicit substring
    * loop — `split(w, "")` edge behavior differs across Spark versions).
    */
  private def chars(wCol: String): org.apache.spark.sql.Column =
    expr(s"transform(sequence(1, length($wCol)), i -> substring($wCol, i, 1))")

  /** Learn `numMerges` merge rules from the corpus. Returns the rules in
    * training order; stops early when no pair reaches `minPairCount`.
    *
    * MERGE BATCHING (the 32k-vocab lever): each round costs 2 Spark jobs
    * (pair-count aggregate + checkpoint of the merged vocabulary), so
    * 1 merge/round makes the driver loop the bottleneck by design. A
    * round therefore applies up to `maxMergesPerRound` merges chosen so
    * the batch is PROVABLY identical to running them sequentially:
    * walking the (count desc, left, right)-sorted pair list, a pair is
    * batched only while (a) its symbols — left, right, AND the produced
    * left+right — are disjoint from every earlier selection's, and (b)
    * its count is STRICTLY below the previous selection's; the batch is
    * cut at the first violating entry, and the last selection is dropped
    * if that cut entry ties its count.
    *
    * Why that is exact: merging a pair only creates/destroys adjacencies
    * that touch its symbols, so a fully-disjoint pair's count is
    * invariant under the earlier merges, and every NEW pair's count is
    * bounded by the old count of a parent pair that SHARES a symbol with
    * a merged one. All such touching pairs rank at or after the cut
    * (else the walk would have cut sooner), whose count is strictly
    * below every surviving selection — so at each sequential step the
    * batched pair is the unique argmax, ties included. Worst case
    * (adjacent equal counts at the head) degrades to 1 merge/round —
    * never wrong, just slower.
    *
    * PRODUCED-SYMBOL COLLISION (ADVICE r6): the bound above assumes a
    * merge's produced string l+r is a FRESH symbol. If l+r equals a
    * symbol that already exists in the vocabulary (reachable via a
    * different merge path in an earlier round — e.g. (ab,c) and (a,bc)
    * both yielding "abc"), the merge ACCRETES count onto pre-existing
    * pairs involving that symbol: new count = old + increment can exceed
    * a later selection's count even though both parents rank below the
    * cut. The walk therefore tracks every symbol string produced by
    * prior rounds; a candidate whose l+r collides cuts the batch — as
    * the head it runs ALONE (the head is the exact argmax, always safe),
    * otherwise the batch ends just before it. Strictly conservative:
    * collisions only shorten batches, never change selections.
    */
  def learn(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L,
      maxMergesPerRound: Int = 64): Seq[Merge] = {
    require(numMerges >= 1 && numMerges <= 32768,
      s"numMerges must be in [1,32768], got $numMerges")
    require(maxMergesPerRound >= 1,
      s"maxMergesPerRound must be >= 1, got $maxMergesPerRound")
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // Each round's eager localCheckpoint SUPERSEDES the previous one —
    // release the old generation's blocks as soon as the new one is
    // materialized, or a long merge sequence pins every generation in
    // storage memory (Bench's max_rdds gauge caught 6+ residues; a real
    // 32k-merge train would pin thousands). The persisted RDD is
    // extracted from the checkpointed frame's LogicalRDD — precise, so a
    // concurrent operator's caches are never touched. Local-checkpoint
    // fault-tolerance semantics are unchanged: lineage is already
    // truncated, executor loss was already fatal to the run.
    def checkpointRdd(frame: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      frame.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    var cur = words.select(col("cnt"), chars("w").as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    // every symbol string a prior round produced — the collision set for
    // the batch cut (original symbols are single chars; any produced
    // string is ≥2 chars, so only merge products can collide)
    val producedEver = scala.collection.mutable.Set.empty[String]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val want = math.min(maxMergesPerRound, numMerges - k)
      // want+1 rows: the (want+1)-th entry is the tie-checker for a batch
      // that fills without meeting a violating entry
      val top = cur
        .select(col("cnt"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(desc("pc"), col("l"), col("r"))
        .limit(want + 1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("pc") < minPairCount) done = true
      else {
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var cutPc: Option[Long] = None
        var i = 0
        var stop = false
        while (i < top.length && !stop && sel.size < want) {
          val (l, r, pc) = (top(i).getAs[String]("l"), top(i).getAs[String]("r"),
            top(i).getAs[Long]("pc"))
          if (pc < minPairCount) stop = true // below-threshold tail can't spoil
          else if (sel.isEmpty) {
            sel += ((l, r, pc))
            used += l; used += r; used += (l + r)
            // head produces an already-existing symbol: accretion makes
            // every later count untrustworthy — the head (exact argmax,
            // always safe) runs alone this round
            if (producedEver(l + r)) stop = true
          } else if (pc < sel.last._3 && !used(l) && !used(r) && !used(l + r)
              && !producedEver(l + r)) {
            sel += ((l, r, pc))
            used += l; used += r; used += (l + r)
          } else { cutPc = Some(pc); stop = true }
          i += 1
        }
        if (sel.size == want && i < top.length && cutPc.isEmpty)
          cutPc = Some(top(i).getAs[Long]("pc"))
        // a cut entry tying the last selection could seed an equal-count
        // new pair that lex-sorts earlier — drop the tied selection (the
        // head selection is always the old-table argmax and always safe)
        cutPc.foreach { c =>
          while (sel.size >= 2 && sel.last._3 <= c) sel.remove(sel.size - 1)
        }
        sel.foreach { case (l, r, pc) =>
          merges += Merge(k, l, r, pc)
          producedEver += (l + r)
          k += 1
        }
        val prev = checkpointRdd(cur)
        cur = sel.foldLeft(cur) { case (acc, (l, r, _)) =>
          acc.withColumn("syms", BpeMergePair.column(col("syms"), l, r))
        }.localCheckpoint(true)
        prev.foreach(_.unpersist(false))
      }
    }
    // merges is pure driver data — the last generation is releasable too
    checkpointRdd(cur).foreach(_.unpersist(false))
    merges.result()
  }

  /** The learned merge table as a DataFrame (rank, left, right,
    * pair_count) — the artifact a tokenizer ships.
    */
  def learnTable(
      spark: SparkSession,
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    import spark.implicits._
    learn(df, textCol, numMerges, minPairCount)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Apply learned merges to a text column: per-token greedy merge in
    * rank order (the BPE encode step), returning the input plus a
    * `subword_count` column — the token count a trained tokenizer would
    * produce. Merge application folds the compiled walk once per rule
    * over the symbol arrays; rule count is vocabulary policy (bounded),
    * not data.
    */
  def subwordCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .withColumn("syms", chars("w"))
    val merged = merges.foldLeft(toks) { (acc, m) =>
      acc.withColumn("syms", BpeMergePair.column(col("syms"), m.left, m.right))
    }
    merged
      .groupBy(col(idCol))
      .agg(sum(size(col("syms"))).cast("long").as("subword_count"),
        count(lit(1)).cast("long").as("word_count"))
  }
}
