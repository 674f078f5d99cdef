package graft.ext

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  * North-star extension layer (SURVEY §7.9).
  *
  * Two paths, mirroring how ANN is actually deployed on Spark:
  *  - `bruteForceTopK`: the exact baseline. The index side is collected and
  *    broadcast (same contract as a broadcast hash join build side — it
  *    must fit in executor memory); the query side streams through
  *    mapPartitions with primitive-array double arithmetic and a bounded
  *    selection buffer. No shuffle at all: scales linearly in query rows.
  *  - `lshBuckets` / `lshTopK`: the scale path. Sign-random-projection LSH
  *    (deterministic seeded hyperplanes) buckets vectors so candidate
  *    generation is an equi-join on (table, bucket) — shuffle volume
  *    O(rows·tables), never O(rows²) — then exact re-ranking within
  *    candidates.
  *
  * Dot products accumulate left-to-right in double, which is what the
  *  DuckDB oracle's `list_sum(list_transform(…))` computes — bit-exact.
  */
/** Vector pinned to a block of the blocked exact KNN (see
  * [[Similarity.blockedTopK]]); top-level so its Encoder codegen resolves.
  */
case class BlockedVec(vec_id: Long, embedding: Array[Float], blk: Int)

/** Per-block partial hit, merged in the final per-query combine. */
case class PartialHit(vec_id: Long, neighbor_id: Long, score: Double)

object Similarity {

  case class Neighbor(vec_id: Long, rank: Int, neighbor_id: Long, score: Double)

  /** Broadcast-build budget for the exact paths: index sides larger than
    * this many rows never touch the driver — [[bruteForceTopK]] and
    * [[cosineNearDupPairs]] switch to the blocked distributed variants.
    */
  val MaxBroadcastIndexRows: Long = 1L << 20

  /** Column-API vector ops over Array[Float] embedding columns, built from
    * codegen-able HOF expressions (`zip_with`/`aggregate`) — the
    * declarative tier: SQL-visible, no typed Dataset needed. Accumulation
    * is sequential left-to-right in double, bit-exact with DuckDB's
    * `list_sum(list_transform(...))` and with the compiled [[cosine]].
    */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  // ── int8 scalar quantization ──
  //
  // The 100 TB memory lever for similarity search: a symmetric per-vector
  // int8 code is 8× smaller than the float64 work the scorer does (4× vs
  // float32 storage), so broadcast index budgets stretch 4-8× and shuffle
  // volume in the ANN paths drops proportionally. Reconstruction error is
  // bounded by scale/2 = maxabs/254 per component. All-declarative Column
  // arithmetic (floor-then-cast, sequential double sums) so the result is
  // bit-reproducible against any engine computing the same formula.

  /** max(|v_i|): the quantization range anchor. */
  def maxAbsCol(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double"))))

  /** Symmetric int8 code: q_i = floor(v_i / (maxabs/127) + 0.5) ∈
    * [-127, 127] (half-up rounding spelled as floor so the int cast is
    * exact under both truncating and rounding cast semantics). An
    * all-zero vector quantizes to all-zero codes.
    */
  def quantizeCol(emb: Column, maxAbs: Column): Column =
    when(maxAbs === lit(0.0), transform(emb, _ => lit(0)))
      .otherwise(transform(emb, x =>
        floor(x.cast("double") / (maxAbs / lit(127.0)) + lit(0.5)).cast("int")))

  /** Reconstruction: v̂_i = q_i · scale (double). */
  def dequantizeCol(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Rebuild an Array[Float] embedding frame from int8 codes, for running
    * any of the search paths over the quantized representation.
    */
  def dequantized(quantized: DataFrame): DataFrame =
    quantized.select(col("vec_id"),
      transform(col("q"), x => (x.cast("double") * col("scale")).cast("float"))
        .as("embedding"))

  /** Per-vector quantization frame: (vec_id, scale, q). */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding"),
        maxAbsCol(col("embedding")).as("maxabs"))
      .select(col("vec_id"),
        (col("maxabs") / lit(127.0)).as("scale"),
        quantizeCol(col("embedding"), col("maxabs")).as("q"))

  /** Dimensionality of `vecCol`, derived from one bounded probe row, with
    * explicit failures on the silent paths: an empty frame and a
    * null/empty first vector raise with a clear message (the previous
    * spelling NPE'd on null and yielded dim=0 on empty). Fixed-dim
    * vectors are the embedding-table contract; a ragged longer row
    * downstream surfaces as a NULL projection (`zip_with` pads), never a
    * silent partial sum.
    */
  private[ext] def vecDim(df: DataFrame, vecCol: String): Int = {
    val probe = df.select(size(col(vecCol)).as("d")).limit(1).collect()
    require(probe.nonEmpty,
      s"cannot derive vector dim from $vecCol: the frame is empty")
    require(!probe(0).isNullAt(0) && probe(0).getInt(0) > 0,
      s"cannot derive vector dim from $vecCol: first row is null or empty")
    probe(0).getInt(0)
  }

  private[ext] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Scan `idx` for the k best neighbors of (qid, qv) by (score desc,
    * id asc), excluding qid itself. Shared by the broadcast and blocked
    * paths so both produce bit-identical selections.
    */
  private def kBest(
      qid: Long,
      qv: Array[Float],
      idx: Array[(Long, Array[Float])],
      k: Int): (Array[(Long, Double)], Int) = {
    val best = new Array[(Long, Double)](k)
    var filled = 0
    idx.foreach { case (cid, cv) =>
      if (cid != qid) {
        val s = cosine(qv, cv)
        // Zero-norm vectors score NaN (0/0): every NaN comparison is
        // false, so one NaN in the buffer's tail slot would reject all
        // later candidates. Non-finite scores never enter the buffer.
        if (java.lang.Double.isFinite(s) &&
          (filled < k || s > best(filled - 1)._2
          || (s == best(filled - 1)._2 && cid < best(filled - 1)._1))) {
          var pos = math.min(filled, k - 1)
          if (filled < k) filled += 1
          while (pos > 0 && (best(pos - 1)._2 < s
            || (best(pos - 1)._2 == s && best(pos - 1)._1 > cid))) {
            best(pos) = best(pos - 1); pos -= 1
          }
          best(pos) = (cid, s)
        }
      }
    }
    (best, filled)
  }

  /** Exact cosine top-k: for every vector, its k nearest neighbors
    * (excluding itself), ties broken by ascending neighbor id.
    *
    * Dispatch: an index that fits the broadcast budget is collected and
    * broadcast (the broadcast-hash-join build-side contract — no shuffle,
    * linear in query rows); a larger index goes through
    * [[blockedTopK]], which never materializes the index on the driver.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      k: Int,
      maxIndexRows: Long = MaxBroadcastIndexRows): Dataset[Neighbor] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // Budget probe via bounded limit+collect: one pass decides AND builds
    // the broadcast index (a count-then-collect would execute the whole
    // upstream plan twice). Over budget, the bounded prefix is discarded
    // and the blocked path counts once to size its blocks.
    val budget = math.min(maxIndexRows, (Int.MaxValue - 2).toLong).toInt
    val prefix: Array[(Long, Array[Float])] = embeddings
      .select(col("vec_id"), col("embedding"))
      .limit(budget + 1)
      .as[(Long, Array[Float])]
      .collect()
    if (prefix.length > budget) {
      val indexRows = embeddings.count()
      val blocks = math.max(1L, (indexRows + maxIndexRows - 1) / maxIndexRows).toInt
      return blockedTopK(embeddings, k, blocks)
    }
    val index = prefix.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(index)
    embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val idx = bc.value
        rows.flatMap { case (qid, qv) =>
          val (best, filled) = kBest(qid, qv, idx, k)
          (0 until filled).map(r => Neighbor(qid, r + 1, best(r)._1, best(r)._2))
        }
      }
  }

  /** Exact distributed top-k for index sides too large to broadcast:
    * block-nested-loop KNN. The index is hash-split into `blocks` pieces
    * (each sized to fit executor memory); queries are replicated once per
    * block and cogrouped with their block, producing per-block k-buffers;
    * a final O(queries × blocks × k) shuffle merges the partials under the
    * exact (score desc, id asc) order. Nothing ever reaches the driver,
    * so the operator scales to an index of any size by raising `blocks` —
    * at 100 TB this is the exact-search fallback behind [[lshTopK]].
    */
  def blockedTopK(embeddings: DataFrame, k: Int, blocks: Int): Dataset[Neighbor] = {
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val idx = base.map { case (id, v) =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L)
      BlockedVec(id, v, (((h % blocks) + blocks) % blocks).toInt)
    }
    val reps = base.flatMap { case (id, v) =>
      (0 until blocks).iterator.map(b => BlockedVec(id, v, b))
    }
    val partials = reps.groupByKey(_.blk).cogroup(idx.groupByKey(_.blk)) { (_, qs, is) =>
      val block = is.map(bv => (bv.vec_id, bv.embedding)).toArray.sortBy(_._1)
      if (block.isEmpty) Iterator.empty
      else qs.flatMap { q =>
        val (best, filled) = kBest(q.vec_id, q.embedding, block, k)
        (0 until filled).iterator.map(r => PartialHit(q.vec_id, best(r)._1, best(r)._2))
      }
    }
    partials
      .groupByKey(_.vec_id)
      .flatMapGroups { (qid, hits) =>
        val all = hits.toArray.sortBy(h => (-h.score, h.neighbor_id))
        all.iterator.take(k).zipWithIndex.map { case (h, r) =>
          Neighbor(qid, r + 1, h.neighbor_id, h.score)
        }
      }
  }

  /** Deterministic seeded hyperplanes for sign-random-projection LSH. */
  private[ext] def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  case class Bucketed(vec_id: Long, table: Int, bucket: Long)

  /** LSH bucket assignment: `tables` independent hash tables of
    * `planesPerTable` sign bits each.
    */
  def lshBuckets(
      embeddings: DataFrame,
      tables: Int,
      planesPerTable: Int,
      seed: Long = 42L): Dataset[Bucketed] =
    lshBucketsDim(embeddings, tables, planesPerTable, seed,
      vecDim(embeddings, "embedding"))

  /** [[lshBuckets]] with the vector dim supplied by the caller — skips
    * the one-row probe job when the dim is already known (the persisted
    * index path probes the query frame once and reuses the value).
    */
  private[ext] def lshBucketsDim(
      embeddings: DataFrame,
      tables: Int,
      planesPerTable: Int,
      seed: Long,
      dim: Int): Dataset[Bucketed] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val planes = hyperplanes(tables * planesPerTable, dim, seed)
    val bc = spark.sparkContext.broadcast(planes)
    embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val ps = bc.value
        rows.flatMap { case (id, v) =>
          (0 until tables).map { t =>
            var bucket = 0L
            var p = 0
            while (p < planesPerTable) {
              val plane = ps(t * planesPerTable + p)
              var dot = 0.0
              var i = 0
              while (i < v.length) { dot += v(i) * plane(i); i += 1 }
              if (dot > 0) bucket |= (1L << p)
              p += 1
            }
            Bucketed(id, t, bucket)
          }
        }
      }
  }

  /** ANN top-k via LSH candidate generation + exact re-rank. Recall < 1 by
    * construction; increase `tables` (or decrease `planesPerTable`) to
    * trade shuffle volume for recall.
    *
    * `planesPerTable = 0` (the default) auto-scales resolution to corpus
    * size: planes ≈ log2(n / targetBucketRows), so expected bucket
    * occupancy stays ~targetBucketRows at ANY corpus size — a fixed plane
    * count is a different regime at every SF (6 planes = 64 buckets/table
    * is fine at 10⁴ vectors and quadratic death at 10⁹).
    *
    * Candidate budget guard (the [[Fuzzy.fuzzyJoin]] discipline): the
    * bucket self-join generates Σ_buckets c·(c−1) ordered candidate pairs
    * — degenerate embeddings (all-identical signs) collapse every vector
    * into one bucket per table and the join goes quadratic. The guard
    * estimates that sum from the bucket frame (one map-side-combinable
    * aggregation, cheap relative to the join it protects) and refuses to
    * launch an exploding run; raise `maxCandidatePairs` deliberately or
    * set ≤ 0 to disable.
    *
    * Cache lifecycle: the bucket frame is borrowed for this call (it
    * feeds the guard and both join sides), the (rows·k-bounded) result is
    * materialized eagerly — localCheckpoint truncates lineage — and the
    * cache is unpersisted before returning, so repeated calls leave no
    * CacheManager entries.
    */
  def lshTopK(
      embeddings: DataFrame,
      k: Int,
      tables: Int = 16,
      planesPerTable: Int = 0,
      seed: Long = 42L,
      targetBucketRows: Long = 64L,
      maxCandidatePairs: Long = 200000000L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(planesPerTable >= 0, s"planesPerTable must be >= 0 (0 = auto), got $planesPerTable")
    require(targetBucketRows >= 1, s"targetBucketRows must be >= 1, got $targetBucketRows")
    val planes =
      if (planesPerTable > 0) planesPerTable
      else {
        val n = embeddings.count()
        // bucket space 2^planes per table; E[occupancy] = n / 2^planes.
        // 62-bit cap: the bucket id is a long bitmask.
        math.min(62, math.max(1,
          math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketRows))
            / math.log(2.0)).toInt))
      }
    val buckets = lshBuckets(embeddings, tables, planes, seed).toDF().cache()
    try {
      if (maxCandidatePairs > 0) {
        val est = buckets.groupBy(col("table"), col("bucket"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(col("c").cast("double") * (col("c") - 1).cast("double")))
          .head().getAs[Any](0) match {
            case null => 0.0
            case d: java.lang.Double => d.doubleValue
          }
        require(est <= maxCandidatePairs.toDouble,
          f"lshTopK would generate ~$est%.3g candidate pairs " +
            f"(budget $maxCandidatePairs); raise planesPerTable (smaller " +
            "buckets), deduplicate degenerate embeddings, or raise " +
            "maxCandidatePairs deliberately")
      }
      val candidates = buckets.as("x")
        .join(buckets.as("y"),
          col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket")
            && col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"))
        .distinct()
      val embA = embeddings.select(col("vec_id"), col("embedding").as("emb_a"))
      val embB = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_b"))
      // Compiled pair scoring (graft.functions.CosineSim): bit-identical
      // to the former typed `.map(cosine)` without the per-pair
      // DeserializeToObject/SerializeFromObject array copies.
      val scored = candidates
        .join(embA, Seq("vec_id"))
        .join(embB, Seq("neighbor_id"))
        .select(col("vec_id"), col("neighbor_id"),
          graft.functions.CosineSim.column(col("emb_a"), col("emb_b")).as("score"))
      import org.apache.spark.sql.expressions.Window
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("score").desc, col("neighbor_id"))))
        .where(col("rank") <= k)
        .select(col("vec_id"), col("rank"), col("neighbor_id"), col("score"))
        .localCheckpoint(true)
    } finally buckets.unpersist(false)
  }

  /** Corpus-derived IVF cell count (pass `nCells = 0` to the IVF entry
    * points to use it) — the sibling of [[lshTopK]]'s auto-planes, so the
    * partition resolution survives a corpus 10× larger without retuning:
    * ≈ `sqrt(n)` cells (the FAISS nlist guidance — balances centroid-scan
    * cost against per-cell candidate volume), capped at `n / 39` so every
    * cell keeps enough members to train and fill (FAISS's ~39
    * training-points-per-centroid floor), floor 1. At n = 2000 → 45
    * cells; at n = 10⁹ → ~31.6k cells, each ~31.6k vectors — the shape a
    * 1000-executor probe join wants.
    */
  def autoCells(n: Long): Int = {
    val bySqrt = math.ceil(math.sqrt(math.max(0L, n).toDouble)).toLong
    math.max(1L, math.min(bySqrt, n / 39L)).toInt
  }

  /** Deterministic IVF coarse quantizer: `nCells` centroids seeded from
    * the vectors with the smallest `xxhash64(vec_id)` (a uniform sample
    * with no RNG — reproducible across runs and engines), refined with
    * `iters` Lloyd steps computed as Spark aggregations (posexplode →
    * per-(cell, dim) mean). Only the model (nCells × dim doubles) ever
    * reaches the driver — corpus-sized data stays distributed, so the
    * build scales to any corpus; cell count should grow ~sqrt(corpus).
    */
  def ivfCentroids(
      embeddings: DataFrame,
      nCells: Int,
      iters: Int = 2): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    var centroids: Array[Array[Double]] = embeddings
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .as[(Long, Array[Float])]
      .collect()
      .map(_._2.map(_.toDouble))
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(centroids)
      val means = embeddings
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (_, v) =>
          val cs = bc.value
          var best = 0; var bestScore = Double.MinValue
          var c = 0
          while (c < cs.length) {
            val s = cosineVs(v, cs(c))
            if (s > bestScore) { bestScore = s; best = c }
            c += 1
          }
          (best, v)
        }
        .toDF("cell", "embedding")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .as[(Int, Int, Double)]
        .collect()
      val byCell = means.groupBy(_._1)
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) => rows.sortBy(_._2).map(_._3).toArray
          case None => centroids(c) // empty cell keeps its centroid
        }
      }.toArray
    }
    centroids
  }

  private[ext] def cosineVs(a: Array[Float], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** ANN top-k via IVF: index vectors live in their nearest-centroid cell;
    * a query probes its `nprobe` highest-affinity cells and exact-ranks
    * only those cells' members — the classic partition-pruned search.
    * Shuffle volume is O(rows × nprobe) plus the probed cells' contents,
    * never O(rows²). Recall < 1 by construction; raise `nprobe` (or
    * `nCells` resolution) to trade candidate volume for recall.
    * `nCells = 0` derives the cell count from the corpus ([[autoCells]]).
    */
  def ivfTopK(
      embeddings: DataFrame,
      k: Int,
      nCells: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cells = if (nCells > 0) nCells else autoCells(embeddings.count())
    val centroids = ivfCentroids(embeddings, cells, iters)
    val bc = spark.sparkContext.broadcast(centroids)
    val base = embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
    val assigned = base.map { case (id, v) =>
      val cs = bc.value
      var best = 0; var bestScore = Double.MinValue
      var c = 0
      while (c < cs.length) {
        val s = cosineVs(v, cs(c))
        if (s > bestScore) { bestScore = s; best = c }
        c += 1
      }
      BlockedVec(id, v, best)
    }.toDF("neighbor_id", "emb_b", "cell")
    val probes = base.flatMap { case (id, v) =>
      val cs = bc.value
      cs.indices
        .map(c => (c, cosineVs(v, cs(c))))
        .sortBy { case (c, s) => (-s, c) }
        .take(nprobe)
        .iterator
        .map { case (c, _) => BlockedVec(id, v, c) }
    }.toDF("vec_id", "emb_a", "cell")
    import org.apache.spark.sql.expressions.Window
    probes
      .join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("neighbor_id"))
      // compiled pair scoring — see lshTopK's note
      .select(col("vec_id"), col("neighbor_id"),
        graft.functions.CosineSim.column(col("emb_a"), col("emb_b")).as("score"))
      // r22: no distinct — cells are DISJOINT (the assignment emits exactly
      // one best cell per index vector) and a query probes nprobe DISTINCT
      // cells, so a (query, neighbor) pair meets at most once; the former
      // .distinct() was guide §2.4's "distinct on data that is already
      // unique" — a full exchange + aggregate of the scored candidate
      // frame, the largest in the operator (LSH keeps its distinct: a pair
      // CAN meet in several hash tables there)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  /** Exact embedding near-dup pairs (cosine ≥ threshold) via broadcast
    * brute force — used by dedup pipelines with a high threshold. Index
    * sides over the broadcast budget take the blocked distributed path
    * (no driver materialization), same completeness: every (query, index)
    * combination lands in exactly one block.
    */
  def cosineNearDupPairs(
      embeddings: DataFrame,
      threshold: Double,
      maxIndexRows: Long = MaxBroadcastIndexRows): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // Same one-pass budget probe as [[bruteForceTopK]].
    val budget = math.min(maxIndexRows, (Int.MaxValue - 2).toLong).toInt
    val prefix: Array[(Long, Array[Float])] = embeddings
      .select(col("vec_id"), col("embedding"))
      .limit(budget + 1)
      .as[(Long, Array[Float])]
      .collect()
    if (prefix.length > budget) {
      val indexRows = embeddings.count()
      val blocks = math.max(1L, (indexRows + maxIndexRows - 1) / maxIndexRows).toInt
      val base = embeddings.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      val idx = base.map { case (id, v) =>
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L)
        BlockedVec(id, v, (((h % blocks) + blocks) % blocks).toInt)
      }
      val reps = base.flatMap { case (id, v) =>
        (0 until blocks).iterator.map(b => BlockedVec(id, v, b))
      }
      return reps.groupByKey(_.blk).cogroup(idx.groupByKey(_.blk)) { (_, qs, is) =>
        val block = is.map(bv => (bv.vec_id, bv.embedding)).toArray
        if (block.isEmpty) Iterator.empty
        else qs.flatMap { q =>
          block.iterator
            .filter(_._1 > q.vec_id)
            .map { case (cid, cv) => (q.vec_id, cid, cosine(q.embedding, cv)) }
            .filter(_._3 >= threshold)
        }
      }.toDF("id_a", "id_b", "score")
    }
    val index = prefix.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(index)
    embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val idx = bc.value
        rows.flatMap { case (qid, qv) =>
          idx.iterator
            .filter(_._1 > qid)
            .map { case (cid, cv) => (qid, cid, cosine(qv, cv)) }
            .filter(_._3 >= threshold)
        }
      }
      .toDF("id_a", "id_b", "score")
  }

  /** Signed-random-projection dimensionality reduction, cross-engine
    * exact: y_j = Σ_i s_ij · q_i where q_i = floor(x_i·1024 + 0.5) (the
    * half-up fixed-point both engines floor identically) and the sign
    * matrix s_ij = ±1 derives from md5(i:j) — so the projected vectors
    * are bit-identical on any engine with md5, unlike float-accumulated
    * projections whose sums depend on association order. The standard
    * preprocessing step before LSH bucketing or a compact index: a
    * 64→16 projection preserves cosine neighborhoods (Johnson-
    * Lindenstrauss) at a quarter of the memory and dot-product cost.
    *
    * Output: (idCol, y0..y{outDims-1}) as longs (unnormalized — ranking
    * and bucketing only need relative magnitudes).
    *
    * Scale shape: SHUFFLE-FREE. The ±1 matrix depends only on (i, j) —
    * a dim×outDims constant — so it is derived once driver-side (same
    * md5 rule the oracle spells per-element) and folded into the rows
    * as literal arrays via `zip_with`/`aggregate`: a pure projection,
    * no posexplode, no groupBy. Integer addition is associativity-free,
    * so the fold equals the oracle's SUM exactly. Vectors are assumed
    * fixed-dim (the embedding-table contract); a longer row would
    * surface as a NULL projection (zip_with pads), never a silent
    * partial sum.
    */
  def randomProjection(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      outDims: Int = 16): DataFrame = {
    require(outDims >= 1 && outDims <= 64, s"outDims must be in [1,64], got $outDims")
    val dim = vecDim(df, vecCol)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Long = {
      val hex = md.digest(s"$i:$j".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (hex.head <= '7') 1L else -1L
    }
    val signs: IndexedSeq[Array[Long]] =
      (0 until outDims).map(j => Array.tabulate(dim)(i => sign(i, j)))
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * lit(1024d) + lit(0.5)).cast("long"))
    val ys = (0 until outDims).map { j =>
      aggregate(zip_with(col("__qv"), typedLit(signs(j)), (qq, ss) => qq * ss),
        lit(0L), (acc, v) => acc + v).as(s"y$j")
    }
    df.select(col(idCol), q.as("__qv"))
      .select(col(idCol) +: ys: _*)
  }

  /** SRP resolution derived from the corpus, the [[autoCells]] analogue
    * for [[semDedup]]: enough sign bits that the EXPECTED bucket size
    * stays ≈ `targetBucketRows`, so the within-bucket Σ size(b)² join
    * cost grows ~linearly with n instead of quadratically at a pinned
    * resolution. The 100× rehearsal motivated it: bits = 4 (16 buckets,
    * right for the 2k-vector catalog base) puts 12.5k vectors per bucket
    * at n = 200k — ~2.4 G within-bucket pairs, a 10-minute join for a
    * dedup pass that should take seconds. bits = ceil(log2(n / target)),
    * clamped to [1, 32]; recall per ε-ball shrinks as buckets split (the
    * standard SemDeDup trade documented on [[semDedup]]) — hold `bits`
    * fixed when comparing prune sets across corpus sizes.
    */
  def autoBits(n: Long, targetBucketRows: Long = 64L): Int = {
    require(targetBucketRows >= 1, s"targetBucketRows must be >= 1")
    val b = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucketRows)) / math.log(2.0))
    math.max(1, math.min(32, b.toInt))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) re-expressed
    * Spark-first: semantic near-duplicate pruning over an embedding
    * column. Coarse partitioner = the [[randomProjection]] SRP sign
    * bucket (bit-exact cross-engine); within each bucket, pairwise
    * fixed-point cosine; a vector is pruned when an EARLIER in-bucket
    * vector is within the threshold — the keep-lowest-id variant of
    * SemDeDup's keep-one-per-ε-ball rule, deterministic on any engine.
    *
    * Exactness: q_i = floor(x_i·1024 + 0.5) fixed-point;
    * cos(a,b) ≥ n/d  ⟺  dot(qa,qb) > 0 ∧ d²·dot² ≥ n²·|qa|²·|qb|² —
    * pure long arithmetic, so Spark and DuckDB prune EXACTLY the same
    * rows (float cosine accumulates in association order and cannot be
    * oracle-hashed). Bounds: dim ≤ 128 with max|x| ≤ 1 and n,d ≤ 16
    * keep every product under 2^62 (dot ≤ dim·2^20; d²·dot² and
    * n²·|qa|²·|qb|² ≤ 2^8·dim²·2^40 ≤ 2^62).
    *
    * Scale shape: ONE equi-join on the bucket id (never cartesian) plus
    * a groupBy for the earliest witness and a left join back — cost is
    * Σ_b size(b)², the knob being `bits`: more bits → smaller buckets →
    * cheaper join and lower ε-ball recall, the standard SemDeDup trade.
    * `bits = 0` derives the resolution from the corpus ([[autoBits]]:
    * E[bucket size] ≈ 64), so a 100× corpus splits into 100× buckets
    * instead of quadratically fatter ones. At 100 TB run
    * [[randomProjection]] first (1024→64 dims) and salt giant buckets.
    *
    * Output: one row per vector — (idCol, bucket, witness, removed);
    * `witness` is the smallest earlier in-bucket id within τ (null ⇒
    * kept), so the result both lists the pruned set and certifies why.
    *
    * Laziness caveat: `bits = 0` makes this call EAGER — [[autoBits]]
    * needs `df.count()`, so the upstream plan is evaluated once for the
    * count and again by the dedup job itself. Cache or checkpoint an
    * expensive input before calling with `bits = 0`, or pre-compute
    * `autoBits(n)` from a known row count and pass it explicitly;
    * `bits > 0` keeps semDedup a pure lazy transformation.
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int = 4,
      tauNum: Int = 2,
      tauDen: Int = 5): DataFrame = {
    require(bits >= 0 && bits <= 32, s"bits must be in [0,32] (0 = auto), got $bits")
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen && tauDen <= 16,
      s"threshold must be a rational in (0,1] with denominator <= 16, got $tauNum/$tauDen")
    // qv, n2, AND the SRP bucket are all row-local projections (the sign
    // matrix folds as literals, the [[randomProjection]] spelling), so
    // the whole per-vector frame is ONE shuffle-free select — no join
    // between a projection frame and a quantization frame.
    val dim = vecDim(df, vecCol)
    // The scaladoc's long-arithmetic overflow bound is dim ≤ 128 with
    // max|x| ≤ 1: beyond it d²·dot² / n²·|qa|²·|qb|² silently overflow
    // 2^62 and FLIP prune decisions. Fail fast — 1024-dim inputs must run
    // [[randomProjection]] first, as documented, not corrupt silently.
    require(dim <= 128,
      s"semDedup's exact long-arithmetic cosine is only safe for dim <= 128 " +
        s"(got $dim); reduce with randomProjection first")
    // bits = 0 → corpus-derived resolution (one count job, like the
    // autoCells path in the IVF builder)
    val resolvedBits = if (bits > 0) bits else autoBits(df.count())
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Long = {
      val hex = md.digest(s"$i:$j".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (hex.head <= '7') 1L else -1L
    }
    val bucketExpr = (0 until resolvedBits).map { j =>
      val signs = Array.tabulate(dim)(i => sign(i, j))
      val yj = aggregate(
        zip_with(col("__qv"), typedLit(signs), (qq, ss) => qq * ss),
        lit(0L), (acc, v) => acc + v)
      when(yj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val base = df
      .select(
        col(idCol).as("__id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1024d) + lit(0.5)).cast("long"))
          .as("__qv"))
      .select(col("__id"), col("__qv"),
        aggregate(col("__qv"), lit(0L), (acc, q) => acc + q * q).as("__n2"),
        bucketExpr.as("bucket"))
    val a = base.select(col("__id").as("__ia"), col("__qv").as("__qa"),
      col("__n2").as("__na2"), col("bucket"))
    val b = base.select(col("__id").as("__ib"), col("__qv").as("__qb"),
      col("__n2").as("__nb2"), col("bucket"))
    // r22 (guide step 4): compiled long-dot — the former
    // aggregate(zip_with(...)) HOF pair was interpreted per candidate
    // pair (the hot loop of the bucket join); value-identical inside the
    // dim ≤ 128 envelope enforced above, pinned by LongDotSpec
    val dot = graft.functions.LongDot.column(col("__qa"), col("__qb"))
    val witnesses = a.join(b, Seq("bucket")) // equi-join: never cartesian
      .filter(col("__ia") < col("__ib"))
      .withColumn("__dot", dot)
      .filter(col("__na2") > 0 && col("__nb2") > 0 && col("__dot") > 0 &&
        col("__dot") * col("__dot") * lit(tauDen.toLong * tauDen) >=
          lit(tauNum.toLong * tauNum) * col("__na2") * col("__nb2"))
      .groupBy(col("__ib").as("__id"))
      .agg(min(col("__ia")).as("witness"))
    base.join(witnesses, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("bucket"), col("witness"),
        col("witness").isNotNull.as("removed"))
  }
}
