package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search — the memory lever
  * beyond int8: split each (L2-normalized) vector into `m` subvectors,
  * k-means each subspace into `k` centroids, and store per vector only
  * the m centroid ids (m bytes at k ≤ 256) — 16-32× smaller than
  * float32. Search scores candidates with the asymmetric distance
  * computation (ADC): per query, one m×k table of subspace dot products,
  * then each candidate is m table lookups — no candidate-vector floats
  * touched until the exact re-rank of the ADC top `rerank`.
  *
  * Training is deterministic end-to-end (hash-seeded centroids + Lloyd
  * iterations as Spark aggregations, mirroring
  * [[Similarity.ivfCentroids]]), so models, codes, and search results
  * are reproducible across runs and cluster layouts.
  *
  * Scale shape: training touches the corpus O(iters) times with only
  * (m·k·subDim) doubles ever on the driver; encoding is one narrow map;
  * the codes table broadcasts at m bytes/vector (a 1e9-vector corpus at
  * m=16 is 16 GB — blocked search applies above that, same pattern as
  * [[Similarity.blockedTopK]]); re-rank joins fetch full vectors for
  * only O(queries × rerank) rows.
  */
object Pq {

  /** m × k × (dim/m) codebooks over L2-normalized inputs. */
  final case class PqModel(m: Int, k: Int, dim: Int,
      codebooks: Array[Array[Array[Double]]])

  private[ext] def normalize(v: Array[Float]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    v.map(_.toDouble * inv)
  }

  private[ext] def subDot(a: Array[Double], offset: Int, c: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < c.length) { d += a(offset + i) * c(i); i += 1 }
    d
  }

  private[ext] def nearest(sub: Array[Double], offset: Int,
      cents: Array[Array[Double]]): Int = {
    // max inner product ≡ min L2 on normalized data per subspace ties to
    // the ADC dot scoring below; ties break to the lowest centroid id
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val s = {
        var d = 0.0; var i = 0
        val cc = cents(c)
        while (i < cc.length) { d += sub(offset + i) * cc(i); i += 1 }
        // centering on plain dot would leave ties; subtract half self-dot
        // so this is exactly -0.5·||x-c||² up to a per-x constant
        var n = 0.0; i = 0
        while (i < cc.length) { n += cc(i) * cc(i); i += 1 }
        d - 0.5 * n
      }
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  /** Deterministic PQ training: seed each subspace's centroids from the
    * `k` vectors with smallest xxhash64(vec_id), then `iters` Lloyd
    * steps computed distributively (assign in a map, means via one
    * groupBy per iteration).
    */
  def train(embeddings: DataFrame, m: Int = 16, k: Int = 16,
      iters: Int = 3): PqModel = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dimRow = embeddings.select(size(col("embedding"))).head(1)
    require(dimRow.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val seeds = embeddings
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .as[(Long, Array[Float])]
      .collect()
      .map(r => normalize(r._2))
    require(seeds.nonEmpty, "cannot train PQ on an empty corpus")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m, k) { (s, c) =>
      seeds(c % seeds.length).slice(s * subDim, (s + 1) * subDim)
    }
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(books)
      val means = embeddings
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .flatMap { case (_, v) =>
          val nv = normalize(v)
          val bks = bc.value
          (0 until bks.length).iterator.flatMap { s =>
            val c = nearest(nv, s * (nv.length / bks.length), bks(s))
            val off = s * (nv.length / bks.length)
            (0 until nv.length / bks.length).iterator
              .map(p => ((s, c, p), nv(off + p)))
          }
        }
        .toDF("key", "x")
        .groupBy(col("key")).agg(avg(col("x")).as("mu"))
        .as[((Int, Int, Int), Double)]
        .collect()
      val byCell = means.groupBy { case ((s, c, _), _) => (s, c) }
      books = Array.tabulate(m, k) { (s, c) =>
        byCell.get((s, c)) match {
          case Some(rows) =>
            rows.sortBy { case ((_, _, p), _) => p }.map(_._2).toArray
          case None => books(s)(c) // empty cell keeps its centroid
        }
      }
    }
    PqModel(m, k, dim, books)
  }

  /** Per-vector PQ codes: (vec_id, codes m×[0,k)). */
  def encode(embeddings: DataFrame, model: PqModel): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    embeddings
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val mm = bc.value
        val nv = normalize(v)
        val subDim = mm.dim / mm.m
        (id, Array.tabulate(mm.m)(s => nearest(nv, s * subDim, mm.codebooks(s))))
      }
      .toDF("vec_id", "codes")
  }

  /** ANN top-k: ADC candidate generation over broadcast codes, exact
    * cosine re-rank of the top `rerank` candidates per query. Output
    * matches [[Similarity.bruteForceTopK]]'s shape.
    *
    * The codes table is collected and broadcast (m ints + an id per
    * vector) — the broadcast-build contract. Indexes beyond
    * `maxIndexRows` auto-dispatch to [[ivfAdcTopK]] with this call's
    * `nCells`/`nprobe`, whose cell cogroup never materializes codes on
    * the driver — at 100× scale over-budget is the expected case, not an
    * error. NOTE the dispatch is approximate-to-approximate, not
    * result-identical (unlike [[Similarity.bruteForceTopK]]'s exact
    * blocked degrade): the IVF path scores only the probed cells, so
    * recall across the budget boundary follows the `nprobe`/`nCells`
    * tuning — raise `nprobe` (or call [[ivfAdcTopK]] explicitly) when
    * crossing it matters; both paths stay deterministic.
    */
  def adcTopK(embeddings: DataFrame, topK: Int, m: Int = 16, k: Int = 16,
      rerank: Int = 50, iters: Int = 3,
      maxIndexRows: Long = Similarity.MaxBroadcastIndexRows,
      nCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // Budget probe BEFORE training: code-index rows == corpus rows, so a
    // bounded limit+collect on ids alone decides the dispatch without
    // paying for a training pass that the IVF path would redo anyway.
    val budget = math.min(maxIndexRows, (Int.MaxValue - 2).toLong).toInt
    val idPrefix: Array[Long] = embeddings
      .select(col("vec_id")).limit(budget + 1).as[Long].collect()
    if (idPrefix.length > budget)
      return ivfAdcTopK(embeddings, topK, nCells = nCells, nprobe = nprobe,
        m = m, k = k, rerank = rerank, iters = iters)
    val model = train(embeddings, m, k, iters)
    val codes: Array[(Long, Array[Int])] = encode(embeddings, model)
      .as[(Long, Array[Int])].collect().sortBy(_._1)
    val bcCodes = spark.sparkContext.broadcast(codes)
    val bcModel = spark.sparkContext.broadcast(model)
    val candidates = embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        val mm = bcModel.value
        val nq = normalize(qv)
        val subDim = mm.dim / mm.m
        // the ADC table: dot of each query subvector with every centroid
        val table = Array.tabulate(mm.m, mm.k)((s, c) =>
          subDot(nq, s * subDim, mm.codebooks(s)(c)))
        val best = new Array[(Long, Double)](rerank)
        var filled = 0
        bcCodes.value.foreach { case (cid, cs) =>
          if (cid != qid) {
            var score = 0.0; var s = 0
            while (s < cs.length) { score += table(s)(cs(s)); s += 1 }
            if (filled < rerank || score > best(filled - 1)._2
              || (score == best(filled - 1)._2 && cid < best(filled - 1)._1)) {
              var pos = math.min(filled, rerank - 1)
              if (filled < rerank) filled += 1
              while (pos > 0 && (best(pos - 1)._2 < score
                || (best(pos - 1)._2 == score && best(pos - 1)._1 > cid))) {
                best(pos) = best(pos - 1); pos -= 1
              }
              best(pos) = (cid, score)
            }
          }
        }
        (0 until filled).iterator.map(i => (qid, best(i)._1))
      }
      .toDF("vec_id", "neighbor_id")
    rerankExact(candidates, embeddings, embeddings, topK)
  }

  /** Exact cosine re-rank of (vec_id, neighbor_id) candidate pairs:
    * fetches true vectors for candidates only — O(queries × rerank)
    * join rows regardless of corpus size. Query vectors and index
    * vectors are separate frames so a persisted index can re-rank
    * against its own published vectors ([[AnnIndex.ivfPqTopKIndexed]]).
    */
  private[ext] def rerankExact(
      candidates: DataFrame, queryVectors: DataFrame,
      indexVectors: DataFrame, topK: Int): DataFrame = {
    val spark = queryVectors.sparkSession
    import spark.implicits._
    val embA = queryVectors.select(col("vec_id"), col("embedding").as("emb_a"))
    val embB = indexVectors.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("emb_b"))
    import org.apache.spark.sql.expressions.Window
    candidates
      .join(embA, Seq("vec_id"))
      .join(embB, Seq("neighbor_id"))
      // compiled pair scoring (graft.functions.CosineSim) — bit-identical
      // to the former typed `.map(Similarity.cosine)` without per-pair
      // object conversion (see AnnIndex.lshTopKIndexed's note)
      .select(col("vec_id"), col("neighbor_id"),
        graft.functions.CosineSim.column(col("emb_a"), col("emb_b")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .where(col("rank") <= topK)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  /** IVF-PQ: the production vector-search composition (FAISS's IVFPQ
    * expressed on Spark). IVF cells prune candidate generation to the
    * query's `nprobe` nearest cells (a cogroup on cell id — shuffle
    * O(rows × nprobe), never O(rows²)); INSIDE each cell, candidates are
    * scored from PQ codes with one m×k ADC table per (query, cell) and m
    * lookups per member — no full vectors move until the exact re-rank
    * of the global ADC top `rerank`. Corpus memory in the search stage
    * is m bytes + a cell id per vector.
    */
  def ivfAdcTopK(
      embeddings: DataFrame,
      topK: Int,
      nCells: Int = 16,
      nprobe: Int = 4,
      m: Int = 16,
      k: Int = 16,
      rerank: Int = 50,
      iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centroids = Similarity.ivfCentroids(embeddings, nCells, iters)
    val model = train(embeddings, m, k, iters)
    val assigned = encodeAssigned(embeddings, centroids, model)
    val candidates =
      ivfAdcCandidates(embeddings, assigned, centroids, model, nprobe, rerank)
    rerankExact(candidates, embeddings, embeddings, topK)
  }

  /** Cell assignment + PQ codes in one pass — the encode side shared by
    * the inline composition above and the persisted index's build/append
    * ([[AnnIndex.buildIvfPqIndex]]), so indexed ≡ inline holds by
    * construction.
    */
  private[ext] def encodeAssigned(
      embeddings: DataFrame,
      centroids: Array[Array[Double]],
      model: PqModel): Dataset[PqCoded] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bcCents = spark.sparkContext.broadcast(centroids)
    val bcModel = spark.sparkContext.broadcast(model)
    embeddings
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val mm = bcModel.value
        val cs = bcCents.value
        var best = 0; var bestScore = Double.MinValue
        var c = 0
        while (c < cs.length) {
          val s = Similarity.cosineVs(v, cs(c))
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        val nv = normalize(v)
        val subDim = mm.dim / mm.m
        PqCoded(id,
          Array.tabulate(mm.m)(s => nearest(nv, s * subDim, mm.codebooks(s))),
          best)
      }
  }

  /** The IVF-PQ search core: probe `nprobe` best cells per query, score
    * every probed cell's members from PQ codes (one m×k ADC table per
    * (query, cell)), and keep the global ADC top `rerank` per query.
    * Returns (vec_id, neighbor_id) candidate pairs for the exact
    * re-rank. Shared verbatim by [[ivfAdcTopK]] and the persisted
    * [[AnnIndex.ivfPqTopKIndexed]].
    */
  private[ext] def ivfAdcCandidates(
      queries: DataFrame,
      assigned: Dataset[PqCoded],
      centroids: Array[Array[Double]],
      model: PqModel,
      nprobe: Int,
      rerank: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bcCents = spark.sparkContext.broadcast(centroids)
    val bcModel = spark.sparkContext.broadcast(model)
    val probes = queries
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
      val cs = bcCents.value
      cs.indices
        .map(c => (c, Similarity.cosineVs(v, cs(c))))
        .sortBy { case (c, s) => (-s, c) }
        .take(nprobe)
        .iterator
        .map { case (c, _) => BlockedVec(id, v, c) }
    }
    val partials = probes.groupByKey(_.blk)
      .cogroup(assigned.groupByKey(_.cell)) { (_, qs, members) =>
        val cell = members.map(p => (p.vec_id, p.codes)).toArray.sortBy(_._1)
        if (cell.isEmpty) Iterator.empty
        else qs.flatMap { q =>
          val mm = bcModel.value
          val nq = normalize(q.embedding)
          val subDim = mm.dim / mm.m
          // one ADC table per (query, cell): m×k subspace dot products
          val table = Array.tabulate(mm.m, mm.k)((s, c) =>
            subDot(nq, s * subDim, mm.codebooks(s)(c)))
          cell.iterator.collect {
            case (cid, cs) if cid != q.vec_id =>
              var score = 0.0; var s = 0
              while (s < cs.length) { score += table(s)(cs(s)); s += 1 }
              PartialHit(q.vec_id, cid, score)
          }
        }
      }
    partials
      .groupByKey(_.vec_id)
      .flatMapGroups { (qid, hits) =>
        hits.toSeq.distinct // a pair can meet in several probed cells
          .sortBy(h => (-h.score, h.neighbor_id))
          .iterator.take(rerank)
          .map(h => (qid, h.neighbor_id))
      }
      .toDF("vec_id", "neighbor_id")
  }
}

/** PQ-coded vector pinned to its IVF cell; top-level for Encoder codegen. */
case class PqCoded(vec_id: Long, codes: Array[Int], cell: Int)
