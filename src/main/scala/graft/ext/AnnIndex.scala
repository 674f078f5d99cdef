package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.Versioned

/** Persisted ANN index — the embeddings analogue of
  * [[IncrementalDedup]]'s Versioned band index: build ONCE as published
  * parquet state, query MANY times with no training stage in the query
  * plan.
  *
  * Why this exists: the inline [[Similarity.lshTopK]]/[[Similarity.ivfTopK]]
  * re-derive buckets/centroids on every call. At 100 TB, index
  * construction (a full corpus scan + for IVF a Lloyd iteration) dwarfs
  * any single query; the deployed shape is a build-side pipeline that
  * publishes the index to the lake and a query side that only reads it —
  * FAISS's train/add vs search split, expressed as Versioned tables.
  *
  * Layout (all [[Versioned]] snapshot tables under one state root):
  *  - LSH:  `vectors`  (vec_id, embedding) — the re-rank source;
  *          `buckets`  (vec_id, table, bucket), min/max stats on
  *                     (table, bucket) so probe reads can skip row groups;
  *          `meta`     1 row (tables, planes, seed, dim, n) — everything
  *                     a query needs to hash itself into the same space.
  *  - IVF:  `cells`     (vec_id, cell, embedding), stats on cell;
  *          `centroids` (cell, pos, v) — nCells × dim doubles;
  *          `ivf_meta`  1 row (n_cells, iters, dim, n).
  *
  * Build publishes the meta table LAST: `exists` keys on it, so a crash
  * mid-build is invisible (next build re-publishes; snapshot semantics
  * make each publish atomic).
  *
  * Scale posture: query cost is (query rows × tables) bucket hashes +
  * an equi-join against the published bucket table + re-rank over the
  * matched cells/buckets only — no corpus-wide training scan. The same
  * candidate-pair budget guard as [[Similarity.lshTopK]] protects the
  * probe join from degenerate (single-bucket) skew.
  */
object AnnIndex {

  /** `sourceTag` is the caller's fingerprint of the indexed source (row
    * count, file digest, a data version — anything that changes when the
    * data does). It is recorded at build time and VALIDATED at query time
    * when the caller passes `expectedSourceTag`: a published index can
    * otherwise silently serve stale neighbors after the source is
    * regenerated in place (r6 verdict, What's wrong #2). Empty = untagged.
    */
  final case class LshMeta(tables: Int, planes: Int, seed: Long, dim: Int,
      n: Long, sourceTag: String = "")
  final case class IvfMeta(nCells: Int, iters: Int, dim: Int, n: Long,
      sourceTag: String = "")
  final case class IvfPqMeta(nCells: Int, iters: Int, m: Int, k: Int,
      dim: Int, n: Long, sourceTag: String = "")

  private def requireFreshTag(
      kind: String, stateRoot: String, indexed: String,
      expected: Option[String]): Unit =
    expected.foreach { want =>
      require(indexed == want,
        s"$kind index at $stateRoot is STALE: built from source tagged " +
          s"'$indexed' but the caller expects '$want' — the source data " +
          "changed since the build. Rebuild the index (or drop the root).")
    }

  // Query-side model memoization, keyed by (table root, published
  // version): the build-once/query-many contract makes the small driver-
  // side models (LSH meta: 5 scalars; IVF: nCells × dim doubles) safe to
  // cache per JVM — a republish bumps the version and naturally
  // invalidates. Saves 1-2 small Spark jobs per query call, which at
  // bench scale is most of the query's fixed cost.
  private val lshMetaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), LshMeta]()
  private val ivfModelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (Int, Int, Array[Array[Double]], String)]()

  private def vectorsRoot(stateRoot: String) = s"$stateRoot/vectors"
  private def bucketsRoot(stateRoot: String) = s"$stateRoot/buckets"
  private def metaRoot(stateRoot: String) = s"$stateRoot/meta"
  private def cellsRoot(stateRoot: String) = s"$stateRoot/cells"
  private def centroidsRoot(stateRoot: String) = s"$stateRoot/centroids"
  private def ivfMetaRoot(stateRoot: String) = s"$stateRoot/ivf_meta"
  private def pqCellsRoot(stateRoot: String) = s"$stateRoot/pq_cells"
  private def pqVectorsRoot(stateRoot: String) = s"$stateRoot/pq_vectors"
  private def pqCentroidsRoot(stateRoot: String) = s"$stateRoot/pq_centroids"
  private def pqBooksRoot(stateRoot: String) = s"$stateRoot/pq_books"
  private def pqMetaRoot(stateRoot: String) = s"$stateRoot/pq_meta"

  /** True once a complete LSH index is published under `stateRoot`. */
  def lshExists(stateRoot: String): Boolean = Versioned.exists(metaRoot(stateRoot))

  /** True once a complete IVF index is published under `stateRoot`. */
  def ivfExists(stateRoot: String): Boolean = Versioned.exists(ivfMetaRoot(stateRoot))

  /** Build + publish the SRP-LSH index. `planesPerTable = 0` auto-scales
    * to corpus size exactly like [[Similarity.lshTopK]] (occupancy ≈
    * `targetBucketRows` at any scale). Returns the resolved meta.
    */
  def buildLshIndex(
      embeddings: DataFrame,
      stateRoot: String,
      tables: Int = 16,
      planesPerTable: Int = 0,
      seed: Long = 42L,
      targetBucketRows: Long = 64L,
      sourceTag: String = ""): LshMeta = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(tables >= 1, s"tables must be >= 1, got $tables")
    // Writer lock across the multi-table publish: concurrent first-
    // builders in separate JVMs would otherwise race writeDir's version
    // allocation and interleave vectors/buckets/meta (ADVICE r6). The
    // second builder fails fast with the holder's identity; a CRASHED
    // holder's lock auto-expires after UnattendedStaleLockMillis so the
    // build-if-absent query path (x41/x43/x47) self-heals instead of
    // wedging until a human runs Versioned.breakLock.
    Versioned.withWriterLock(stateRoot, Versioned.UnattendedStaleLockMillis) {
      val base = embeddings.select(col("vec_id"), col("embedding"))
      val n = base.count()
      val dim = Similarity.vecDim(base, "embedding")
      val planes =
        if (planesPerTable > 0) planesPerTable
        else math.min(62, math.max(1,
          math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketRows))
            / math.log(2.0)).toInt))
      val buckets = Similarity.lshBuckets(base, tables, planes, seed).toDF()
      Versioned.publish(base, vectorsRoot(stateRoot))
      Versioned.publish(buckets, bucketsRoot(stateRoot),
        statsCols = Seq("table", "bucket"))
      val meta = LshMeta(tables, planes, seed, dim, n, sourceTag)
      Versioned.publish(
        Seq((meta.tables, meta.planes, meta.seed, meta.dim, meta.n, meta.sourceTag))
          .toDF("tables", "planes", "seed", "dim", "n", "source_tag"),
        metaRoot(stateRoot))
      meta
    }
  }

  /** Append a delta of embeddings to a published LSH index — FAISS's
    * `add` phase: the delta hashes under the index's FROZEN projection
    * (meta's tables/planes/seed never change on append, so existing
    * bucket assignments stay valid) and lands as Versioned DELTAS —
    * O(delta) work per delivery, history never rewritten (the
    * [[Versioned.publishDelta]] log-table shape). Queries see appended
    * vectors immediately: [[lshTopKIndexed]] reads the manifest union
    * and sizes its guard from [[Versioned.publishedRows]], not the
    * build-time meta.n.
    *
    * `vec_id` must be unique across the base and every delta (the
    * document-primary-key contract, as in [[Shuffling.permute]]): a
    * re-added id would occupy two index slots and duplicate itself in
    * result rankings. Dedup deliveries first.
    *
    * CRASH SEMANTICS: the two delta publishes are individually atomic
    * but not jointly — a crash between them leaves the delivery's
    * vectors searchable-but-unfindable (recall loss only, no wrong
    * answers: candidates without vectors drop at the inner join), and a
    * blind RETRY would double-publish the side that committed
    * (duplicate vector rows corrupt rankings). After a failed append,
    * rebuild the index (or vacuum the orphan version) instead of
    * retrying — the [[IncrementalDedup]]-style sync-marker protocol is
    * the upgrade path if appends ever need to be retried blindly.
    * CONCURRENCY: the writer lock spans both publishes, so two appenders
    * (or an appender racing a rebuilder) exclude each other instead of
    * interleaving version allocations.
    */
  def appendLshIndex(delta: DataFrame, stateRoot: String): LshMeta =
    Versioned.withWriterLock(stateRoot, Versioned.UnattendedStaleLockMillis) {
      val spark = delta.sparkSession
      val meta = readLshMeta(spark, stateRoot)
      val base = delta.select(col("vec_id"), col("embedding"))
      val ddim = Similarity.vecDim(base, "embedding")
      require(ddim == meta.dim,
        s"delta dim $ddim != indexed dim ${meta.dim} — wrong index for this frame")
      val buckets = Similarity
        .lshBucketsDim(base, meta.tables, meta.planes, meta.seed, meta.dim).toDF()
      Versioned.publishDelta(base, vectorsRoot(stateRoot))
      Versioned.publishDelta(buckets, bucketsRoot(stateRoot),
        statsCols = Seq("table", "bucket"))
      meta
    }

  /** Append a delta to a published IVF index: assign the new vectors to
    * their best cell under the FROZEN centroids (the standard IVF add —
    * the coarse quantizer is never retrained on append; rebuild when
    * drift warrants) and publish as a cells delta. O(delta) work.
    * Same unique-`vec_id` contract as [[appendLshIndex]].
    */
  def appendIvfIndex(delta: DataFrame, stateRoot: String): Unit =
    Versioned.withWriterLock(stateRoot, Versioned.UnattendedStaleLockMillis) {
    val spark = delta.sparkSession
    import spark.implicits._
    val v = Versioned.currentVersion(ivfMetaRoot(stateRoot)).getOrElse(
      throw new IllegalStateException(s"no IVF index published under $stateRoot"))
    val (_, dim, centroids, _) = ivfModelCache.computeIfAbsent((stateRoot, v), { _ =>
      readIvfModel(spark, stateRoot)
    })
    val base = delta.select(col("vec_id"), col("embedding"))
    val ddim = Similarity.vecDim(base, "embedding")
    require(ddim == dim,
      s"delta dim $ddim != indexed dim $dim — wrong index for this frame")
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = base.as[(Long, Array[Float])].map { case (id, vec) =>
      val cs = bc.value
      var best = 0; var bestScore = Double.MinValue
      var c = 0
      while (c < cs.length) {
        val s = Similarity.cosineVs(vec, cs(c))
        if (s > bestScore) { bestScore = s; best = c }
        c += 1
      }
      (id, best, vec)
    }.toDF("vec_id", "cell", "embedding")
    Versioned.publishDelta(assigned, cellsRoot(stateRoot), statsCols = Seq("cell"))
  }

  def readLshMeta(spark: SparkSession, stateRoot: String): LshMeta = {
    val v = Versioned.currentVersion(metaRoot(stateRoot)).getOrElse(
      throw new IllegalStateException(s"no LSH index published under $stateRoot"))
    lshMetaCache.computeIfAbsent((stateRoot, v), { _ =>
      val df = Versioned.read(spark, metaRoot(stateRoot))
      val r = df.head()
      // source_tag is absent from pre-r7 published indexes — read as
      // untagged rather than failing the whole index
      val tag = if (df.schema.fieldNames.contains("source_tag"))
        Option(r.getAs[String]("source_tag")).getOrElse("") else ""
      LshMeta(r.getAs[Int]("tables"), r.getAs[Int]("planes"),
        r.getAs[Long]("seed"), r.getAs[Int]("dim"), r.getAs[Long]("n"), tag)
    })
  }

  /** Σ q(b)·i(b) over matching buckets/cells: the candidate-pair count
    * the probe join WOULD produce, computed from the two per-key count
    * frames before running it. Null-safe (no matching keys → 0 pairs).
    * Shared by the LSH and IVF guards so the refusal arithmetic cannot
    * diverge between them.
    */
  private def candidatePairEstimate(
      qc: DataFrame, ic: DataFrame, keys: Seq[String]): Double =
    qc.join(ic, keys)
      .agg(sum(col("qc").cast("double") * col("ic").cast("double")))
      .head().getAs[Any](0) match {
        case null => 0.0
        case d: java.lang.Double => d.doubleValue
      }

  /** Collect a published (cell, pos, v) long-form centroid table back to
    * the driver-side (nCells × dim) model, verifying the cell count
    * against meta. Shared by the IVF and IVF-PQ model readers — the
    * reshape must not diverge between them.
    */
  private def readCentroids(
      spark: SparkSession,
      tableRoot: String,
      expectedCells: Int): Array[Array[Double]] = {
    import spark.implicits._
    val cs: Array[Array[Double]] = Versioned
      .read(spark, tableRoot)
      .select(col("cell"), col("pos"), col("v"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
    require(cs.length == expectedCells,
      s"published centroid table has ${cs.length} cells, meta says $expectedCells")
    cs
  }

  private def readIvfModel(
      spark: SparkSession, stateRoot: String): (Int, Int, Array[Array[Double]], String) = {
    val metaDf = Versioned.read(spark, ivfMetaRoot(stateRoot))
    val metaRow = metaDf.head()
    val nc = metaRow.getAs[Int]("n_cells")
    val d = metaRow.getAs[Int]("dim")
    val tag = if (metaDf.schema.fieldNames.contains("source_tag"))
      Option(metaRow.getAs[String]("source_tag")).getOrElse("") else ""
    (nc, d, readCentroids(spark, centroidsRoot(stateRoot), nc), tag)
  }

  /** ANN top-k for `queries` (vec_id, embedding) against the PUBLISHED
    * LSH index — no training stage in this plan: the query side hashes
    * itself with the meta's (tables, planes, seed), equi-joins the
    * published bucket table, and exact-ranks against the published
    * vectors. Self-matches (same vec_id) are excluded, so querying the
    * indexed corpus with itself reproduces the inline
    * [[Similarity.lshTopK]] semantics.
    */
  def lshTopKIndexed(
      spark: SparkSession,
      queries: DataFrame,
      stateRoot: String,
      k: Int,
      maxCandidatePairs: Long = 200000000L,
      expectedSourceTag: Option[String] = None): DataFrame = {
    import spark.implicits._
    val meta = readLshMeta(spark, stateRoot)
    requireFreshTag("LSH", stateRoot, meta.sourceTag, expectedSourceTag)
    val qdim = Similarity.vecDim(queries, "embedding")
    require(qdim == meta.dim,
      s"query dim $qdim != indexed dim ${meta.dim} — wrong index for this frame")
    // reuse the probe's dim — lshBucketsDim skips a second one-row job
    //
    // r22: the bucket frame is NOT cached and the result NOT checkpointed
    // any more. The old shape (cache + count to fill it + eager
    // localCheckpoint of the result + unpersist) spent three extra jobs
    // per query materializing frames whose recompute is a cheap narrow
    // projection: the bucket hashing is re-evaluated at most twice
    // (worst-case-estimate path + probe join), and the returned top-k is
    // consumed exactly once by every caller (the catalog entries
    // materialize it via the orderedOnce seam). Guide §1.2 step 1 / §2.4:
    // fewer sequential actions, nothing recomputed that is expensive.
    val qBuckets = Similarity
      .lshBucketsDim(queries.select(col("vec_id"), col("embedding")),
        meta.tables, meta.planes, meta.seed, meta.dim)
      .toDF()
    locally {
      val idxBuckets = Versioned.read(spark, bucketsRoot(stateRoot))
      // The estimate job is skippable only when the fully-degenerate
      // worst case cannot exceed the budget. That worst case scales with
      // the QUERY frame, not the index alone (ADVICE r6): every index
      // vector in one bucket per table gives ≤ qRows·tables·liveN
      // candidates — the bucket pass emits exactly `tables` rows per
      // query row, so qRows·tables is computed from one cheap count of
      // the query frame (a parquet metadata count for table inputs)
      // instead of materializing the bucket projection. liveN comes from
      // the LIVE manifest's recorded row counts (no scan) so appended
      // deltas count immediately; when any live dir is missing its meta
      // we do NOT silently fall back to the stale build-time n — we run
      // the full Σ estimate (conservative, never skips).
      val liveNOpt = Versioned.publishedRows(vectorsRoot(stateRoot))
      if (liveNOpt.isEmpty)
        System.err.println(s"[graft.AnnIndex] $stateRoot: live version " +
          "dirs missing _GRAFT_META row counts; running the full " +
          "candidate estimate instead of the driver-side skip bound")
      val qbRows = queries.count().toDouble * meta.tables
      val worstCase = liveNOpt.map(n => qbRows * n.toDouble)
      if (maxCandidatePairs > 0 &&
        worstCase.forall(_ > maxCandidatePairs.toDouble)) {
        // same Σ q(b)·i(b) estimate as fuzzyJoin/lshTopK: refuse the probe
        // join when bucket skew (degenerate embeddings) would explode it
        val qc = qBuckets.groupBy(col("table"), col("bucket"))
          .agg(count(lit(1)).as("qc"))
        val ic = idxBuckets.groupBy(col("table"), col("bucket"))
          .agg(count(lit(1)).as("ic"))
        val est = candidatePairEstimate(qc, ic, Seq("table", "bucket"))
        require(est <= maxCandidatePairs.toDouble,
          f"lshTopKIndexed would probe ~$est%.3g candidate pairs " +
            f"(budget $maxCandidatePairs); rebuild with more planes or raise " +
            "maxCandidatePairs deliberately")
      }
      val candidates = qBuckets.as("x")
        .join(idxBuckets.as("y"),
          col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket")
            && col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"))
        .distinct()
      val vecs = Versioned.read(spark, vectorsRoot(stateRoot))
      // Compiled pair scoring (graft.functions.CosineSim): bit-identical
      // to the former typed `.map(Similarity.cosine)` without the
      // per-pair DeserializeToObject/SerializeFromObject array copies.
      val scored = candidates
        .join(queries.select(col("vec_id"), col("embedding").as("emb_a")), Seq("vec_id"))
        .join(vecs.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("emb_b")), Seq("neighbor_id"))
        .select(col("vec_id"), col("neighbor_id"),
          graft.functions.CosineSim.column(col("emb_a"), col("emb_b")).as("score"))
      import org.apache.spark.sql.expressions.Window
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("score").desc, col("neighbor_id"))))
        .where(col("rank") <= k)
        .select(col("vec_id"), col("rank"), col("neighbor_id"), col("score"))
    }
  }

  /** Build + publish the IVF index: deterministic centroids
    * ([[Similarity.ivfCentroids]] — hash-seeded, Lloyd-refined, no RNG)
    * plus every vector assigned to its best cell. Returns the meta.
    * `nCells = 0` derives the cell count from the corpus
    * ([[Similarity.autoCells]]) — the resolved count lands in the meta,
    * so queries never need to know how it was chosen.
    */
  def buildIvfIndex(
      embeddings: DataFrame,
      stateRoot: String,
      nCells: Int = 16,
      iters: Int = 2,
      sourceTag: String = ""): IvfMeta = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    Versioned.withWriterLock(stateRoot, Versioned.UnattendedStaleLockMillis) {
    val base = embeddings.select(col("vec_id"), col("embedding"))
    val n = base.count()
    val resolvedCells = if (nCells > 0) nCells else Similarity.autoCells(n)
    val dim = Similarity.vecDim(base, "embedding")
    val centroids = Similarity.ivfCentroids(base, resolvedCells, iters)
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = base.as[(Long, Array[Float])].map { case (id, v) =>
      val cs = bc.value
      var best = 0; var bestScore = Double.MinValue
      var c = 0
      while (c < cs.length) {
        val s = Similarity.cosineVs(v, cs(c))
        if (s > bestScore) { bestScore = s; best = c }
        c += 1
      }
      (id, best, v)
    }.toDF("vec_id", "cell", "embedding")
    Versioned.publish(assigned, cellsRoot(stateRoot), statsCols = Seq("cell"))
    val centroidRows = centroids.zipWithIndex.flatMap { case (cv, c) =>
      cv.zipWithIndex.map { case (v, pos) => (c, pos, v) }
    }.toSeq
    Versioned.publish(centroidRows.toDF("cell", "pos", "v"),
      centroidsRoot(stateRoot))
    val meta = IvfMeta(resolvedCells, iters, dim, n, sourceTag)
    Versioned.publish(
      Seq((meta.nCells, meta.iters, meta.dim, meta.n, meta.sourceTag))
        .toDF("n_cells", "iters", "dim", "n", "source_tag"),
      ivfMetaRoot(stateRoot))
    meta
    }
  }

  /** Candidate-budget guard for the IVF family — the sibling of
    * [[lshTopKIndexed]]'s Σ q(b)·i(b) estimate: cells are DISJOINT, so
    * the degenerate worst case (every index vector in one cell that
    * every query probes) is qRows·liveN candidate pairs. The cheap
    * driver skip-bound clears small cases without a job; over the
    * bound, the real Σ probes(c)·members(c) estimate runs (one narrow
    * aggregate over the published cell column + a qRows×nCells
    * centroid pass) and REFUSES a blown budget instead of letting a
    * collapsed quantizer (all-identical embeddings) go quadratic
    * silently.
    */
  private def ivfCandidateGuard(
      spark: SparkSession,
      queries: DataFrame,
      centroids: Array[Array[Double]],
      nprobe: Int,
      cellsTableRoot: String,
      maxCandidatePairs: Long): Unit = {
    import spark.implicits._
    if (maxCandidatePairs <= 0) return
    val liveNOpt = Versioned.publishedRows(cellsTableRoot)
    if (liveNOpt.isEmpty)
      System.err.println(s"[graft.AnnIndex] $cellsTableRoot: live version " +
        "dirs missing _GRAFT_META row counts; running the full candidate " +
        "estimate instead of the driver-side skip bound")
    val qRows = queries.select(col("vec_id")).count().toDouble
    val worstCase = liveNOpt.map(n => qRows * n.toDouble)
    if (worstCase.exists(_ <= maxCandidatePairs.toDouble)) return
    val bc = spark.sparkContext.broadcast(centroids)
    val qc = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (_, v) =>
        val cs = bc.value
        cs.indices.map(c => (c, Similarity.cosineVs(v, cs(c))))
          .sortBy { case (c, s) => (-s, c) }.take(nprobe).map(_._1)
      }
      .toDF("cell").groupBy(col("cell")).agg(count(lit(1)).as("qc"))
    val ic = Versioned.read(spark, cellsTableRoot)
      .select(col("cell")).groupBy(col("cell")).agg(count(lit(1)).as("ic"))
    val est = candidatePairEstimate(qc, ic, Seq("cell"))
    require(est <= maxCandidatePairs.toDouble,
      f"IVF probe would score ~$est%.3g candidate pairs (budget " +
        f"$maxCandidatePairs); the coarse quantizer is collapsed " +
        "(degenerate embeddings?) — rebuild with more/better cells or " +
        "raise maxCandidatePairs deliberately")
  }

  /** ANN top-k against the PUBLISHED IVF index: the (nCells × dim)
    * centroid model is read back to the driver (small by contract),
    * queries probe their `nprobe` best cells, and only those cells'
    * published members are re-ranked — partition-pruned search with no
    * Lloyd iteration anywhere in the plan.
    */
  def ivfTopKIndexed(
      spark: SparkSession,
      queries: DataFrame,
      stateRoot: String,
      k: Int,
      nprobe: Int = 4,
      expectedSourceTag: Option[String] = None,
      maxCandidatePairs: Long = 200000000L): DataFrame = {
    import spark.implicits._
    val v = Versioned.currentVersion(ivfMetaRoot(stateRoot)).getOrElse(
      throw new IllegalStateException(s"no IVF index published under $stateRoot"))
    val (nCells, dim, centroids, srcTag) =
      ivfModelCache.computeIfAbsent((stateRoot, v), { _ =>
        readIvfModel(spark, stateRoot)
      })
    requireFreshTag("IVF", stateRoot, srcTag, expectedSourceTag)
    require(nCells >= 1, s"published IVF index has no cells")
    val qdim = Similarity.vecDim(queries, "embedding")
    require(qdim == dim,
      s"query dim $qdim != indexed dim $dim — wrong index for this frame")
    ivfCandidateGuard(spark, queries, centroids, nprobe,
      cellsRoot(stateRoot), maxCandidatePairs)
    val bc = spark.sparkContext.broadcast(centroids)
    val probes = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val cs = bc.value
        cs.indices
          .map(c => (c, Similarity.cosineVs(v, cs(c))))
          .sortBy { case (c, s) => (-s, c) }
          .take(nprobe)
          .iterator
          .map { case (c, _) => (id, v, c) }
      }.toDF("vec_id", "emb_a", "cell")
    val cells = Versioned.read(spark, cellsRoot(stateRoot))
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("embedding").as("emb_b"))
    import org.apache.spark.sql.expressions.Window
    probes
      .join(cells, Seq("cell"))
      .where(col("vec_id") =!= col("neighbor_id"))
      // compiled pair scoring — see lshTopKIndexed's note
      .select(col("vec_id"), col("neighbor_id"),
        graft.functions.CosineSim.column(col("emb_a"), col("emb_b")).as("score"))
      // r22: no distinct — published cells are disjoint (one row per
      // vec_id, AnnIndexSpec pins the layout) and probes are distinct
      // (vec_id, cell) rows, so each pair meets at most once; see
      // Similarity.ivfTopK's note (guide §2.4)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  // ───────────────────────── IVF-PQ ─────────────────────────
  // The production FAISS composition (IVFPQ), persisted: PQ codebook
  // training — the expensive thing at 100 TB — amortizes across every
  // query exactly like LSH buckets and IVF centroids now do.

  private val ivfPqModelCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Int), (IvfPqMeta, Array[Array[Double]], Pq.PqModel)]()

  /** True once a complete IVF-PQ index is published under `stateRoot`. */
  def ivfPqExists(stateRoot: String): Boolean =
    Versioned.exists(pqMetaRoot(stateRoot))

  /** Build + publish the IVF-PQ index: deterministic IVF centroids, PQ
    * codebooks ([[Pq.train]] — hash-seeded, Lloyd-refined, no RNG), and
    * every vector stored as (cell, m codes) plus its full embedding for
    * the exact re-rank stage. Meta publishes LAST (crash-invisible).
    *
    * Published layout: `pq_cells` (vec_id, codes, cell; stats on cell —
    * the m-bytes-per-vector search table), `pq_vectors` (vec_id,
    * embedding — re-rank source), `pq_centroids` (cell, pos, v),
    * `pq_books` (s, c, pos, v — m×k×subDim doubles), `pq_meta` (1 row).
    * `nCells = 0` derives the cell count from the corpus
    * ([[Similarity.autoCells]]); the resolved count lands in the meta.
    */
  def buildIvfPqIndex(
      embeddings: DataFrame,
      stateRoot: String,
      nCells: Int = 16,
      iters: Int = 2,
      m: Int = 16,
      k: Int = 16,
      sourceTag: String = ""): IvfPqMeta = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    Versioned.withWriterLock(stateRoot, Versioned.UnattendedStaleLockMillis) {
      val base = embeddings.select(col("vec_id"), col("embedding"))
      val n = base.count()
      val resolvedCells = if (nCells > 0) nCells else Similarity.autoCells(n)
      val dim = Similarity.vecDim(base, "embedding")
      val centroids = Similarity.ivfCentroids(base, resolvedCells, iters)
      val model = Pq.train(base, m, k, iters)
      val assigned = Pq.encodeAssigned(base, centroids, model).toDF()
      Versioned.publish(assigned, pqCellsRoot(stateRoot), statsCols = Seq("cell"))
      Versioned.publish(base, pqVectorsRoot(stateRoot))
      Versioned.publish(
        centroids.zipWithIndex.flatMap { case (cv, c) =>
          cv.zipWithIndex.map { case (v, pos) => (c, pos, v) }
        }.toSeq.toDF("cell", "pos", "v"),
        pqCentroidsRoot(stateRoot))
      Versioned.publish(
        model.codebooks.zipWithIndex.flatMap { case (book, s) =>
          book.zipWithIndex.flatMap { case (cent, c) =>
            cent.zipWithIndex.map { case (v, pos) => (s, c, pos, v) }
          }
        }.toSeq.toDF("s", "c", "pos", "v"),
        pqBooksRoot(stateRoot))
      val meta = IvfPqMeta(resolvedCells, iters, m, k, dim, n, sourceTag)
      Versioned.publish(
        Seq((meta.nCells, meta.iters, meta.m, meta.k, meta.dim, meta.n,
          meta.sourceTag))
          .toDF("n_cells", "iters", "m", "k", "dim", "n", "source_tag"),
        pqMetaRoot(stateRoot))
      meta
    }
  }

  /** Append a delta under the FROZEN centroids + codebooks (the FAISS
    * `add`: neither quantizer retrains on append — rebuild when drift
    * warrants). Publishes cells + vectors as Versioned deltas; O(delta)
    * work. Same unique-`vec_id` contract and crash semantics as
    * [[appendLshIndex]].
    */
  def appendIvfPqIndex(delta: DataFrame, stateRoot: String): Unit =
    Versioned.withWriterLock(stateRoot, Versioned.UnattendedStaleLockMillis) {
      val spark = delta.sparkSession
      val (meta, centroids, model) = readIvfPqModel(spark, stateRoot)
      val base = delta.select(col("vec_id"), col("embedding"))
      val ddim = Similarity.vecDim(base, "embedding")
      require(ddim == meta.dim,
        s"delta dim $ddim != indexed dim ${meta.dim} — wrong index for this frame")
      val assigned = Pq.encodeAssigned(base, centroids, model).toDF()
      Versioned.publishDelta(assigned, pqCellsRoot(stateRoot),
        statsCols = Seq("cell"))
      Versioned.publishDelta(base, pqVectorsRoot(stateRoot))
    }

  private def readIvfPqModel(
      spark: SparkSession,
      stateRoot: String): (IvfPqMeta, Array[Array[Double]], Pq.PqModel) = {
    import spark.implicits._
    val v = Versioned.currentVersion(pqMetaRoot(stateRoot)).getOrElse(
      throw new IllegalStateException(s"no IVF-PQ index published under $stateRoot"))
    ivfPqModelCache.computeIfAbsent((stateRoot, v), { _ =>
      val metaDf = Versioned.read(spark, pqMetaRoot(stateRoot))
      val r = metaDf.head()
      val tag = if (metaDf.schema.fieldNames.contains("source_tag"))
        Option(r.getAs[String]("source_tag")).getOrElse("") else ""
      val meta = IvfPqMeta(r.getAs[Int]("n_cells"), r.getAs[Int]("iters"),
        r.getAs[Int]("m"), r.getAs[Int]("k"), r.getAs[Int]("dim"),
        r.getAs[Long]("n"), tag)
      val centroids: Array[Array[Double]] =
        readCentroids(spark, pqCentroidsRoot(stateRoot), meta.nCells)
      val books: Array[Array[Array[Double]]] = Versioned
        .read(spark, pqBooksRoot(stateRoot))
        .select(col("s"), col("c"), col("pos"), col("v"))
        .as[(Int, Int, Int, Double)].collect()
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.groupBy(_._2).toSeq.sortBy(_._1)
          .map(_._2.sortBy(_._3).map(_._4).toArray).toArray)
        .toArray
      require(books.length == meta.m && books.forall(_.length == meta.k),
        s"published codebook table shape mismatch: got ${books.length} " +
          s"subspaces, meta says m=${meta.m} k=${meta.k}")
      (meta, centroids, Pq.PqModel(meta.m, meta.k, meta.dim, books))
    })
  }

  /** ANN top-k against the PUBLISHED IVF-PQ index: queries probe their
    * `nprobe` best cells, probed members are ADC-scored from the
    * published codes (m lookups each, no vectors), and the global ADC
    * top `rerank` re-ranks exactly against the published vectors — no
    * Lloyd iteration, no codebook training, anywhere in the query plan.
    * Search core is shared verbatim with the inline [[Pq.ivfAdcTopK]],
    * so indexed ≡ inline holds by construction (spec-pinned).
    */
  def ivfPqTopKIndexed(
      spark: SparkSession,
      queries: DataFrame,
      stateRoot: String,
      k: Int,
      nprobe: Int = 4,
      rerank: Int = 50,
      expectedSourceTag: Option[String] = None,
      maxCandidatePairs: Long = 200000000L): DataFrame = {
    import spark.implicits._
    val (meta, centroids, model) = readIvfPqModel(spark, stateRoot)
    requireFreshTag("IVF-PQ", stateRoot, meta.sourceTag, expectedSourceTag)
    val qdim = Similarity.vecDim(queries, "embedding")
    require(qdim == meta.dim,
      s"query dim $qdim != indexed dim ${meta.dim} — wrong index for this frame")
    ivfCandidateGuard(spark, queries, centroids, nprobe,
      pqCellsRoot(stateRoot), maxCandidatePairs)
    val assigned = Versioned.read(spark, pqCellsRoot(stateRoot))
      .select(col("vec_id"), col("codes"), col("cell"))
      .as[PqCoded]
    val candidates =
      Pq.ivfAdcCandidates(queries, assigned, centroids, model, nprobe, rerank)
    Pq.rerankExact(candidates, queries,
      Versioned.read(spark, pqVectorsRoot(stateRoot)), k)
  }
}
