package graft

import java.nio.file.Files

import graft.ext.{AnnIndex, Similarity}
import graft.lake.Versioned

/** Persisted ANN index (round-6 verdict item 4): build-once/query-many
  * over Versioned state — the embeddings analogue of IncrementalDedup's
  * band index.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-ann-spec-$tag").toString + "/state"

  test("LSH: indexed query ≡ inline lshTopK with the same resolution") {
    val root = freshRoot("lsh-eq")
    val meta = AnnIndex.buildLshIndex(embs, root, tables = 8, planesPerTable = 4)
    assert(meta.planes == 4 && AnnIndex.lshExists(root))
    val indexed = AnnIndex.lshTopKIndexed(spark, embs, root, k = 3)
      .select($"vec_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val inline = Similarity.lshTopK(embs, k = 3, tables = 8, planesPerTable = 4)
      .select($"vec_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(indexed === inline,
      "querying the persisted index must reproduce the inline operator bit-for-bit")
  }

  test("LSH: querying does NOT rebuild (no training stage, state untouched)") {
    val root = freshRoot("lsh-ro")
    AnnIndex.buildLshIndex(embs, root, tables = 4, planesPerTable = 4)
    val versionsBefore = Seq("vectors", "buckets", "meta")
      .map(t => Versioned.manifest(s"$root/$t"))
    assert(AnnIndex.lshTopKIndexed(spark, embs, root, k = 1).count() > 0)
    val versionsAfter = Seq("vectors", "buckets", "meta")
      .map(t => Versioned.manifest(s"$root/$t"))
    assert(versionsAfter === versionsBefore,
      "a query must not publish anything — build-once/query-many")
  }

  test("LSH: recall@1 vs the exact twin is high on real embeddings") {
    val root = freshRoot("lsh-recall")
    AnnIndex.buildLshIndex(embs, root, tables = 16, planesPerTable = 4)
    val exact = Similarity.bruteForceTopK(embs, k = 1).collect()
      .map(n => n.vec_id -> n.neighbor_id).toMap
    val approx = AnnIndex.lshTopKIndexed(spark, embs, root, k = 1)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val recall = exact.count { case (q, n) => approx.get(q).contains(n) }
      .toDouble / exact.size
    assert(recall > 0.7, s"persisted-index nearest-neighbor recall $recall too low")
  }

  test("IVF recall at the nprobe knee is high on a CLUSTERED corpus") {
    // VERDICT r8 #2: the driver's near-uniform embeddings make IVF recall
    // ≈ the probed fraction by construction (x43's documented corpus
    // property — 0.695 at nprobe=6/16 on sf0.1). On a corpus with the
    // structure IVF exploits (32 Gaussians, ProfileIvfRecall measures
    // 0.987 ivf / 0.971 ivfpq at the same knee), recall must be ≥ 0.9 —
    // pinned here on a 500-vector fixture so a regression in assignment,
    // probing, or re-ranking can't hide behind the degenerate corpus.
    val fix = ClusteredEmbeddings.fixture(spark, n = 500, d = 64, k = 32)
    val root = freshRoot("ivf-clustered")
    AnnIndex.buildIvfIndex(fix, root, nCells = 16, iters = 2)
    val exact = Similarity.bruteForceTopK(fix, k = 5).toDF()
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = AnnIndex.ivfTopKIndexed(spark, fix, root, k = 5, nprobe = 6)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered-corpus IVF recall@5 $recall < 0.9 at nprobe=6/16")
  }

  test("IVF: nCells = 0 derives the cell count from the corpus (autoCells)") {
    // sqrt-scaled, capped at n/39 so cells keep trainable membership
    assert(Similarity.autoCells(0L) === 1)
    assert(Similarity.autoCells(100L) === 2) // n/39 cap binds
    assert(Similarity.autoCells(500L) === 12)
    assert(Similarity.autoCells(2000L) === 45) // sqrt binds
    assert(Similarity.autoCells(1000000000L) === 31623)
    val root = freshRoot("ivf-auto")
    val meta = AnnIndex.buildIvfIndex(embs, root, nCells = 0)
    val n = embs.count()
    assert(meta.nCells === Similarity.autoCells(n),
      "resolved auto cell count must land in the published meta")
    // and the auto-built index serves queries like any explicit one
    assert(AnnIndex.ivfTopKIndexed(spark, embs, root, k = 1).count() === n)
  }

  test("IVF: indexed query ≡ inline ivfTopK; query does not republish") {
    val root = freshRoot("ivf-eq")
    AnnIndex.buildIvfIndex(embs, root, nCells = 8, iters = 2)
    val before = Seq("cells", "centroids", "ivf_meta")
      .map(t => Versioned.manifest(s"$root/$t"))
    val indexed = AnnIndex.ivfTopKIndexed(spark, embs, root, k = 3, nprobe = 4)
      .select($"vec_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val inline = Similarity.ivfTopK(embs, k = 3, nCells = 8, nprobe = 4, iters = 2)
      .select($"vec_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(indexed === inline,
      "IVF persisted-index query must reproduce the inline operator bit-for-bit")
    assert(Seq("cells", "centroids", "ivf_meta")
      .map(t => Versioned.manifest(s"$root/$t")) === before)
  }

  test("LSH append: build(half) + append(half) ≡ build(all) queries") {
    import org.apache.spark.sql.functions.col
    val all = embs
    val half1 = all.where(col("vec_id") % 2 === 0)
    val half2 = all.where(col("vec_id") % 2 === 1)
    // explicit planes: the auto-resolver would size from the build half
    val rootInc = freshRoot("lsh-app-inc")
    AnnIndex.buildLshIndex(half1, rootInc, tables = 8, planesPerTable = 3)
    AnnIndex.appendLshIndex(half2, rootInc)
    val rootFull = freshRoot("lsh-app-full")
    AnnIndex.buildLshIndex(all, rootFull, tables = 8, planesPerTable = 3)
    val viaInc = AnnIndex.lshTopKIndexed(spark, all, rootInc, k = 3)
      .select($"vec_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val viaFull = AnnIndex.lshTopKIndexed(spark, all, rootFull, k = 3)
      .select($"vec_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(viaInc === viaFull,
      "incremental append must reproduce the full build's search results " +
        "(same frozen projection, manifest union of deltas)")
    // the vectors/buckets tables are LOG tables now: two live versions
    assert(Versioned.manifest(s"$rootInc/vectors").size === 2)
    assert(Versioned.manifest(s"$rootInc/buckets").size === 2)
  }

  test("IVF append: frozen-centroid assignment ≡ full-frame assignment") {
    import org.apache.spark.sql.functions.col
    val all = embs
    val half1 = all.where(col("vec_id") % 2 === 0)
    val half2 = all.where(col("vec_id") % 2 === 1)
    val rootInc = freshRoot("ivf-app")
    // centroids train on half1 ONLY (the frozen coarse quantizer), so the
    // comparison twin must use the same centroids: build on half1, then
    // compare appended-index search against querying with cells assigned
    // from the same frozen model — i.e. an append followed by a query must
    // include half2 members in the posting lists.
    AnnIndex.buildIvfIndex(half1, rootInc, nCells = 4, iters = 1)
    AnnIndex.appendIvfIndex(half2, rootInc)
    val out = AnnIndex.ivfTopKIndexed(spark, all, rootInc, k = 1, nprobe = 4)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    // nprobe = nCells probes EVERY cell, so search is exhaustive over the
    // indexed vectors: every neighbor that is odd proves appended rows
    // are live in the posting lists
    assert(out.nonEmpty && out.values.exists(_ % 2 == 1),
      "appended (odd-id) vectors must be searchable")
    // appending never republishes centroids or meta
    assert(Versioned.manifest(s"$rootInc/centroids").size === 1)
    assert(Versioned.manifest(s"$rootInc/cells").size === 2)
  }

  test("IVF-PQ: indexed query ≡ inline ivfAdcTopK; query does not republish") {
    val root = freshRoot("ivfpq-eq")
    AnnIndex.buildIvfPqIndex(embs, root, nCells = 8, iters = 2, m = 16, k = 16)
    val tables = Seq("pq_cells", "pq_vectors", "pq_centroids", "pq_books", "pq_meta")
    val before = tables.map(t => Versioned.manifest(s"$root/$t"))
    val indexed = AnnIndex.ivfPqTopKIndexed(spark, embs, root, k = 3,
      nprobe = 4, rerank = 50)
      .select($"vec_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val inline = graft.ext.Pq.ivfAdcTopK(embs, topK = 3, nCells = 8,
      nprobe = 4, m = 16, k = 16, rerank = 50, iters = 2)
      .select($"vec_id", $"rank", $"neighbor_id", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(indexed === inline,
      "IVF-PQ persisted-index query must reproduce the inline composition bit-for-bit")
    assert(tables.map(t => Versioned.manifest(s"$root/$t")) === before,
      "a query must not publish anything — build-once/query-many")
  }

  test("IVF-PQ append: frozen-quantizer encode, appended rows searchable") {
    import org.apache.spark.sql.functions.col
    val all = embs
    val half1 = all.where(col("vec_id") % 2 === 0)
    val half2 = all.where(col("vec_id") % 2 === 1)
    val root = freshRoot("ivfpq-app")
    AnnIndex.buildIvfPqIndex(half1, root, nCells = 4, iters = 1, m = 16, k = 8)
    AnnIndex.appendIvfPqIndex(half2, root)
    // nprobe = nCells probes every cell: search is exhaustive over the
    // indexed vectors, so odd-id neighbors prove appended rows are live
    val out = AnnIndex.ivfPqTopKIndexed(spark, all, root, k = 1,
      nprobe = 4, rerank = 50)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    assert(out.nonEmpty && out.values.exists(_ % 2 == 1),
      "appended (odd-id) vectors must be searchable")
    // appending never republishes the quantizers or meta; data tables log
    assert(Versioned.manifest(s"$root/pq_centroids").size === 1)
    assert(Versioned.manifest(s"$root/pq_books").size === 1)
    assert(Versioned.manifest(s"$root/pq_cells").size === 2)
    assert(Versioned.manifest(s"$root/pq_vectors").size === 2)
  }

  test("IVF family refuses a collapsed quantizer instead of going quadratic") {
    // all-identical embeddings collapse every vector into one cell: a
    // probe join would be qRows x liveN (brute force via the back door).
    // The candidate guard's estimate must refuse under a small budget —
    // the ivf sibling of lshTopK's degenerate-refusal contract.
    val degenerate = (1L to 60L).map(i => (i, Array.fill(8)(0.25f)))
      .toDF("vec_id", "embedding")
    val root = freshRoot("ivf-degen")
    AnnIndex.buildIvfIndex(degenerate, root, nCells = 4, iters = 1)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.ivfTopKIndexed(spark, degenerate, root, k = 1,
        maxCandidatePairs = 100L)
    }
    assert(e.getMessage.contains("candidate pairs"))
    val rootPq = freshRoot("ivfpq-degen")
    AnnIndex.buildIvfPqIndex(degenerate, rootPq, nCells = 4, iters = 1,
      m = 4, k = 4)
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.ivfPqTopKIndexed(spark, degenerate, rootPq, k = 1,
        maxCandidatePairs = 100L)
    }
    assert(e2.getMessage.contains("candidate pairs"))
    // healthy defaults still work on the same index
    assert(AnnIndex.ivfTopKIndexed(spark, degenerate, root, k = 1).count() > 0)
  }

  test("IVF-PQ stale source tag refuses at query time") {
    val root = freshRoot("ivfpq-stale")
    AnnIndex.buildIvfPqIndex(embs, root, nCells = 2, iters = 1, m = 8, k = 4,
      sourceTag = "fixture-v1")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.ivfPqTopKIndexed(spark, embs, root, k = 1,
        expectedSourceTag = Some("fixture-v2"))
    }
    assert(e.getMessage.contains("STALE"))
  }

  test("stale source tag: query refuses instead of serving old neighbors") {
    val root = freshRoot("stale")
    AnnIndex.buildLshIndex(embs, root, tables = 2, planesPerTable = 2,
      sourceTag = "fixture-v1")
    // matching expectation queries fine
    assert(AnnIndex.lshTopKIndexed(spark, embs, root, k = 1,
      expectedSourceTag = Some("fixture-v1")).count() > 0)
    // the source regenerates (new fingerprint) but the index does not:
    // the query must FAIL LOUDLY, not silently serve the stale index
    val e = intercept[IllegalArgumentException] {
      AnnIndex.lshTopKIndexed(spark, embs, root, k = 1,
        expectedSourceTag = Some("fixture-v2"))
    }
    assert(e.getMessage.contains("STALE"))
    // IVF path has the same contract
    val rootIvf = freshRoot("stale-ivf")
    AnnIndex.buildIvfIndex(embs, rootIvf, nCells = 2, iters = 1,
      sourceTag = "fixture-v1")
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.ivfTopKIndexed(spark, embs, rootIvf, k = 1,
        expectedSourceTag = Some("fixture-v2"))
    }
    assert(e2.getMessage.contains("STALE"))
    // untagged expectation (None) keeps working — opt-in contract
    assert(AnnIndex.ivfTopKIndexed(spark, embs, rootIvf, k = 1).count() > 0)
  }

  test("build/append hold the writer lock (concurrent builder excluded)") {
    val root = freshRoot("lock")
    // simulate a concurrent holder: build/append must fail fast, not
    // interleave version allocations
    Versioned.withWriterLock(root) {
      val e = intercept[IllegalStateException] {
        AnnIndex.buildLshIndex(embs, root, tables = 2, planesPerTable = 2)
      }
      assert(e.getMessage.contains("another writer"))
    }
    // lock released: build now succeeds, append takes it transparently
    AnnIndex.buildLshIndex(embs, root, tables = 2, planesPerTable = 2)
    AnnIndex.appendLshIndex( // fresh-id delta: exercises the locked path
      embs.limit(1).select((org.apache.spark.sql.functions.col("vec_id")
        + 1000000L).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding")), root)
    assert(AnnIndex.lshTopKIndexed(spark, embs, root, k = 1).count() > 0)
  }

  test("dimension mismatch between query frame and index fails fast") {
    val root = freshRoot("dim")
    AnnIndex.buildLshIndex(embs, root, tables = 2, planesPerTable = 2)
    val wrongDim = Seq((1L, Array.fill(3)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.lshTopKIndexed(spark, wrongDim, root, k = 1)
    }
    assert(e.getMessage.contains("dim"))
  }

  test("vecDim guards: empty frame and null vector raise clear errors") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.randomProjection(empty, "vec_id", "embedding", outDims = 4)
    }
    assert(e1.getMessage.contains("empty"))
    val nullVec = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.randomProjection(nullVec, "vec_id", "embedding", outDims = 4)
    }
    assert(e2.getMessage.contains("null or empty"))
  }

  test("semDedup: bits = 0 derives the SRP resolution from the corpus (autoBits)") {
    // E[bucket size] ≈ 64 — the within-bucket pair join stays ~linear in n
    assert(Similarity.autoBits(0L) === 1)
    assert(Similarity.autoBits(64L) === 1)
    assert(Similarity.autoBits(2000L) === 5)
    assert(Similarity.autoBits(200000L) === 12)
    assert(Similarity.autoBits(1000000000L) === 24)
    assert(Similarity.autoBits(Long.MaxValue) === 32) // clamp
    val vecs = (0L until 300L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 7 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val auto = Similarity.semDedup(vecs, "vec_id", "embedding", bits = 0)
      .select($"vec_id", $"bucket", $"witness", $"removed")
      .collect().toSet
    val pinned = Similarity.semDedup(vecs, "vec_id", "embedding",
        bits = Similarity.autoBits(300L))
      .select($"vec_id", $"bucket", $"witness", $"removed")
      .collect().toSet
    assert(auto === pinned)
  }

  test("semDedup refuses dim > 128 (long-arithmetic overflow bound)") {
    val wide = Seq((1L, Array.fill(200)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Similarity.semDedup(wide, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("128"))
  }

  test("vacuumStaleAnnRoots reclaims idle old generations, keeps live/fresh/other") {
    import java.nio.file.{Files, Paths}
    import graft.queries.ExtQueries.{md5Key, vacuumStaleAnnRoots}
    val tmp = Paths.get(sys.props("java.io.tmpdir"))
    val dir = s"/vacuum-spec-fixture-${System.nanoTime()}"
    val dk = md5Key(dir, 6)
    val live = tmp.resolve(s"graft-ann-v2-$dk-${md5Key("tagB", 6)}")
    val stale = tmp.resolve(s"graft-ann-v2-$dk-${md5Key("tagA", 6)}")
    val other = tmp.resolve(s"graft-ann-v2-${md5Key("/other-dir", 6)}-ffffffffffff")
    // pre-r7 single-key layout: 12 hex chars, no tag segment — keyed to
    // NO current source, reclaimable regardless of dir
    val legacy = tmp.resolve("graft-ann-v2-0123456789ab")
    Seq(live, stale, other, legacy).foreach { r =>
      Files.createDirectories(r.resolve("lsh/vectors"))
      Files.write(r.resolve("lsh/vectors/part-0.parquet"), Array[Byte](1))
    }
    try {
      // files are brand new: the grace window protects a possible
      // in-flight straggler, so nothing is reclaimed yet
      vacuumStaleAnnRoots(dir, "tagB")
      assert(Files.exists(stale) && Files.exists(legacy))
      // age every entry past the grace window: the generations are idle
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60L * 60L * 1000L)
      Seq(stale, legacy).foreach { r =>
        val w = Files.walk(r)
        try w.forEach(p => { Files.setLastModifiedTime(p, old); () })
        finally w.close()
      }
      vacuumStaleAnnRoots(dir, "tagB")
      assert(!Files.exists(stale))
      assert(!Files.exists(legacy))
      // ...while the live generation and OTHER sources' roots survive
      assert(Files.exists(live.resolve("lsh/vectors/part-0.parquet")))
      assert(Files.exists(other.resolve("lsh/vectors/part-0.parquet")))
    } finally Seq(live, stale, other, legacy).foreach { r =>
      if (Files.exists(r)) {
        val w = Files.walk(r)
        try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally w.close()
      }
    }
  }
}
