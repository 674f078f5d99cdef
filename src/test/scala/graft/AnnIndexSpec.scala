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

  test("semDedup refuses dim > 128 (long-arithmetic overflow bound)") {
    val wide = Seq((1L, Array.fill(200)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Similarity.semDedup(wide, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("128"))
  }
}
