package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, IncrementalDedup}

/** Incremental delivery-by-delivery dedup against persisted state:
  * cross-delivery duplicate catch, within-delivery collapse, idempotent
  * re-delivery, and agreement with the batch operators' pair oracle.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-incdedup").toString + "/state"

  test("two-delivery ingest: survivors are pairwise non-dup and complete") {
    val root = freshRoot()
    // odd/even split puts planted near-dup pairs across deliveries
    val d1 = docs.where($"doc_id" % 2 === 0)
    val d2 = docs.where($"doc_id" % 2 === 1)
    val s1 = IncrementalDedup.ingest(d1, "doc_id", "text", root)
    val s2 = IncrementalDedup.ingest(d2, "doc_id", "text", root)
    assert(s1.delivered === d1.count() && s2.delivered === d2.count())
    assert(s1.accepted + s2.accepted ===
      IncrementalDedup.survivors(spark, root, "doc_id", "text").count())

    val surv = IncrementalDedup.survivors(spark, root, "doc_id", "text")
    val survIds = surv.select($"doc_id").as[Long].collect().toSet
    val allIds = docs.select($"doc_id").as[Long].collect().toSet
    assert(survIds.subsetOf(allIds) && survIds.size === surv.count().toInt)

    // no near-dup pair survives (exact checker over the survivor texts;
    // on this corpus LSH has verified full recall vs exact Jaccard)
    val remaining = Dedup.jaccardPairs(surv, "doc_id", "text", 3, 0.3).count()
    assert(remaining === 0L, s"$remaining near-dup pairs among survivors")

    // completeness: every dropped doc has a surviving partner it
    // exact- or near-dups with (nothing was dropped without cause)
    val dropped = allIds -- survIds
    val batchPairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val hashes = docs
      .select($"doc_id", graft.ext.TextAnalysis.fingerprintMd5($"text").as("h"))
      .as[(Long, String)].collect()
    val byHash = hashes.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val hashOf = hashes.toMap
    def partners(id: Long): Set[Long] =
      batchPairs.collect {
        case (a, b) if a == id => b
        case (a, b) if b == id => a
      }.toSet ++ (byHash(hashOf(id)) - id)
    assert(dropped.forall(id => partners(id).exists(survIds)),
      "a document was dropped without a surviving duplicate partner")
  }

  test("crash between survivors and bands publishes is reconciled at next ingest") {
    val root = freshRoot()
    IncrementalDedup.ingest(
      Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", "text", root)
    // simulate a writer that died between the survivors publish and the
    // bands publish: a document lands in survivors with NO band rows and
    // the sync marker left stale
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val orphan = Seq((100L, base)).toDF("doc_id", "text")
      .select($"doc_id", $"text",
        graft.ext.TextAnalysis.fingerprintMd5($"text").as("content_hash"))
    graft.lake.Versioned.publishDelta(orphan, root + "/survivors")
    // a near-dup of the unindexed document arrives in the next delivery:
    // without reconciliation it would be accepted forever after
    val near = base.replace("tok40", "tokX")
    val s2 = IncrementalDedup.ingest(
      Seq((200L, near)).toDF("doc_id", "text"), "doc_id", "text", root)
    assert(s2.accepted === 0L && s2.dupsVsCorpus === 1L,
      "reconciliation must index the orphaned survivor before judging the delivery")
    // and the orphan's band rows exist now — the index is whole again
    val bands = graft.lake.Versioned.read(spark, root + "/bands")
    assert(bands.where($"doc_id" === 100L).count() === 16L)
  }

  test("compactState reconciles a crashed publish before re-stamping the sync marker") {
    val root = freshRoot()
    IncrementalDedup.ingest(
      Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", "text", root)
    // crash window: survivors published, bands not, marker stale
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val orphan = Seq((100L, base)).toDF("doc_id", "text")
      .select($"doc_id", $"text",
        graft.ext.TextAnalysis.fingerprintMd5($"text").as("content_hash"))
    graft.lake.Versioned.publishDelta(orphan, root + "/survivors")
    // maintenance BEFORE any ingest must backfill (not just stamp over
    // the crash) — the orphan gets its band rows here
    IncrementalDedup.compactState(spark, root)
    val bands = graft.lake.Versioned.read(spark, root + "/bands")
    assert(bands.where($"doc_id" === 100L).count() === 16L,
      "compactState must backfill the orphaned survivor before stamping")
    // and the near-dup is rejected at the next ingest as usual
    val s2 = IncrementalDedup.ingest(
      Seq((200L, base.replace("tok40", "tokX"))).toDF("doc_id", "text"),
      "doc_id", "text", root)
    assert(s2.accepted === 0L && s2.dupsVsCorpus === 1L)
  }

  test("re-delivering already-ingested data is a no-op (corpus-first-wins)") {
    val root = freshRoot()
    val first = IncrementalDedup.ingest(docs, "doc_id", "text", root)
    assert(first.accepted > 0)
    val again = IncrementalDedup.ingest(docs, "doc_id", "text", root)
    assert(again.accepted === 0L,
      s"re-delivery accepted ${again.accepted} documents")
    assert(again.dupsWithinDelivery === first.dupsWithinDelivery)
    assert(again.dupsVsCorpus === first.delivered - first.dupsWithinDelivery)
    assert(IncrementalDedup.survivors(spark, root, "doc_id", "text").count()
      === first.accepted)
  }

  test("streaming file-delivery ingest ≡ the batch delivery loop") {
    import java.nio.file.{Files => JFiles}
    val fullDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val src = JFiles.createTempDirectory("graft-incdedup-src").toString
    val ckpt = JFiles.createTempDirectory("graft-incdedup-ckpt").toString
    val rootStream = freshRoot()
    val rootBatch = freshRoot()
    val d1 = fullDocs.where($"doc_id" % 2 === 0)
    val d2 = fullDocs.where($"doc_id" % 2 === 1)

    // delivery 1 arrives; persisted checkpoint processes only new files
    d1.coalesce(1).write.mode("append").parquet(src)
    graft.streaming.Streams.dedupIngestStreamingFrom(spark, src, rootStream, ckpt)
    IncrementalDedup.ingest(d1.select($"doc_id", $"text"), "doc_id", "text", rootBatch)
    // delivery 2 arrives later
    d2.coalesce(1).write.mode("append").parquet(src)
    graft.streaming.Streams.dedupIngestStreamingFrom(spark, src, rootStream, ckpt)
    IncrementalDedup.ingest(d2.select($"doc_id", $"text"), "doc_id", "text", rootBatch)

    def ids(root: String) = IncrementalDedup
      .survivors(spark, root, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids(rootStream) === ids(rootBatch),
      "streaming deliveries must accept exactly the batch loop's survivors")
  }

  test("single-delivery ingest agrees with the batch dedup survivor count") {
    val root = freshRoot()
    IncrementalDedup.ingest(docs, "doc_id", "text", root)
    val incremental = IncrementalDedup
      .survivors(spark, root, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    // batch twin: exact groups + near-dup components, min-id survivors
    val exactKept = docs
      .withColumn("h", graft.ext.TextAnalysis.fingerprintMd5($"text"))
      .withColumn("keep", $"doc_id" === min($"doc_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"h")))
      .where($"keep").select($"doc_id", $"text")
    val comp = Dedup.clusters(exactKept, "doc_id", "text", 3, 0.3)
    val batch = comp
      .withColumn("keep", $"doc_id" === min($"doc_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"component")))
      .where($"keep").select($"doc_id").as[Long].collect().toSet
    assert(incremental === batch,
      "one-shot incremental ingest must equal the batch dedup survivors")
  }
}
