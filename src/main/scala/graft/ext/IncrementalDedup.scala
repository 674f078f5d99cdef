package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.lake.Versioned

/** Incremental corpus deduplication — the production loop of a training
  * -data pipeline: deliveries arrive over time and each must be deduped
  * against everything already accepted WITHOUT re-running corpus-wide
  * pair generation.
  *
  * Persisted state under `stateRoot` (two [[Versioned]] log tables, so
  * every publish is atomic for readers and O(delivery), never a corpus
  * rewrite):
  *  - `survivors`: accepted documents (id, text, content_hash);
  *  - `bands`: their MinHash LSH bands (id, band, band_hash) — the
  *    precomputed index that makes delivery-vs-corpus candidate
  *    generation an equi-join. Signature computation (the CPU-heavy
  *    part) happens exactly once per accepted document, at ingest.
  *
  * Per-delivery work: O(|delivery|) hashing + signatures, one hash
  * equi-join + one bucket-join against the persisted index (both prune
  * to narrow columns on the corpus side), and exact Jaccard
  * verification of the (small) candidate set. Survivor rules are
  * deterministic: min-id within a delivery, corpus-first-wins across
  * deliveries (an accepted document is never evicted — ingestion
  * history is append-only, so re-delivering old data is a no-op).
  *
  * Near-dups are caught by banding + Jaccard ≥ threshold; exact dups
  * (including documents too short to shingle) by the normalized content
  * hash — the same two tiers as the batch [[Dedup]] operators.
  */
object IncrementalDedup {

  /** Per-ingest accounting (all counts are documents). */
  final case class IngestStats(
      delivered: Long,
      dupsWithinDelivery: Long,
      dupsVsCorpus: Long,
      accepted: Long)

  private def survivorsRoot(stateRoot: String) =
    stateRoot.stripSuffix("/") + "/survivors"
  private def bandsRoot(stateRoot: String) =
    stateRoot.stripSuffix("/") + "/bands"

  /** Which survivors version the band tier is synced to. Written AFTER
    * the bands publish; a crash between the survivors publish and the
    * bands publish leaves it stale, which is exactly the signal the next
    * ingest uses to backfill — without it, accepted-but-unindexed
    * documents would stay invisible to the near tier FOREVER (signatures
    * are computed at ingest and were never revisited).
    */
  private def syncMarker(stateRoot: String) =
    java.nio.file.Paths.get(stateRoot.stripSuffix("/"), "_BANDS_SYNCED_TO")

  private def readSyncMarker(stateRoot: String): Option[Int] = {
    val f = syncMarker(stateRoot)
    if (!java.nio.file.Files.exists(f)) None
    else
      scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim.toInt
      ).toOption // torn write parses as None → reconcile (safe direction)
  }

  private def writeSyncMarker(stateRoot: String, version: Int): Unit =
    java.nio.file.Files.write(syncMarker(stateRoot),
      s"$version\n".getBytes("UTF-8"))

  /** Crash reconciliation, run under the writer lock: band-index any
    * survivor missing from the bands table (same signature pipeline as
    * ingest). O(corpus) id anti-join — but it only runs when the sync
    * marker disagrees with the live survivors version, i.e. after a
    * crash between the two publishes; the steady state pays one tiny
    * file read.
    */
  private def backfillMissingBands(
      spark: SparkSession,
      stateRoot: String,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int,
      bands: Int): Unit = {
    val bRoot = bandsRoot(stateRoot)
    val surv = Versioned.read(spark, survivorsRoot(stateRoot))
    val indexedIds =
      if (Versioned.exists(bRoot))
        Versioned.read(spark, bRoot).select(col(idCol)).distinct()
      else surv.select(col(idCol)).limit(0)
    val missing = surv
      .join(indexedIds, Seq(idCol), "left_anti")
      .where(size(split(trim(lower(col(textCol))), "\\s+")) >= lit(n))
    if (missing.limit(1).count() > 0) {
      val sigs = missing
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col(idCol),
          graft.functions.MinHashSignature.column(col(textCol), n, numHashes)
            .as("mh"))
      val rows = Dedup.lshBands(sigs, idCol, bands, numHashes / bands)
        .select(col(idCol), col("band"), col("band_hash"))
      Versioned.publishDelta(rows, bRoot)
    }
  }

  /** The accepted corpus so far: (idCol, textCol, content_hash), empty
    * (with that schema) if nothing was ever ingested.
    */
  def survivors(
      spark: SparkSession,
      stateRoot: String,
      idCol: String,
      textCol: String): DataFrame =
    if (Versioned.exists(survivorsRoot(stateRoot)))
      Versioned.read(spark, survivorsRoot(stateRoot))
    else
      spark.range(0)
        .select(col("id").as(idCol),
          lit("").as(textCol),
          lit("").as("content_hash"))

  /** Ingest one delivery: dedupe it against itself and the accepted
    * corpus, append only novel documents to the state, return the
    * accounting. Deterministic given the delivery content.
    */
  def ingest(
      delivery: DataFrame,
      idCol: String,
      textCol: String,
      stateRoot: String,
      n: Int = 3,
      threshold: Double = 0.3,
      numHashes: Int = 64,
      bands: Int = 16): IngestStats =
    // the dedup decision depends on the state read at the START of the
    // ingest, so the lock must span read-through-publish: two concurrent
    // ingests against the same base would otherwise double-accept
    // near-dups of each other (not just interleave version numbers)
    Versioned.withWriterLock(stateRoot, Versioned.UnattendedStaleLockMillis) {
      ingestLocked(delivery, idCol, textCol, stateRoot, n, threshold,
        numHashes, bands)
    }

  private def ingestLocked(
      delivery: DataFrame,
      idCol: String,
      textCol: String,
      stateRoot: String,
      n: Int,
      threshold: Double,
      numHashes: Int,
      bands: Int): IngestStats = {
    val spark = delivery.sparkSession

    // 0. crash reconciliation (under the lock we already hold): if the
    //    sync marker doesn't match the live survivors version, a prior
    //    writer died between the survivors publish and the bands publish
    //    — backfill band rows for the unindexed survivors before this
    //    delivery is judged, then stamp the marker. Near-dups of those
    //    documents are rejected from this ingest onward instead of
    //    being silently accepted forever.
    Versioned.currentVersion(survivorsRoot(stateRoot)).foreach { v =>
      if (!readSyncMarker(stateRoot).contains(v)) {
        backfillMissingBands(spark, stateRoot, idCol, textCol, n,
          numHashes, bands)
        writeSyncMarker(stateRoot, v)
      }
    }

    val delivered = delivery.count()

    // 1a. within-delivery EXACT dedup on the normalized content hash —
    //     catches everything identical, including sub-n-token documents
    //     the shingle tier can't see; min-id survivor via one window.
    //     r22: materialized ONCE — it feeds the minhash signature pass,
    //     the verification shingle sets, and the keptWithin join, each of
    //     which re-ran the delivery scan + hash + window before.
    val hashed = delivery.select(col(idCol), col(textCol),
      TextAnalysis.fingerprintMd5(col(textCol)).as("content_hash"))
    val exactKept = hashed
      .withColumn("keep",
        col(idCol) === min(col(idCol)).over(Window.partitionBy(col("content_hash"))))
      .where(col("keep"))
      .drop("keep")
      .localCheckpoint(true)

    // 1b. within-delivery NEAR dedup: LSH pairs → components → min-id
    val pairs = Dedup
      .minhashPairs(exactKept, idCol, textCol, n, threshold, numHashes, bands)
      .select(col("id_a"), col("id_b"))
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val keptWithin = exactKept
      .join(cc, exactKept(idCol) === cc("node"), "left")
      .withColumn("component", coalesce(col("label"), col(idCol)))
      .select(exactKept(idCol).as(idCol), col(textCol), col("content_hash"),
        col("component"))
      .withColumn("keep",
        col(idCol) === min(col(idCol)).over(Window.partitionBy(col("component"))))
      .where(col("keep"))
      .select(col(idCol), col(textCol), col("content_hash"))
      // r22: materialized ONCE — consumed by the corpus hash tier, the
      // signature pass, the verification sets, the novel anti-join, AND
      // keptCount, each of which re-ran the window pipeline before
      .localCheckpoint(true)

    // 2. delivery-vs-corpus, two tiers. Corpus side prunes to narrow
    //    columns (hash / bands) — text is only fetched for candidates.
    val corpus = survivors(spark, stateRoot, idCol, textCol)
    val exactDupVsCorpus = keptWithin
      .join(corpus.select(col("content_hash")), Seq("content_hash"), "left_semi")
      .select(col(idCol).as("new_id"))

    val spread = keptWithin.repartition(spark.sparkContext.defaultParallelism)
    val newSigs = spread
      .where(size(split(trim(lower(col(textCol))), "\\s+")) >= lit(n))
      .select(col(idCol),
        graft.functions.MinHashSignature.column(col(textCol), n, numHashes).as("mh"))
    val newBands = Dedup.lshBands(newSigs, idCol, bands, numHashes / bands)
      .select(col(idCol).as("new_id"), col("band"), col("band_hash"))
      // consumed twice (candidate join + novel-band publish): materialize
      // the signature pass once instead of recomputing 64 hashes per doc
      .localCheckpoint(true)

    val bRoot = bandsRoot(stateRoot)
    val nearDupVsCorpus: DataFrame =
      if (!Versioned.exists(bRoot))
        keptWithin.select(col(idCol).as("new_id")).limit(0)
      else {
        val corpusBands = Versioned.read(spark, bRoot)
          .select(col(idCol).as("old_id"), col("band"), col("band_hash"))
        val candidates = newBands
          .join(corpusBands, Seq("band", "band_hash"))
          .select(col("new_id"), col("old_id"))
          .distinct()
          // consumed twice (corpus prune + verification join); checkpoint
          // so the band join runs once
          .localCheckpoint(true)
        val newSets = keptWithin.select(col(idCol).as("new_id"),
          graft.functions.GraftFunctions.wordShingles(col(textCol), n).as("sh_a"))
        // semi-join prune BEFORE shingling: without it the shingle
        // projection evaluates over the ENTIRE corpus every ingest —
        // exactly the O(corpus) recompute this class exists to avoid
        val oldSets = corpus
          .join(candidates.select(col("old_id")).distinct(),
            corpus(idCol) === col("old_id"), "left_semi")
          .select(col(idCol).as("old_id"),
            graft.functions.GraftFunctions.wordShingles(col(textCol), n).as("sh_b"))
        candidates
          .join(newSets, Seq("new_id"))
          .join(oldSets, Seq("old_id"))
          .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("jaccard",
            col("n_common").cast(DoubleType)
              / (size(col("sh_a")) + size(col("sh_b")) - col("n_common"))
                .cast(DoubleType))
          .where(col("jaccard") >= lit(threshold))
          .select(col("new_id"))
          .distinct()
      }

    val dupIds = exactDupVsCorpus.union(nearDupVsCorpus).distinct()
    val novel = keptWithin
      .join(dupIds, keptWithin(idCol) === dupIds("new_id"), "left_anti")
      // reused 3× below (two publishes + count); sever the multi-join
      // lineage and materialize once
      .localCheckpoint(true)

    // 3. publish the delta: documents first, then their index. A writer
    //    crash between the two flips leaves accepted documents missing
    //    from the band index — the exact tier still catches identical
    //    re-deliveries (hash lives in survivors), and step 0's marker
    //    check backfills the band rows at the start of the NEXT ingest,
    //    so the exposure is bounded to that single crashed window; never
    //    a lost document
    val keptCount = keptWithin.count()
    val novelCount = novel.count()
    if (novelCount > 0) {
      Versioned.publishDelta(novel, survivorsRoot(stateRoot))
      val novelBands = newBands
        .join(novel.select(col(idCol).as("new_id")), Seq("new_id"), "left_semi")
        .select(col("new_id").as(idCol), col("band"), col("band_hash"))
      Versioned.publishDelta(novelBands, bRoot)
      // marker LAST: stale-on-crash is the reconcile trigger above
      Versioned.currentVersion(survivorsRoot(stateRoot))
        .foreach(writeSyncMarker(stateRoot, _))
    }
    IngestStats(
      delivered = delivered,
      dupsWithinDelivery = delivered - keptCount,
      dupsVsCorpus = keptCount - novelCount,
      accepted = novelCount)
  }

  /** Policy-driven state maintenance: compact + vacuum the survivors and
    * bands tables when their compaction signals trip, under the SAME
    * writer lock as [[ingest]] (a concurrent ingest must not interleave
    * version allocation with compact, nor have a just-referenced delta
    * vacuumed). Compaction rewrites files without changing CONTENT, but
    * it bumps the survivors version — re-stamp the sync marker so the
    * next ingest doesn't mistake the bump for a crashed publish and pay
    * the O(corpus) backfill scan for nothing. Returns the table names
    * that were compacted.
    */
  def compactState(spark: SparkSession, stateRoot: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16): Seq[String] =
    Versioned.withWriterLock(stateRoot, Versioned.UnattendedStaleLockMillis) {
      // reconcile FIRST (same as ingest step 0): if a crashed publish
      // left survivors unindexed, stamping the post-compaction version
      // without backfilling would hide them from the band tier forever.
      // The survivors schema is (idCol, textCol, content_hash) by
      // construction, so the column names come from the table itself.
      Versioned.currentVersion(survivorsRoot(stateRoot)).foreach { v =>
        if (!readSyncMarker(stateRoot).contains(v)) {
          val cols = Versioned.read(spark, survivorsRoot(stateRoot)).columns
          backfillMissingBands(spark, stateRoot, cols(0), cols(1), n,
            numHashes, bands)
        }
      }
      val compacted = Seq("survivors", "bands").filter { t =>
        val root = stateRoot.stripSuffix("/") + "/" + t
        val due = Versioned.exists(root) && Versioned.needsCompaction(root)
        if (due) {
          Versioned.compact(spark, root)
          Versioned.vacuum(root)
        }
        due
      }
      Versioned.currentVersion(survivorsRoot(stateRoot))
        .foreach(writeSyncMarker(stateRoot, _))
      compacted
    }
}
