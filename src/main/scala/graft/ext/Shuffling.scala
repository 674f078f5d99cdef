package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training-order shuffle.
  *
  * Training pipelines need each epoch's document order to be (a) a
  * uniform-looking permutation, (b) reproducible bit-for-bit across
  * re-runs, engines, and partitionings, and (c) computable without a
  * single-node sort. Seeded RNG shuffles fail (b) under repartitioning;
  * a naive `row_number() OVER (ORDER BY hash)` fails (c) — Spark plans
  * an unpartitioned window as ONE partition holding the whole corpus.
  *
  * Here the permutation key is md5(seed:id) (change `seed` for a fresh
  * epoch order), and the global position is a two-level rank (same
  * technique as [[Chunking.packManifest]]'s prefix sum):
  *
  *   level 1: rows bucket by their first `hexChars` hash hex chars
  *     (16^hexChars buckets — lexicographically ordered prefix = order of
  *     the full hash, so bucket order IS global order); row_number within
  *     bucket runs distributed, 16^hexChars-way parallel;
  *   level 2: one count per bucket, cumulated in a single-partition
  *     window over <= 16^hexChars rows, broadcast back as the bucket's
  *     offset.
  *
  * `position` is provably INVARIANT to `hexChars`: the global order key
  * is always the full (hash, id) pair — the bucket prefix only decides
  * how that total order is chunked for parallelism. Default 4 (65,536
  * buckets): at 100 TB the per-bucket sort task holds corpus/65,536 rows
  * (~1.5 GB at 10¹⁰ docs) where 2 hex chars would hold a ~400 GB
  * single-task sort; the level-2 window stays trivially bounded
  * (65,536 count rows on one partition).
  *
  * position = bucket_offset + local_rank (1-based). Ties between equal
  * hashes (never observed for md5, but determinism must not rest on
  * that) break by id.
  *
  * Also emits `shard` = (position-1) % nShards when nShards > 0, the
  * round-robin shard assignment a sharded training-data writer wants —
  * consecutive positions land on different shards, so each shard is
  * itself an unbiased sample of the epoch order.
  */
object Shuffling {

  /** `idCol` must be unique per row (the document-primary-key contract):
    * duplicated ids exhaust the (hash, id) tie-break and their relative
    * positions become partition-order-dependent — the exact
    * irreproducibility this operator exists to prevent. Dedup first.
    */
  def permute(
      df: DataFrame,
      idCol: String,
      seed: String = "epoch0",
      nShards: Int = 0,
      hexChars: Int = 4): DataFrame = {
    require(nShards >= 0, s"nShards must be >= 0, got $nShards")
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1,8] (16^hexChars level-1 buckets), got $hexChars")
    val key = Sampling.saltedMd5(col(idCol), seed)
    val withKey = df.withColumn("__k", key)
      .withColumn("__b", substring(col("__k"), 1, hexChars))
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy(col("__k"), col(idCol))
    val local = withKey.withColumn("__r", row_number().over(wLocal))
    val counts = withKey.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
    // single-partition window over <= 16^hexChars count rows — bounded at
    // any scale (65,536 rows at the default)
    val wBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wBuckets), lit(0L)))
      .select(col("__b"), col("__off"))
    val ranked = local
      .join(broadcast(offs), Seq("__b"))
      .withColumn("position", col("__off") + col("__r"))
      .drop("__k", "__b", "__r", "__off")
    if (nShards > 0)
      ranked.withColumn("shard", pmod(col("position") - 1, lit(nShards.toLong)))
    else ranked
  }
}
