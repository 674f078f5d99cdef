package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deterministic content-addressed sampling and split assignment for
  * training corpora.
  *
  * Why not `df.sample`/`sampleBy`: RNG-based sampling is partition-order
  * dependent and engine-specific — re-runs, repartitions, or a different
  * engine produce a DIFFERENT subset, which silently breaks train/val
  * separation across pipeline versions. Hashing the stable id instead
  * gives splits that are reproducible across runs, partitionings, AND
  * engines (md5 is bit-identical everywhere), with no shuffle and no RNG
  * state — a narrow per-row projection at any scale.
  *
  * Buckets are the first `hexChars` hex digits of md5(salt:id): fixed-
  * width lowercase hex compares lexicographically = numerically, so a
  * fraction p maps to the threshold floor(p · 16^hexChars) rendered in
  * hex. Change `salt` to draw an independent split.
  */
object Sampling {

  val DefaultSalt = "graft/v1"

  /** The ONE salted-hash spelling every deterministic-selection operator
    * shares: md5(salt:id). [[hashBucket]], [[kPerStratum]], and
    * [[Mixture]]'s keep-predicates all derive from this, so their
    * selections live in the same hash space by construction.
    */
  def saltedMd5(id: Column, salt: String = DefaultSalt): Column =
    md5(concat(lit(salt), lit(":"), id.cast(StringType)))

  /** Stable hex bucket (16^hexChars buckets) for an id column. */
  def hashBucket(id: Column, salt: String = DefaultSalt, hexChars: Int = 2): Column = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars must be in [1,8], got $hexChars")
    substring(saltedMd5(id, salt), 1, hexChars)
  }

  /** [[hashBucket]] as a numeric column (0 until 16^hexChars) — for
    * integer keep-predicates ([[Mixture]]).
    */
  def bucketLong(id: Column, salt: String = DefaultSalt, hexChars: Int = 4): Column =
    conv(hashBucket(id, salt, hexChars), 16, 10).cast("long")

  /** Lowercase fixed-width hex threshold for fraction p of the bucket
    * space — bucket < threshold selects ~p of ids.
    */
  def hexThreshold(p: Double, hexChars: Int = 2): String = {
    require(p >= 0 && p <= 1, s"fraction must be in [0,1], got $p")
    val buckets = math.pow(16, hexChars).toLong
    val t = math.floor(p * buckets).toLong
    // p = 1.0 must select every bucket: a fixed-width rendering of
    // `buckets` ("100" for 2 chars) would compare LESS than "ff"
    // lexicographically; "g" sorts after every hex digit.
    if (t >= buckets) "g" else ("%0" + hexChars + "x").format(t)
  }

  /** Deterministic keep-fraction filter predicate. */
  def samplepredicate(
      id: Column,
      fraction: Double,
      salt: String = DefaultSalt,
      hexChars: Int = 2): Column =
    hashBucket(id, salt, hexChars) < lit(hexThreshold(fraction, hexChars))

  /** Stratified deterministic keep-predicate: per-stratum fractions (e.g.
    * downsample an over-represented language) with a default for unlisted
    * strata. Same md5-bucket mechanics as [[samplepredicate]], so the kept
    * subset is stable across runs, partitionings, and engines — the
    * property RNG `sampleBy` can't give. Pure projection, no shuffle.
    */
  def stratifiedPredicate(
      id: Column,
      stratum: Column,
      fractions: Map[String, Double],
      defaultFraction: Double,
      salt: String = DefaultSalt,
      hexChars: Int = 2): Column = {
    val b = hashBucket(id, salt, hexChars)
    fractions.toSeq.sortBy(_._1).foldRight(
      b < lit(hexThreshold(defaultFraction, hexChars))) {
      case ((value, p), elseCol) =>
        when(stratum === lit(value), b < lit(hexThreshold(p, hexChars)))
          .otherwise(elseCol)
    }
  }

  /** Train/val/test assignment column: 'train' for the first trainPct of
    * bucket space, 'val' for the next valPct, 'test' for the rest.
    */
  def splitAssign(
      id: Column,
      trainPct: Double = 0.8,
      valPct: Double = 0.1,
      salt: String = DefaultSalt,
      hexChars: Int = 2): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 1,
      s"invalid split fractions ($trainPct, $valPct)")
    val b = hashBucket(id, salt, hexChars)
    when(b < lit(hexThreshold(trainPct, hexChars)), lit("train"))
      .when(b < lit(hexThreshold(trainPct + valPct, hexChars)), lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic k-per-stratum sample: the k documents per stratum
    * whose salted md5 ranks lowest — a uniform without-replacement
    * sample per group that is stable across runs, partitionings, and
    * engines (the fixed-size counterpart of [[stratifiedPredicate]]'s
    * fixed-rate sampling; RNG reservoir sampling gives a different
    * subset every run). Output: input columns + `sample_rank` (1..k).
    *
    * One shuffle on the stratum column; per-group state is the window's
    * top-k frontier. Ties (md5 collisions) break by id, so the result
    * is total-order deterministic provided `id` is unique per row — the
    * document-primary-key contract every operator here assumes; rows
    * DUPLICATED on id exhaust the tie-break and rank
    * partition-order-dependently.
    */
  def kPerStratum(
      df: org.apache.spark.sql.DataFrame,
      id: String,
      stratum: String,
      k: Int,
      salt: String = DefaultSalt): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratum))
      .orderBy(saltedMd5(col(id), salt), col(id))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }
}
