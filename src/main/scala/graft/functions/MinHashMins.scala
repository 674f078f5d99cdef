package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Single-pass MinHash aggregation over pre-exploded shingle base hashes:
  * one buffer of `numHashes` running minimums, updated with `numHashes`
  * cheap fixed-width hashes per input row.
  *
  * Replaces the declarative spelling of `numHashes` independent
  * `min(xxhash64(lit(i), sh_base))` aggregate expressions, which walks the
  * aggregation buffer machinery once per family member per row. This
  * Aggregator touches each input row once, is map-side combinable (merge =
  * elementwise min), and its shuffle payload is one `numHashes`-long array
  * per (group, partition).
  *
  * Hash family is identical to [[MinHashSignature]] (and to the old
  * declarative spelling): h_i = XXH64.hashLong(base, XXH64.hashInt(i, 42)).
  */
class MinHashMins(numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(numHashes >= 1 && numHashes <= 1024,
    s"numHashes must be in [1, 1024], got $numHashes")

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], base: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val h = XXH64.hashLong(base, seeds(i))
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashMins {
  def apply(numHashes: Int): MinHashMins = new MinHashMins(numHashes)
}
