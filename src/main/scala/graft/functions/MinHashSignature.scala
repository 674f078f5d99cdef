package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: the full MinHash signature of a document in
  * one compiled per-row pass — tokenize, roll word n-gram shingles, hash
  * each shingle once (xxhash64), then fold all `numHashes` family minimums
  * into a fixed 64-entry buffer.
  *
  * Why (SURVEY §7 custom-Catalyst reservation): the declarative spelling —
  * explode shingles, then `numHashes` independent `min(xxhash64(lit(i),
  * sh_base))` aggregates — materializes O(docs × shingles) rows, caches
  * them, and evaluates `numHashes` hash expressions per shingle ROW through
  * the aggregate path. Profiled at 31% of the whole benchmark. This
  * expression does the identical arithmetic per DOCUMENT in a tight loop:
  * no explode, no cache, no aggregation exchange — the signature pass
  * becomes a narrow map, which is the shape that survives 100 TB.
  *
  * Hash-family parity with the declarative spelling (so LSH behavior and
  * the ExtSpec subset/recall properties are unchanged):
  *   base(sh) = xxhash64(sh)            = XXH64.hashUTF8String(sh, 42)
  *   h_i(sh)  = xxhash64(lit(i), base)  = XXH64.hashLong(base, XXH64.hashInt(i, 42))
  * (Spark's `xxhash64` chains the running hash as the seed of the next
  * child; the per-function seeds are precomputed once.)
  *
  * Duplicate shingles need no dedup pass: `min` is idempotent.
  *
  * Returns null when the document has fewer than `n` tokens (no shingles →
  * no signature), mirroring the exploded spelling where such docs simply
  * produce no rows. Callers filter nulls before banding so empty docs can
  * never band together.
  *
  * Per-row fallback eval (not doGenCode): codegen would inline the same
  * loop; CodegenFallback keeps surrounding operators in whole-stage codegen.
  */
case class MinHashSignature(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  // null in -> null out (nullSafeEval): declaring it lets constraint
  // inference push isnotnull(<child attribute>) to the scan instead of
  // re-evaluating this whole expression inside a pushed filter
  override def nullIntolerant: Boolean = true

  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(numHashes >= 1 && numHashes <= 1024,
    s"numHashes must be in [1, 1024], got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_signature"

  // Seed of family member i: the running hash after xxhash64 consumes lit(i).
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override protected def nullSafeEval(input: Any): Any = {
    // Tokenize EXACTLY like the Spark spelling split(trim(lower(text))):
    // UTF8String.toLowerCase (locale-independent, = Spark lower());
    // UTF8String.trim (space-only, = Spark trim(), unlike Java's
    // String.trim which also strips \t\n\r); split with limit -1 (keeps
    // trailing empty tokens, unlike Java's default split). Exact parity
    // keeps minhashPairs' cheap Spark-side pre-filter and this
    // expression in agreement, so a null signature can never reach the
    // banding join (where null array items would hash identically and
    // band all such docs together — a quadratic candidate blowup).
    val toks = input.asInstanceOf[UTF8String].toLowerCase.trim().toString.split("\\s+", -1)
    if (toks.length < n) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val base = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashLong(base, seeds(k))
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def column(text: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(text), n, numHashes))
}
