package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: the 64-bit SimHash of a document in one
  * compiled per-row pass — tokenize (lowercase, trim, whitespace split),
  * hash each token once (xxhash64, seed 42), majority-vote per bit, fold
  * into the signature.
  *
  * Replaces the declarative spelling (explode tokens → 64 conditional-sum
  * aggregates → bit fold), which pays a token explode plus an aggregation
  * exchange per corpus pass. Bit semantics are identical (votes > 0 sets
  * the bit; ties clear it), proven by an equivalence spec against
  * [[graft.ext.Dedup.simhashSignatures]]'s aggregate path.
  *
  * Tokenization parity: `split(trim(lower(text)), "\\s+")` — an empty or
  * all-space document yields the single empty token, which is hashed,
  * exactly as the exploded spelling does.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // null in -> null out (nullSafeEval): declaring it lets constraint
  // inference push isnotnull(<child attribute>) to the scan instead of
  // re-evaluating this whole expression inside a pushed filter
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    // Exact Spark-spelling tokenization (see MinHashSignature): UTF8String
    // lower/trim (locale-independent, space-only trim) + limit -1 split
    // (trailing empty tokens kept) — bit parity with the exploded
    // aggregate oracle on ANY input, not just the test corpus.
    val toks = input.asInstanceOf[UTF8String].toLowerCase.trim().toString.split("\\s+", -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def column(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
