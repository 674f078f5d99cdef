package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: distinct word n-gram shingles of normalized
  * (lowercased, whitespace-split) text, in one compiled pass.
  *
  * Why a custom Expression (SURVEY §7 preference order (b)): the built-in
  * spelling — `transform(sequence(…), i -> concat_ws(' ', element_at(…)))`
  * + `array_distinct` — evaluates an interpreted lambda per n-gram
  * (~300 per document), which profiling showed dominating the dedup
  * pipeline. This expression does the same work per ROW in compiled Scala:
  * one tokenize, one rolling join, one hash-set dedup. Semantics are
  * identical to the HOF spelling (oracle-checked by x31).
  *
  * Per-row fallback eval (not doGenCode): the output is a variable-length
  * array of strings — codegen would only inline the same buffer writes,
  * and CodegenFallback keeps the surrounding operators in whole-stage
  * codegen.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  // null in -> null out (nullSafeEval): declaring it lets constraint
  // inference push isnotnull(<child attribute>) to the scan instead of
  // re-evaluating this whole expression inside a pushed filter
  override def nullIntolerant: Boolean = true

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    // Exact Spark-spelling tokenization (see MinHashSignature): UTF8String
    // lower/trim + limit -1 split, so shingles agree with the HOF/oracle
    // spelling on all whitespace/locale edge cases, not just the corpus.
    val toks = input.asInstanceOf[UTF8String].toLowerCase.trim().toString.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
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
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object GraftFunctions {

  /** Column-API form. */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** One-pass MinHash signature: `SELECT graft_minhash_signature(text, 3, 64)`. */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    MinHashSignature.column(text, n, numHashes)

  /** One-pass 64-bit SimHash: `SELECT graft_simhash64(text)`. */
  def simhash64(text: Column): Column = SimHash64.column(text)

  /** SQL registration of every graft expression:
    * `graft_word_shingles(text, n)`, `graft_minhash_signature(text, n,
    * numHashes)`, `graft_simhash64(text)`.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_word_shingles",
      exprs => WordShingles(exprs.head, exprs(1).eval().asInstanceOf[Int]),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash_signature",
      exprs => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash64",
      exprs => SimHash64(exprs.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_repetition_stats",
      exprs => RepetitionStats(exprs.head),
      "built-in")
  }
}
