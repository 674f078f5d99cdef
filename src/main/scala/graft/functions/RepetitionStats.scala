package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in ONE compiled pass:
  * `[n_tokens, n_distinct, max_token_count, n_bigrams, n_distinct_bigrams]`
  * (a long array — struct-free so the consumer projects fields by index).
  *
  * The declarative spelling (explode tokens → groupBy(doc, token) →
  * groupBy(doc), twice more for bigrams) shuffles the ENTIRE corpus token
  * stream through two aggregation exchanges to compute quantities that
  * are purely row-local — at 100 TB that is the difference between a
  * narrow map stage and shuffling ~10¹³ token rows. Counts are exact and
  * identical to the exploded spelling (proven by x76's unchanged DuckDB
  * oracle).
  *
  * Tokenization parity: `split(trim(text), "\\s+")` — UTF8String trim
  * (space-only) + limit −1 split, the same spelling as
  * [[graft.ext.TextAnalysis.tokens]] and the oracle's
  * `regexp_split_to_array(trim(text), '\s+')`.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // null in -> null out (nullSafeEval): declaring it lets constraint
  // inference push isnotnull(<child attribute>) to the scan instead of
  // re-evaluating this whole expression inside a pushed filter
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].trim().toString.split("\\s+", -1)
    val tokCounts = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length) {
      val prev = tokCounts.get(toks(i))
      tokCounts.put(toks(i), if (prev == null) 1L else prev + 1L)
      i += 1
    }
    var maxTok = 0L
    val it = tokCounts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > maxTok) maxTok = c }
    val bgCounts = new java.util.HashMap[String, java.lang.Long]()
    i = 0
    while (i < toks.length - 1) {
      val bg = toks(i) + " " + toks(i + 1)
      val prev = bgCounts.get(bg)
      bgCounts.put(bg, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    new GenericArrayData(Array[Long](
      toks.length.toLong,
      tokCounts.size().toLong,
      maxTok,
      math.max(0, toks.length - 1).toLong,
      bgCounts.size().toLong))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def column(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))
}
