package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: membership counts of whitespace tokens
  * against several word lists, in ONE tokenize pass.
  *
  * Why (SURVEY §7 preference order (b)): the declarative spelling —
  * `size(filter(split(trim(text), "\\s+"), t => t.isin(...)))` once per
  * list — re-evaluates the split per occurrence and walks the token array
  * once per list through an interpreted HOF lambda; the language-ID query
  * additionally duplicates those trees inside its argmax when-chain.
  * Profiled at 7% of the whole benchmark. Here: one trim+split, one
  * hash-map probe per token, all list counters updated together.
  *
  * Tokenization is exactly Spark's `split(trim(text), "\\s+")` (Java
  * regex), so counts are bit-identical to the declarative spelling and to
  * the DuckDB oracle's `list_filter(regexp_split_to_array(...))`.
  *
  * Output: Array[Int] of length `lists.size`, counts in list order
  * (duplicate tokens counted once per occurrence).
  */
case class TokenListCounts(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  // null in -> null out (nullSafeEval): declaring it lets constraint
  // inference push isnotnull(<child attribute>) to the scan instead of
  // re-evaluating this whole expression inside a pushed filter
  override def nullIntolerant: Boolean = true

  require(lists.nonEmpty, "need at least one word list")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_token_list_counts"

  // token -> indices of the lists containing it (a token may appear in
  // several lists; each gets its counter bumped).
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    lists.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    // Exact Spark-spelling tokenization: UTF8String.trim (space-only, like
    // Spark trim(), unlike Java String.trim) + limit -1 split (trailing
    // empty tokens kept, like Spark split()).
    val toks = input.asInstanceOf[UTF8String].trim().toString.split("\\s+", -1)
    val counts = new Array[Int](lists.size)
    var i = 0
    while (i < toks.length) {
      val hit = lookup.get(toks(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenListCounts =
    copy(child = newChild)
}

object TokenListCounts {
  def column(text: Column, lists: Seq[Seq[String]]): Column =
    ColumnBridge.column(TokenListCounts(ColumnBridge.expression(text), lists))
}
