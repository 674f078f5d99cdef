package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-script character counts in ONE compiled pass: a long array of
  * per-class counts in [[graft.ext.TextAnalysis.ScriptClasses]] order
  * (latin, cyrillic, greek, arabic, cjk, hangul, thai).
  *
  * The declarative spelling — one `length - length(regexp_replace(...))`
  * per class — scans the document text SEVEN times through the regex
  * engine for quantities that one code-point walk produces; at corpus
  * scale the regex passes are the dominant per-byte cost of the
  * script-ID projection. Counts are code-point counts over contiguous
  * BMP ranges, so they equal the regex spelling exactly on any input
  * (supplementary characters advance the walk by one code point and
  * belong to no class — same as the regex view, where they are single
  * `length` units that no class matches). Proven by x114's unchanged
  * DuckDB oracle (the x76 RepetitionStats precedent).
  */
case class ScriptCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // null in -> null out: lets constraint inference push isnotnull to the
  // scan instead of re-evaluating the expression inside a pushed filter
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_script_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Long](7)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) counts(0) += 1L
      else if (cp >= 0x0400 && cp <= 0x04FF) counts(1) += 1L
      else if (cp >= 0x0370 && cp <= 0x03FF) counts(2) += 1L
      else if (cp >= 0x0600 && cp <= 0x06FF) counts(3) += 1L
      else if (cp >= 0x4E00 && cp <= 0x9FFF) counts(4) += 1L
      else if (cp >= 0xAC00 && cp <= 0xD7AF) counts(5) += 1L
      else if (cp >= 0x0E00 && cp <= 0x0E7F) counts(6) += 1L
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {
  def column(text: Column): Column =
    ColumnBridge.column(ScriptCounts(ColumnBridge.expression(text)))
}
