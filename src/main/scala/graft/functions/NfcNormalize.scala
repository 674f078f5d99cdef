package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: Unicode NFC normalization.
  *
  * Multilingual corpus text arrives in mixed normalization forms — the
  * same visible string as precomposed codepoints (é = U+00E9) in one
  * crawl and decomposed (e + U+0301) in another — which silently breaks
  * exact dedup, token statistics, and any hash keyed on raw bytes.
  * Canonicalizing to NFC before hashing/deduping is standard corpus
  * hygiene, and Spark has no built-in for it (`lower`/`trim` are
  * byte-level). One compiled per-row pass over `java.text.Normalizer`
  * (ICU-equivalent canonical composition); the fast path
  * `Normalizer.isNormalized` skips allocation for the overwhelmingly
  * common already-NFC input, so ASCII corpora pay ~nothing.
  *
  * Cross-engine parity: DuckDB's `nfc_normalize` implements the same
  * Unicode canonical composition — oracle-checkable, unlike
  * engine-hash-family expressions.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // null in -> null out; lets constraint inference push isnotnull to the
  // scan instead of re-evaluating the expression in a pushed filter
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def column(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
