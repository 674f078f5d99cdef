package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Nested-document assembly helpers (SURVEY §2.7 F3/F8/F16, §1.2).
  *
  * The reference's output row is a deeply nested payment document
  * (`PMT_KAL_5776815_1_New.json`): header + array<struct> of periods, each
  * with rider/endorsement sub-arrays, timestamps rendered as ISO-8601
  * strings with a fixed +07:00 offset, and a content-hash id.
  */
object Docs {

  /** Timestamp-with-offset AS STRING: the reference concatenates a literal
    * offset suffix onto a date string (`ibs_ordinary_payment_utilities.py:193,198`)
    * — string semantics, no timezone math, by design.
    */
  def isoOffsetMidnight(dateStr: Column, offset: String = "+07:00"): Column =
    when(dateStr.isNotNull, concat(dateStr, lit(s"T00:00:00$offset")))
      .otherwise(lit(null).cast(StringType))

  /** F8: multi-branch decode as a data table, not a hand-written when-chain
    * (the reference's 6-branch channel decode with default '99',
    * `ibs_ordinary_payment_utilities.py:221-241`). Folding (code, out) pairs
    * keeps the whole decode inside whole-stage codegen as a CASE expression.
    */
  def decode(input: Column, mapping: Seq[(String, String)], default: String): Column =
    mapping.foldLeft(lit(null).cast(StringType)) { case (acc, (in, out)) =>
      when(input === lit(in), lit(out)).otherwise(acc)
    } match {
      case chain => coalesce(chain, lit(default))
    }

  /** F16: content-hash document id. The reference's golden outputs carry a
    * sha-256 id (`PMT_KAL_5776815_1_New.json:346`). We hash a '|'-joined
    * canonical digest string (not `to_json`) so the hash is reproducible by
    * any engine — the DuckDB oracle computes the identical value with
    * `sha256(concat_ws('|', …))`.
    */
  def contentId(fields: Column*): Column =
    sha2(concat_ws("|", fields.map(_.cast(StringType)): _*), 256)
}
