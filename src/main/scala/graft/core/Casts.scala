package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Defensive-cast helpers and null-sentinel constants (SURVEY §1.2).
  *
  * The reference imposes a fixed target schema on loosely-typed ODS sources
  * with explicit per-field casts and null-guarding
  * (`ibs_ordinary_payment_utilities.py:160-249`), and distinguishes
  * "required" fields (null → typed zero/empty sentinel,
  * `ibs_ordinary_payment_utilities.py:71-78`) from optional fields
  * (null stays null).
  */
object Casts {

  val Money: DecimalType = DecimalType(18, 2)

  // Required-field null sentinels (REQ_NULL_* at reference :71-74).
  val ReqNullStr: Column = lit("")
  val ReqNullInt: Column = lit(0)
  val ReqNullDec: Column = lit(BigDecimal(0).setScale(2)).cast(Money)
  val ReqNullDate: Column = lit(null).cast(StringType)

  // Optional-field sentinels (NON_REQ_NULL_* at reference :75-78).
  def nonReqNull(dt: DataType): Column = lit(null).cast(dt)

  /** Mixed int/string tolerated input → string before parsing
    * (reference `promting_and_code.txt:74` pattern).
    */
  def asString(c: Column): Column = c.cast(StringType)

  def asInt(c: Column): Column = c.cast(IntegerType)

  def asMoney(c: Column): Column = c.cast(Money)

  /** Required decimal: null-guarded cast, null → 0.00 (reference :169-178). */
  def reqMoney(c: Column): Column =
    when(c.isNotNull, c.cast(Money)).otherwise(ReqNullDec)

  /** Required int: null → 0 (reference :164-167). */
  def reqInt(c: Column): Column =
    when(c.isNotNull, c.cast(IntegerType)).otherwise(ReqNullInt)

  /** Required string: null → "" (reference :159-163, trimmed variant :276). */
  def reqString(c: Column): Column =
    when(c.isNotNull, c.cast(StringType)).otherwise(ReqNullStr)
}
