package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Windowed sequencing layer (SURVEY §2.5 W1-W3).
  *
  * All reference windows are `row_number` ranking windows with default
  * frames: rider numbering (`ibs_ordinary_payment_utilities.py:84-94`),
  * period sequencing over a 7-col partition with 6 tiebreakers (`:111-122`),
  * and business-key run indexes (`:262-266`). Determinism requires the
  * order-by list to be a total order within each partition — callers must
  * pin tiebreakers (the oracle hash-compare makes nondeterminism fatal).
  *
  * Scale note: a ranking window shuffles on its partition keys and sorts
  * within each partition. At 100 TB the partition key must be high-cardinality
  * (per-payment / per-order grain is — millions of small groups), never a
  * low-cardinality column, which would serialize into a handful of giant
  * sorted partitions.
  */
object Windows {

  /** W1/W2: 1-based sequence within a partition. */
  def sequenceWithin(partitionCols: Seq[Column], orderCols: Seq[Column]): Column =
    row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*))

  /** W3 + F3: business key `<prefix><id>_<runIndex>`
    * (`PMT_KAL_<pmt_seq>_<row_number>` at reference :262-266).
    */
  def businessKey(prefix: String, idCol: Column, seqCol: Column): Column =
    concat(lit(prefix), idCol.cast(StringType), lit("_"), seqCol.cast(StringType))

  /** W1 + F4: sub-entity id `<parent>_<row_number>` via concat_ws
    * (`pmt_premium_rid_number` at reference :90-94).
    */
  def subEntityId(parentCol: Column, seqCol: Column): Column =
    concat_ws("_", parentCol.cast(StringType), seqCol.cast(StringType))
}
