package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operator layer (SURVEY §2.2 P1-P11, §2.3 J1-J3, §2.6).
  *
  * The reference hand-rolls a semi-join as inner-join + `select(left['*'])`
  * (`ibs_ordinary_payment_utilities.py:38-42,51-55`); Spark has first-class
  * `left_semi`/`left_anti` which avoid materializing the right side's
  * columns and never duplicate left rows — strictly better plans (the
  * build side of the semi hash join carries keys only).
  */
object Relational {

  /** r21 (guide §2.4): global orderBy over a child materialized ONCE.
    *
    * A bare `.orderBy` plans `Exchange rangepartitioning(...)`, whose
    * RangePartitioner SAMPLES the child RDD to pick bounds and then the
    * shuffle executes the child AGAIN — everything above the last
    * materialized shuffle stage runs twice. On the declared catalog
    * (every entry ends in a deterministic global sort for the oracle
    * compare) this measured 2-3× the whole query: q10 2.66 → 1.42 s,
    * q19 1.20 → 0.66 s, q11 2.77 → 2.02 s at sf0.1 (ProfileR21).
    *
    * r22 (VERDICT r21 #2): the materialization is an eager RECOMPUTABLE
    * persist ([[MaterializeBridge.eagerPersist]]), not a localCheckpoint
    * — identical cost and identical rows (same copy + count + LogicalRDD
    * machinery), but lineage is retained, so at cluster scale an
    * executor lost between the materialization and the sort recomputes
    * its partitions instead of killing the query. Storage level is
    * config-selectable via `spark.graft.orderedOnce.storageLevel`
    * (default MEMORY_AND_DISK — localCheckpoint's own level; a cluster
    * holding giant intermediates can pick MEMORY_AND_DISK_SER etc.).
    *
    * Use ONLY where the sort keys are a total order of the output (every
    * declared query pins one — the oracle hash is order-sensitive), so
    * the emitted sequence is provably unchanged. Spelled as a
    * `.transform` stage: `.transform(Relational.orderedOnce(cols: _*))`.
    */
  def orderedOnce(cols: Column*)(df: DataFrame): DataFrame =
    if (planAudit.get()) df.orderBy(cols: _*)
    else {
      val level = org.apache.spark.storage.StorageLevel.fromString(
        df.sparkSession.conf.get("spark.graft.orderedOnce.storageLevel",
          "MEMORY_AND_DISK"))
      org.apache.spark.sql.graftbridge.MaterializeBridge
        .eagerPersist(df, level).orderBy(cols: _*)
    }

  /** Plan-audit seam for [[orderedOnce]]: the checkpoint truncates the
    * visible plan at a `Scan ExistingRDD`, which is correct for execution
    * but blinds plan-shape audits (PlanQualitySpec's pushed-filter /
    * compiled-expression-once / sanctioned-BNLJ checks). Inside
    * `withPlanAudit`, orderedOnce skips the checkpoint so the audited
    * plan is the FULL pipeline — exactly the operators the checkpointed
    * run executes below the materialization point, plus the same sort.
    * Audit-only: never use on a timed or production path.
    */
  private val planAudit = new java.util.concurrent.atomic.AtomicBoolean(false)

  def withPlanAudit[T](f: => T): T = {
    planAudit.set(true)
    try f finally planAudit.set(false)
  }

  /** J1: keep left rows with ≥1 match on the right (EXISTS). */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** P8-as-join: keep left rows with no match (NOT EXISTS). */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** J3: left join against a small dimension, broadcast to every executor so
    * the fact side never shuffles (reference joins 3 tiny filtered slices of
    * one code table, `ibs_ordinary_payment_utilities.py:255-261`).
    */
  def dimJoin(fact: DataFrame, dim: DataFrame, cond: Column): DataFrame =
    fact.join(broadcast(dim), cond, "left")

  /** P6: half-open date window `[start, end)`
    * (`ibs_ordinary_payment_utilities.py:28,40,53`).
    */
  def dateWindow(c: Column, startInclusive: String, endExclusive: String): Column =
    c >= lit(startInclusive) && c < lit(endExclusive)

  /** P6 at scale: the same half-open window applied to the RAW
    * timestamp column instead of its formatted string. 'yyyy-MM-dd'
    * strings order identically to the timestamps they format, so the
    * predicates are equivalent — but this form pushes a range filter
    * into the parquet scan (row-group min/max pruning; the
    * `date_format` form pushes nothing).
    */
  def tsWindow(c: Column, startInclusive: String, endExclusive: String): Column =
    c >= to_timestamp(lit(startInclusive)) && c < to_timestamp(lit(endExclusive))

  /** P7/P8: IN-list and negated IN-list predicates
    * (`ibs_ordinary_payment_utilities.py:33,46`).
    */
  def inList(c: Column, values: Seq[String]): Column = c.isin(values: _*)
  def notInList(c: Column, values: Seq[String]): Column = !c.isin(values: _*)

  /** P9: dimension-slice predicate — trimmed equality plus nonblank code
    * (`ibs_ordinary_payment_utilities.py:127,133,139`).
    */
  def trimmedSlice(nameCol: Column, nameValue: String, codeCol: Column): Column =
    trim(nameCol) === lit(nameValue) && trim(codeCol) =!= lit("")

  /** Skew-safe equi-join: salt the (skewed) left side into `buckets`
    * deterministic sub-keys and replicate the right side across all
    * buckets, so one hot key spreads over `buckets` reducers instead of
    * serializing into a single straggler task. AQE's skew-join split
    * handles moderate skew at runtime; explicit salting is the tool when
    * one key dominates an entire stage (the 100 TB hot-tenant case).
    * Result is row-identical to `left.join(right, key === rkey, "inner")`.
    *
    * Salt is derived from a hash of the whole left row (deterministic,
    * uniform) — never `rand()`, which breaks retry/lineage reproducibility.
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(replicated,
        salted(leftKey) === replicated(rightKey)
          && salted("__salt") === replicated("__salt"),
        "inner")
      .drop("__salt")
  }
}
