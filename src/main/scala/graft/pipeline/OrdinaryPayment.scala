package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Casts, Tables}
import graft.ops.{Aggregates, Docs, Relational, Windows}

/** Typed output boundary (SURVEY §1.3: `Dataset[T]` at the documented
  * output contract, `DataFrame` internally): the golden-output document
  * shape of `PMT_KAL_5776815_1_New.json`.
  */
final case class RiderDoc(rid_number: String, rid_amount: java.math.BigDecimal)
final case class EndorsementDoc(endo_code: String, endo_amount: java.math.BigDecimal)
final case class PeriodDoc(
    pmt_prd_premium_seq: Int,
    pmt_prd_seq: Option[Int],
    pmt_prd_outstanding: Option[Int],
    pmt_prd_premium_amount: java.math.BigDecimal,
    pmt_prd_premium_amount_life: java.math.BigDecimal,
    pmt_prd_investment_premium: java.math.BigDecimal,
    pmt_prd_status: String,
    pmt_prd_trx_datetime: Option[String],
    pmt_prd_next_due_datetime: Option[String],
    pmt_prd_receipt_no: Option[String],
    payment_premium_type_riders: Seq[RiderDoc],
    payment_premium_type_endorsements: Seq[EndorsementDoc])
final case class SeqRiderDoc(rid_seq: Int, rid_number: String, rid_amount: java.math.BigDecimal)
final case class PaymentDoc(
    pmt_refer_code_of_company: String,
    pmt_policy_no: String,
    pmt_status: String,
    pmt_priority_code: String,
    pmt_effective_datetime: String,
    pmt_total_amount: java.math.BigDecimal,
    pmt_period_count: Int,
    customer_name: Option[String],
    nation_name: Option[String],
    region_name: Option[String],
    record_version: String,
    source_system: String,
    payment_riders: Option[Seq[SeqRiderDoc]],
    payment_period_seqs: Seq[PeriodDoc],
    id: String)

/** Workflow selector (reference O6: `run_params.workflow_type` branching,
  * `ibs_ordinary_payment_utilities.py:23-55`).
  */
sealed trait WorkflowType
object WorkflowType {
  case object Daily extends WorkflowType
  case object OneTimeInforce extends WorkflowType
  case object OneTimeNonInforce extends WorkflowType
}

final case class RunParams(
    workflowType: WorkflowType,
    startDate: String, // inclusive, 'yyyy-MM-dd'
    endDate: String) // exclusive

/** The flagship pipeline (SURVEY §3.1), re-expressed Spark-first and
  * retargeted at the TPC-H-ish testdata per FIXTURES.md §3:
  *
  *   payment transaction fact  ≅ lineitem (one row per payment period)
  *   policy master (status-filtered) ≅ orders (o_orderstatus IN-list)
  *   premium/rider detail      ≅ lineitem rows with l_returnflag = 'R'
  *   code-mapping dims         ≅ customer → nation → region (broadcast)
  *
  * Stages mirror `ibs_ordinary_payment_utilities.py`:
  *  1. workflow-branched source + half-open date window (:23-55) — semi-join,
  *     not inner+project, so the fact never duplicates
  *  2. rider pre-aggregation: window-numbered sub-entities rolled into a
  *     sorted array<struct> (:80-101)
  *  3. rider attach via left join (:103-107)
  *  4. period sequencing window over the payment grain (:110-122)
  *  5. broadcast dimension joins (:126-141, :255-261)
  *  6. nested-document aggregation: sorted array of 12-field period structs
  *     with null-guarded casts, CASE decode, ISO-offset timestamps (:144-253)
  *  7. header derivation: business key, constants, decodes (:262-290)
  *  8. final projection + content-hash id (:296-308)
  *
  * Scale design: the only wide shuffles are the per-order window + groupBy
  * (same key → Catalyst reuses one exchange) and the orders⋈lineitem join;
  * all dimension joins broadcast. Per-group arrays are bounded by
  * lineitems-per-order (≤ 7 here, ≤ thousands in the reference's data
  * model), so ObjectHashAggregate never sees an unbounded group.
  */
object OrdinaryPayment {

  /** In-force statuses (reference `pstu.isin('1','2','5','6','B','F')` at
    * :33; testdata o_orderstatus ∈ {F,O,P}, in-force ≅ F/P).
    */
  val InForceStatuses: Seq[String] = Seq("F", "P")

  /** Order-priority decode table (reference's channel decode :221-241 as
    * data; default '99').
    */
  val PriorityCodes: Seq[(String, String)] = Seq(
    "1-URGENT" -> "01",
    "2-HIGH" -> "02",
    "3-MEDIUM" -> "03",
    "4-NOT SPECIFIED" -> "04",
    "5-LOW" -> "05")

  /** Period-status decode on (returnflag, linestatus) pairs (reference
    * decodes pmt_method×pmt_channel pairs).
    */
  val StatusCodes: Seq[(String, String)] = Seq(
    "AF" -> "11", "AO" -> "12", "NF" -> "21", "NO" -> "22", "RF" -> "31")

  /** Full nested-document output (array<struct> periods with rider and
    * endorsement sub-arrays), the shape of `PMT_KAL_5776815_1_New.json`.
    */
  def apply(spark: SparkSession, dir: String, params: RunParams): DataFrame = {
    val lineitem = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)

    // ── Stage 1: workflow-branched source + date window (P6/P7/J1) ──
    val dateCol = date_format(col("l_shipdate"), "yyyy-MM-dd")
    val windowed = lineitem
      .withColumn("trx_dt", dateCol)
      // window on the raw timestamp (≡ the string window on trx_dt since
      // 'yyyy-MM-dd' orders identically) → parquet row-group pruning
      .filter(Relational.tsWindow(col("l_shipdate"), params.startDate, params.endDate))
    val fact = params.workflowType match {
      case WorkflowType.Daily => windowed
      case WorkflowType.OneTimeInforce =>
        Relational.semiJoin(
          windowed,
          orders.filter(Relational.inList(col("o_orderstatus"), InForceStatuses)),
          windowed("l_orderkey") === orders("o_orderkey"))
      case WorkflowType.OneTimeNonInforce =>
        Relational.semiJoin(
          windowed,
          orders.filter(Relational.notInList(col("o_orderstatus"), InForceStatuses)),
          windowed("l_orderkey") === orders("o_orderkey"))
    }

    // ── Stage 2 + 4: period sequencing and rider numbering in ONE window
    // pass over fact (W1 + W2) ──
    // Sub-entity numbering must be a total order: (l_linenumber, l_partkey,
    // l_suppkey) is unique within an order in this data.
    //
    // r22 (guide §2.4/§7.2): rid_seq is a running conditional count over
    // the SAME (partition, order) spec as the period sequencing window,
    // computed on the UNFILTERED fact before the returnflag='R' cut —
    // on a total order, "rank among R rows" ≡ "count of R rows at or
    // before me", read at R rows only. The old spelling filtered first,
    // which pushed the R predicate into a SECOND lineitem scan +
    // semi-join + shuffle for the riders branch; with both window specs
    // over the identical child, Catalyst plans ONE exchange of fact and
    // reuses it for the riders aggregate (ReusedExchange in the plan).
    val seqOrder = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val periodSeq = Windows.sequenceWithin(Seq(col("l_orderkey")), seqOrder)
    val riderRun = sum(when(col("l_returnflag") === lit("R"), 1).otherwise(0))
      .over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey")).orderBy(seqOrder: _*))
      .cast("int")
    val factSeq = fact
      .withColumn("pmt_prd_premium_seq", periodSeq)
      .withColumn("__rid_run", riderRun)
    val riders = factSeq
      .filter(col("l_returnflag") === lit("R"))
      .withColumn("rid_seq", col("__rid_run"))
      .withColumn("rid_number", Windows.subEntityId(col("l_orderkey"), col("rid_seq")))
      .withColumn("rid_amount", Casts.asMoney(col("l_extendedprice")))
      .groupBy(col("l_orderkey").as("rid_orderkey"))
      .agg(Aggregates
        .collectSortedStructs(
          col("rid_seq").as("rid_seq"),
          col("rid_number").as("rid_number"),
          col("rid_amount").as("rid_amount"))
        .as("payment_riders"))

    // ── Stage 3: rider attach (J2) ──
    val sequenced = factSeq
      .drop("__rid_run")
      .join(riders, col("l_orderkey") === col("rid_orderkey"), "left")
      .drop("rid_orderkey")

    // ── Stage 5: attach the payment header (orders) ──
    val withHeader = sequenced.join(
      orders.select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_orderstatus"),
        col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_str"),
        Casts.asMoney(col("o_totalprice")).as("o_totalprice_dec")),
      col("l_orderkey") === col("o_orderkey"),
      "inner")

    // ── Stage 6: nested-document aggregation (A2) ──
    // Period struct: seq first (unique per group → sort_array total order).
    val periodStruct = struct(
      col("pmt_prd_premium_seq").as("pmt_prd_premium_seq"),
      Casts.reqInt(col("l_linenumber")).as("pmt_prd_seq"),
      Casts.reqInt(floor(col("l_quantity"))).as("pmt_prd_outstanding"),
      Casts.reqMoney(col("l_extendedprice")).as("pmt_prd_premium_amount"),
      Casts
        .reqMoney(when(col("l_returnflag") === lit("N"), col("l_extendedprice"))
          .otherwise(lit(0)))
        .as("pmt_prd_premium_amount_life"),
      (Casts.asMoney(col("l_extendedprice")) * Casts.asMoney(col("l_discount")))
        .cast(Casts.Money)
        .as("pmt_prd_investment_premium"),
      Docs
        .decode(concat(col("l_returnflag"), col("l_linestatus")), StatusCodes, "99")
        .as("pmt_prd_status"),
      Docs.isoOffsetMidnight(col("trx_dt")).as("pmt_prd_trx_datetime"),
      Docs
        .isoOffsetMidnight(date_format(date_add(col("l_shipdate"), 30), "yyyy-MM-dd"))
        .as("pmt_prd_next_due_datetime"),
      concat(lit("R"), col("l_orderkey").cast(StringType), lit("_"),
        col("l_linenumber").cast(StringType)).as("pmt_prd_receipt_no"),
      // Corrected golden semantics (PMT_KAL_…_New.json:32-37): each period
      // carries only its own relevant rider, not the whole payment's list.
      when(col("l_returnflag") === lit("R"),
        array(struct(
          concat_ws("_", col("l_orderkey").cast(StringType),
            col("pmt_prd_premium_seq").cast(StringType)).as("rid_number"),
          Casts.asMoney(col("l_extendedprice")).as("rid_amount"))))
        .otherwise(array().cast(ArrayType(StructType(Seq(
          StructField("rid_number", StringType),
          StructField("rid_amount", Casts.Money))))))
        .as("payment_premium_type_riders"),
      // Literal endorsement placeholder (reference :244-249, F11).
      array(struct(Casts.ReqNullStr.as("endo_code"), Casts.ReqNullDec.as("endo_amount")))
        .as("payment_premium_type_endorsements"))

    val docs = withHeader
      .groupBy(
        col("l_orderkey"),
        col("o_custkey"),
        col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_orderdate_str"),
        col("o_totalprice_dec"))
      .agg(
        sort_array(collect_list(periodStruct)).as("payment_period_seqs"),
        first(col("payment_riders")).as("payment_riders"),
        sum(Casts.asMoney(col("l_extendedprice"))).cast(Casts.Money).as("pmt_total_amount"),
        count(lit(1)).cast(IntegerType).as("pmt_period_count"))

    // ── Stage 7: dims (J3 ×3, broadcast) + header derivation (W3/F7/F8) ──
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name").as("customer_name"), col("c_nationkey"))
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name").as("nation_name"), col("n_regionkey"))
    val region = Tables.region(spark, dir)
      .select(col("r_regionkey"), col("r_name").as("region_name"))

    val runIdx = Windows.sequenceWithin(
      Seq(col("l_orderkey")),
      Seq(col("o_custkey"), col("o_orderdate_str")))

    val withDims = Relational
      .dimJoin(docs, customer, col("o_custkey") === col("c_custkey"))
      .drop("c_custkey")
    val withNation = Relational
      .dimJoin(withDims, nation, col("c_nationkey") === col("n_nationkey"))
      .drop("c_nationkey", "n_nationkey")
    val withRegion = Relational
      .dimJoin(withNation, region, col("n_regionkey") === col("r_regionkey"))
      .drop("n_regionkey", "r_regionkey")

    val header = withRegion
      .withColumn("pmt_refer_code_of_company",
        Windows.businessKey("PMT_KAL_", col("l_orderkey"), runIdx))
      .withColumn("pmt_policy_no", concat(lit("POL_"), col("o_custkey").cast(StringType)))
      .withColumn("pmt_priority_code",
        Docs.decode(col("o_orderpriority"), PriorityCodes, "99"))
      .withColumn("pmt_status", Casts.reqString(col("o_orderstatus")))
      .withColumn("pmt_effective_datetime", Docs.isoOffsetMidnight(col("o_orderdate_str")))
      .withColumn("record_version", lit("1"))
      .withColumn("source_system", lit("IBS"))

    // ── Stage 8: final projection + content-hash id (P1 + F16) ──
    header
      .withColumn("id",
        Docs.contentId(
          col("pmt_refer_code_of_company"),
          col("pmt_policy_no"),
          col("pmt_status"),
          col("pmt_priority_code"),
          col("pmt_effective_datetime"),
          col("pmt_total_amount"),
          col("pmt_period_count")))
      .select(
        col("pmt_refer_code_of_company"),
        col("pmt_policy_no"),
        col("pmt_status"),
        col("pmt_priority_code"),
        col("pmt_effective_datetime"),
        col("pmt_total_amount"),
        col("pmt_period_count"),
        col("customer_name"),
        col("nation_name"),
        col("region_name"),
        col("record_version"),
        col("source_system"),
        col("payment_riders"),
        col("payment_period_seqs"),
        col("id"))
  }

  /** Typed boundary: the same pipeline as a `Dataset[PaymentDoc]` — the
    * compiler checks the document contract (field names, nullability via
    * Option, decimal money) instead of tests discovering drift at runtime.
    */
  def typed(spark: SparkSession, dir: String, params: RunParams): Dataset[PaymentDoc] = {
    import spark.implicits._
    apply(spark, dir, params).as[PaymentDoc]
  }

  /** Oracle-comparable flattening of the nested document: sub-arrays are
    * rendered as canonical digest strings (deterministic order, decimal
    * rendering) that the DuckDB oracle reproduces with
    * `array_to_string(list(… ORDER BY …))`.
    */
  def flattened(spark: SparkSession, dir: String, params: RunParams): DataFrame = {
    val nested = apply(spark, dir, params)
    nested
      .withColumn("periods_digest",
        array_join(
          transform(col("payment_period_seqs"), p =>
            concat_ws(";",
              p.getField("pmt_prd_premium_seq").cast(StringType),
              p.getField("pmt_prd_seq").cast(StringType),
              p.getField("pmt_prd_outstanding").cast(StringType),
              p.getField("pmt_prd_premium_amount").cast(StringType),
              p.getField("pmt_prd_premium_amount_life").cast(StringType),
              p.getField("pmt_prd_investment_premium").cast(StringType),
              p.getField("pmt_prd_status"),
              p.getField("pmt_prd_trx_datetime"),
              p.getField("pmt_prd_next_due_datetime"),
              p.getField("pmt_prd_receipt_no"),
              array_join(
                transform(p.getField("payment_premium_type_riders"), r =>
                  concat_ws(",", r.getField("rid_number"),
                    r.getField("rid_amount").cast(StringType))),
                "~"),
              array_join(
                transform(p.getField("payment_premium_type_endorsements"), e =>
                  concat_ws(",", e.getField("endo_code"),
                    e.getField("endo_amount").cast(StringType))),
                "~"))),
          "||"))
      .withColumn("riders_digest",
        coalesce(
          array_join(
            transform(col("payment_riders"), r =>
              concat_ws(",", r.getField("rid_seq").cast(StringType),
                r.getField("rid_number"), r.getField("rid_amount").cast(StringType))),
            "~"),
          lit("")))
      .select(
        col("pmt_refer_code_of_company"),
        col("pmt_policy_no"),
        col("pmt_status"),
        col("pmt_priority_code"),
        col("pmt_effective_datetime"),
        col("pmt_total_amount").cast(DoubleType).as("pmt_total_amount"),
        col("pmt_period_count"),
        col("customer_name"),
        col("nation_name"),
        col("region_name"),
        col("record_version"),
        col("source_system"),
        col("riders_digest"),
        col("periods_digest"),
        col("id"))
      .transform(Relational.orderedOnce(col("pmt_refer_code_of_company")))
  }
}
