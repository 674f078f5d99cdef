package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Casts, Tables}
import graft.ops.{Aggregates, Docs, Relational, Windows}
import graft.pipeline.{OrdinaryPayment, RunParams, WorkflowType}

/** Parity query catalog: one oracle-checked query per operator family in
  * SURVEY §2, retargeted at the TPC-H-ish testdata (FIXTURES.md §3).
  *
  * Oracle-compare conventions (the driver hash-compares values):
  *  - money aggregates are computed EXACTLY in decimal(18,2+) and presented
  *    as double — decimal sums are order-independent, so Spark's partial
  *    aggregation and DuckDB's serial sum agree bit-for-bit;
  *  - double→int always goes through floor() (Spark truncates double→int,
  *    DuckDB rounds — floor removes the divergence);
  *  - dates render as 'yyyy-MM-dd' strings (no date/timestamp phys-type
  *    ambiguity);
  *  - every result has a deterministic total-order ORDER BY.
  */
object ParityQueries {

  private def li(s: SparkSession, dir: String): DataFrame = Tables.lineitem(s, dir)
  private def ord(s: SparkSession, dir: String): DataFrame = Tables.orders(s, dir)

  /** q01 — A-aggregates (TPC-H Q1 shape): groupBy + exact decimal sums.
    * Reads through S1 catalog-by-name resolution (`spark.table("graft.
    * lineitem")`), the reference's `spark_session.table('db.tbl')` shape —
    * the scan below the name is the same pushdown-capable parquet relation.
    */
  def q01Agg(s: SparkSession, dir: String): DataFrame = {
    val one = Casts.asMoney(lit(1))
    Tables.catalogTable(s, dir, "lineitem")
      // raw-timestamp window (≡ date_format(...) <= '2000-12-01') so the
      // range predicate reaches the parquet row-group stats
      .filter(col("l_shipdate") < to_timestamp(lit("2000-12-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(Casts.asMoney(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(Casts.asMoney(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(Casts.asMoney(col("l_extendedprice")) * (one - Casts.asMoney(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(Casts.asMoney(col("l_extendedprice")) * (one - Casts.asMoney(col("l_discount")))
          * (one + Casts.asMoney(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .transform(Relational.orderedOnce(col("l_returnflag"), col("l_linestatus")))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE strftime(l_shipdate, '%Y-%m-%d') <= '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — A3 conditional sum (`sum(when(cond, x).otherwise(0))`),
    * the `pyspark_sum_function` pattern: per-order basic/rider/total.
    */
  def q02ConditionalSum(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        Aggregates.conditionalSum(col("l_returnflag") === lit("N"),
          Casts.asMoney(col("l_extendedprice"))).cast(DoubleType).as("basic_amount"),
        Aggregates.conditionalSum(col("l_returnflag") === lit("R"),
          Casts.asMoney(col("l_extendedprice"))).cast(DoubleType).as("rider_amount"),
        Aggregates.conditionalSum(Relational.inList(col("l_returnflag"), Seq("N", "R")),
          Casts.asMoney(col("l_extendedprice"))).cast(DoubleType).as("total_amount"))
      .transform(Relational.orderedOnce(col("l_orderkey")))

  val q02Sql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS basic_amount,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS rider_amount,
      |  CAST(sum(CASE WHEN l_returnflag IN ('N','R') THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS total_amount
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** q03 — J1/P6/P7: semi-join fact→status-filtered master + half-open date
    * window (the reference's One-Time-Inforce source selection).
    */
  def q03SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir).withColumn("trx_dt", date_format(col("l_shipdate"), "yyyy-MM-dd"))
    val o = ord(s, dir)
      .filter(Relational.inList(col("o_orderstatus"), OrdinaryPayment.InForceStatuses))
    Relational
      .semiJoin(
        l.filter(Relational.tsWindow(col("l_shipdate"), "1996-01-01", "1998-01-01")),
        o, l("l_orderkey") === o("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"), col("trx_dt"))
      .transform(Relational.orderedOnce(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
  }

  val q03Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice,
      |  strftime(l_shipdate, '%Y-%m-%d') AS trx_dt
      |FROM lineitem l
      |WHERE strftime(l_shipdate, '%Y-%m-%d') >= '1996-01-01'
      |  AND strftime(l_shipdate, '%Y-%m-%d') < '1998-01-01'
      |  AND EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus IN ('F','P'))
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** q04 — P8 as anti-join: fact rows whose policy is NOT in-force. */
  def q04AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val o = ord(s, dir)
      .filter(Relational.inList(col("o_orderstatus"), OrdinaryPayment.InForceStatuses))
    Relational
      .antiJoin(l, o, l("l_orderkey") === o("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
      .transform(Relational.orderedOnce(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
  }

  val q04Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice
      |FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus IN ('F','P'))
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** q05 — W1/W2/W3 + F4: deterministic row_number sequencing, business key,
    * sub-entity id.
    */
  def q05WindowSeq(s: SparkSession, dir: String): DataFrame = {
    val seq = Windows.sequenceWithin(
      Seq(col("l_orderkey")),
      Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
    li(s, dir)
      .withColumn("line_seq", seq)
      .withColumn("business_key", Windows.businessKey("PMT_KAL_", col("l_orderkey"), col("line_seq")))
      .withColumn("sub_id", Windows.subEntityId(col("l_orderkey"), col("line_seq")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("line_seq"), col("business_key"), col("sub_id"))
      .transform(Relational.orderedOnce(col("l_orderkey"), col("line_seq")))
  }

  val q05Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(row_number() OVER w AS INTEGER) AS line_seq,
      |  'PMT_KAL_' || l_orderkey::VARCHAR || '_' || (row_number() OVER w)::VARCHAR AS business_key,
      |  l_orderkey::VARCHAR || '_' || (row_number() OVER w)::VARCHAR AS sub_id
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey)
      |ORDER BY l_orderkey, line_seq""".stripMargin

  /** q06 — A1 + J2: sorted collect_list(struct) roll-up attached to the
    * header via left join (the rider pre-aggregation), rendered as a
    * canonical digest string.
    */
  def q06RollupCollect(s: SparkSession, dir: String): DataFrame = {
    val seq = Windows.sequenceWithin(
      Seq(col("l_orderkey")),
      Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
    val riders = li(s, dir)
      .filter(col("l_returnflag") === lit("R"))
      .withColumn("rid_seq", seq)
      .withColumn("rid_number", Windows.subEntityId(col("l_orderkey"), col("rid_seq")))
      .withColumn("rid_amount", Casts.asMoney(col("l_extendedprice")))
      .groupBy(col("l_orderkey").as("rid_orderkey"))
      .agg(Aggregates.collectSortedStructs(
        col("rid_seq").as("rid_seq"),
        col("rid_number").as("rid_number"),
        col("rid_amount").as("rid_amount")).as("riders"))
    val o = ord(s, dir)
    o.join(riders, o("o_orderkey") === riders("rid_orderkey"), "left")
      .select(
        col("o_orderkey"), col("o_orderstatus"),
        coalesce(
          array_join(
            transform(col("riders"), r =>
              concat_ws(",", r.getField("rid_seq").cast(StringType),
                r.getField("rid_number"), r.getField("rid_amount").cast(StringType))),
            "~"),
          lit("")).as("riders_digest"))
      .transform(Relational.orderedOnce(col("o_orderkey")))
  }

  val q06Sql: String =
    """WITH riders AS (
      |  SELECT l_orderkey,
      |    array_to_string(
      |      list(rid_seq::VARCHAR || ',' || rid_number || ',' || rid_amount::VARCHAR ORDER BY rid_seq),
      |      '~') AS riders_digest
      |  FROM (
      |    SELECT l_orderkey,
      |      row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rid_seq,
      |      l_orderkey::VARCHAR || '_' || row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey)::VARCHAR AS rid_number,
      |      CAST(l_extendedprice AS DECIMAL(18,2)) AS rid_amount
      |    FROM lineitem WHERE l_returnflag = 'R')
      |  GROUP BY l_orderkey)
      |SELECT o.o_orderkey, o.o_orderstatus, COALESCE(r.riders_digest, '') AS riders_digest
      |FROM orders o LEFT JOIN riders r ON o.o_orderkey = r.l_orderkey
      |ORDER BY o.o_orderkey""".stripMargin

  /** q07 — A4/A5: pivot aggregation + post-pivot derive/rename
    * (`all_from_gemini.txt:560-576`).
    */
  def q07PivotSum(s: SparkSession, dir: String): DataFrame = {
    val base = li(s, dir).withColumn("amount", Casts.asMoney(col("l_extendedprice")))
    Aggregates
      .pivotSum(base, Seq(col("l_orderkey")), "l_returnflag", Seq("N", "R", "A"), "amount")
      .withColumn("total", col("N") + col("R") + col("A"))
      .withColumnRenamed("N", "basic_amount")
      .withColumnRenamed("R", "rider_amount")
      .withColumnRenamed("A", "other_amount")
      .select(col("l_orderkey"),
        col("basic_amount").cast(DoubleType).as("basic_amount"),
        col("rider_amount").cast(DoubleType).as("rider_amount"),
        col("other_amount").cast(DoubleType).as("other_amount"),
        col("total").cast(DoubleType).as("total"))
      .transform(Relational.orderedOnce(col("l_orderkey")))
  }

  val q07Sql: String =
    """SELECT l_orderkey,
      |  CAST(COALESCE(sum(CASE WHEN l_returnflag='N' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS basic_amount,
      |  CAST(COALESCE(sum(CASE WHEN l_returnflag='R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS rider_amount,
      |  CAST(COALESCE(sum(CASE WHEN l_returnflag='A' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS other_amount,
      |  CAST(COALESCE(sum(CASE WHEN l_returnflag='N' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0)
      |     + COALESCE(sum(CASE WHEN l_returnflag='R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0)
      |     + COALESCE(sum(CASE WHEN l_returnflag='A' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS total
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** q08 — J3 ×3 broadcast dim joins + P4 role renames + F8 decode table. */
  def q08DimJoinDecode(s: SparkSession, dir: String): DataFrame = {
    val o = ord(s, dir)
    val customer = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name").as("customer_name"), col("c_nationkey"))
    val nation = Tables.nation(s, dir)
      .filter(Relational.trimmedSlice(lit("dim"), "dim", col("n_name")))
      .select(col("n_nationkey"), col("n_name").as("nation_name"), col("n_regionkey"))
    val region = Tables.region(s, dir)
      .select(col("r_regionkey"), col("r_name").as("region_name"))
    val joined = Relational.dimJoin(o, customer, o("o_custkey") === customer("c_custkey"))
    val withN = Relational.dimJoin(joined, nation, col("c_nationkey") === nation("n_nationkey"))
    val withR = Relational.dimJoin(withN, region, col("n_regionkey") === region("r_regionkey"))
    withR
      .withColumn("priority_code",
        Docs.decode(col("o_orderpriority"), OrdinaryPayment.PriorityCodes, "99"))
      .select(col("o_orderkey"), col("customer_name"), col("nation_name"),
        col("region_name"), col("priority_code"))
      .transform(Relational.orderedOnce(col("o_orderkey")))
  }

  val q08Sql: String =
    """SELECT o.o_orderkey, c.c_name AS customer_name, n.n_name AS nation_name,
      |  r.r_name AS region_name,
      |  CASE o.o_orderpriority WHEN '1-URGENT' THEN '01' WHEN '2-HIGH' THEN '02'
      |    WHEN '3-MEDIUM' THEN '03' WHEN '4-NOT SPECIFIED' THEN '04'
      |    WHEN '5-LOW' THEN '05' ELSE '99' END AS priority_code
      |FROM orders o
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN (SELECT * FROM nation WHERE trim('dim') = 'dim' AND trim(n_name) <> '') n
      |  ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY o.o_orderkey""".stripMargin

  /** q09 — S5/F1/F2/F5: run-index partition key derivation
    * (`pyspark_add_index_on_s3.py:31-41`): format_string over a
    * reparsed date. The write path itself is exercised in LakeWriterSpec.
    */
  def q09DateIndex(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("event_date",
        date_format(to_date(date_format(col("ts"), "yyyyMMdd"), "yyyyMMdd"), "yyyy-MM-dd"))
      .withColumn("run_index", format_string("%s_%s", col("event_date"), lit(1)))
      .select(col("event_id"), col("event_type"), col("event_date"), col("run_index"))
      .transform(Relational.orderedOnce(col("event_id")))

  val q09Sql: String =
    """SELECT event_id, event_type,
      |  strftime(strptime(strftime(ts, '%Y%m%d'), '%Y%m%d'), '%Y-%m-%d') AS event_date,
      |  strftime(strptime(strftime(ts, '%Y%m%d'), '%Y%m%d'), '%Y-%m-%d') || '_1' AS run_index
      |FROM events ORDER BY event_id""".stripMargin

  /** q10 — the flagship nested-document pipeline (SURVEY §3.1), flattened to
    * canonical digests for the oracle.
    */
  def q10Flagship(s: SparkSession, dir: String): DataFrame =
    OrdinaryPayment.flattened(s, dir,
      RunParams(WorkflowType.OneTimeInforce, "1996-01-01", "1998-01-01"))

  val q10Sql: String =
    """WITH fact AS (
      |  SELECT l.*, strftime(l.l_shipdate, '%Y-%m-%d') AS trx_dt,
      |    row_number() OVER (PARTITION BY l.l_orderkey ORDER BY l.l_linenumber, l.l_partkey, l.l_suppkey) AS prd_seq
      |  FROM lineitem l
      |  WHERE strftime(l.l_shipdate, '%Y-%m-%d') >= '1996-01-01'
      |    AND strftime(l.l_shipdate, '%Y-%m-%d') < '1998-01-01'
      |    AND EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
      |                AND o.o_orderstatus IN ('F','P'))),
      |periods AS (
      |  SELECT l_orderkey,
      |    array_to_string(list(
      |      prd_seq::VARCHAR || ';' || l_linenumber::VARCHAR || ';'
      |      || CAST(floor(l_quantity) AS INTEGER)::VARCHAR || ';'
      |      || CAST(l_extendedprice AS DECIMAL(18,2))::VARCHAR || ';'
      |      || CAST(CASE WHEN l_returnflag='N' THEN l_extendedprice ELSE 0 END AS DECIMAL(18,2))::VARCHAR || ';'
      |      || CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DECIMAL(18,2))::VARCHAR || ';'
      |      || CASE l_returnflag || l_linestatus WHEN 'AF' THEN '11' WHEN 'AO' THEN '12'
      |           WHEN 'NF' THEN '21' WHEN 'NO' THEN '22' WHEN 'RF' THEN '31' ELSE '99' END || ';'
      |      || trx_dt || 'T00:00:00+07:00' || ';'
      |      || strftime(l_shipdate + INTERVAL 30 DAY, '%Y-%m-%d') || 'T00:00:00+07:00' || ';'
      |      || 'R' || l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR || ';'
      |      || CASE WHEN l_returnflag='R'
      |           THEN l_orderkey::VARCHAR || '_' || prd_seq::VARCHAR || ','
      |                || CAST(l_extendedprice AS DECIMAL(18,2))::VARCHAR
      |           ELSE '' END || ';'
      |      || ',0.00'
      |      ORDER BY prd_seq), '||') AS periods_digest,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS pmt_total_amount,
      |    CAST(count(*) AS INTEGER) AS pmt_period_count
      |  FROM fact GROUP BY l_orderkey),
      |riders AS (
      |  SELECT l_orderkey,
      |    array_to_string(list(
      |      rid_seq::VARCHAR || ',' || rid_number || ',' || rid_amount::VARCHAR ORDER BY rid_seq),
      |      '~') AS riders_digest
      |  FROM (
      |    SELECT l_orderkey,
      |      row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rid_seq,
      |      l_orderkey::VARCHAR || '_' || row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey)::VARCHAR AS rid_number,
      |      CAST(l_extendedprice AS DECIMAL(18,2)) AS rid_amount
      |    FROM fact WHERE l_returnflag = 'R')
      |  GROUP BY l_orderkey)
      |SELECT
      |  'PMT_KAL_' || p.l_orderkey::VARCHAR || '_1' AS pmt_refer_code_of_company,
      |  'POL_' || o.o_custkey::VARCHAR AS pmt_policy_no,
      |  o.o_orderstatus AS pmt_status,
      |  CASE o.o_orderpriority WHEN '1-URGENT' THEN '01' WHEN '2-HIGH' THEN '02'
      |    WHEN '3-MEDIUM' THEN '03' WHEN '4-NOT SPECIFIED' THEN '04'
      |    WHEN '5-LOW' THEN '05' ELSE '99' END AS pmt_priority_code,
      |  strftime(o.o_orderdate, '%Y-%m-%d') || 'T00:00:00+07:00' AS pmt_effective_datetime,
      |  CAST(p.pmt_total_amount AS DOUBLE) AS pmt_total_amount,
      |  p.pmt_period_count,
      |  c.c_name AS customer_name,
      |  n.n_name AS nation_name,
      |  rg.r_name AS region_name,
      |  '1' AS record_version,
      |  'IBS' AS source_system,
      |  COALESCE(r.riders_digest, '') AS riders_digest,
      |  p.periods_digest,
      |  sha256(
      |    'PMT_KAL_' || p.l_orderkey::VARCHAR || '_1' || '|'
      |    || 'POL_' || o.o_custkey::VARCHAR || '|'
      |    || o.o_orderstatus || '|'
      |    || CASE o.o_orderpriority WHEN '1-URGENT' THEN '01' WHEN '2-HIGH' THEN '02'
      |         WHEN '3-MEDIUM' THEN '03' WHEN '4-NOT SPECIFIED' THEN '04'
      |         WHEN '5-LOW' THEN '05' ELSE '99' END || '|'
      |    || strftime(o.o_orderdate, '%Y-%m-%d') || 'T00:00:00+07:00' || '|'
      |    || p.pmt_total_amount::VARCHAR || '|'
      |    || p.pmt_period_count::VARCHAR) AS id
      |FROM periods p
      |JOIN orders o ON p.l_orderkey = o.o_orderkey
      |LEFT JOIN riders r ON p.l_orderkey = r.l_orderkey
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region rg ON n.n_regionkey = rg.r_regionkey
      |ORDER BY pmt_refer_code_of_company""".stripMargin

  /** q11 — scalar-function surface (F1-F15): date parse/format round-trips,
    * concat/trim/substring, when-chains, null-guarded casts.
    */
  def q11ScalarFuncs(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .withColumn("trx_dt", date_format(col("l_shipdate"), "yyyy-MM-dd"))
      .withColumn("compact_dt", date_format(to_date(col("trx_dt"), "yyyy-MM-dd"), "yyyyMMdd"))
      .withColumn("flag_code",
        when(col("l_returnflag") === lit("N"), lit("basic"))
          .when(col("l_returnflag") === lit("R"), lit("rider"))
          .otherwise(lit("other")))
      .withColumn("padded", substring(concat(lit("00000000"), col("l_orderkey").cast(StringType)), -8, 8))
      .withColumn("trimmed", trim(concat(lit("  "), col("l_returnflag"), lit("  "))))
      .withColumn("amount", Casts.reqMoney(col("l_extendedprice")).cast(DoubleType))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("trx_dt"), col("compact_dt"), col("flag_code"), col("padded"),
        col("trimmed"), col("amount"))
      .transform(Relational.orderedOnce(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))

  val q11Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  strftime(l_shipdate, '%Y-%m-%d') AS trx_dt,
      |  strftime(strptime(strftime(l_shipdate, '%Y-%m-%d'), '%Y-%m-%d'), '%Y%m%d') AS compact_dt,
      |  CASE WHEN l_returnflag = 'N' THEN 'basic' WHEN l_returnflag = 'R' THEN 'rider'
      |    ELSE 'other' END AS flag_code,
      |  right('00000000' || l_orderkey::VARCHAR, 8) AS padded,
      |  trim('  ' || l_returnflag || '  ') AS trimmed,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** q12 — sort/limit (top-k) with pinned tiebreaker. */
  def q12TopK(s: SparkSession, dir: String): DataFrame =
    ord(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q12Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** q13 — set operations: UNION (distinct), INTERSECT, EXCEPT. */
  def q13SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = ord(s, dir)
    val f = o.filter(col("o_orderstatus") === lit("F")).select(col("o_custkey"))
    val p = o.filter(col("o_orderstatus") === lit("P")).select(col("o_custkey"))
    val oo = o.filter(col("o_orderstatus") === lit("O")).select(col("o_custkey"))
    f.intersect(p).except(oo).union(f.union(p).distinct().except(f.intersect(p)))
      .distinct()
      .transform(Relational.orderedOnce(col("o_custkey")))
  }

  val q13Sql: String =
    """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus='F'),
      |p AS (SELECT o_custkey FROM orders WHERE o_orderstatus='P'),
      |oo AS (SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      |SELECT DISTINCT o_custkey FROM (
      |  SELECT * FROM ((SELECT * FROM f INTERSECT SELECT * FROM p)
      |                 EXCEPT SELECT * FROM oo)
      |  UNION
      |  SELECT * FROM ((SELECT * FROM f UNION SELECT * FROM p)
      |                 EXCEPT (SELECT * FROM f INTERSECT SELECT * FROM p)))
      |ORDER BY o_custkey""".stripMargin

  /** q14 — rollup (grouping-sets family; free via Spark built-ins, SURVEY
    * §2.4 note). Null grouping keys rendered as '(all)' for the compare.
    */
  def q14Rollup(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(Casts.asMoney(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
      .transform(Relational.orderedOnce(col("returnflag"), col("linestatus")))

  val q14Sql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |  COALESCE(l_linestatus, '(all)') AS linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** q15 — multi-way star join (TPC-H Q5 shape): one big-big shuffle
    * (lineitem ⋈ orders on orderkey) plus a broadcast dimension chain
    * (supplier → nation → region), date-windowed on the raw timestamp so
    * the range predicate reaches parquet row-group stats, exact decimal
    * revenue. Exercises the supplier table and the join-reorder surface.
    */
  def q15StarJoin(s: SparkSession, dir: String): DataFrame = {
    val one = Casts.asMoney(lit(1))
    val o = ord(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select(col("o_orderkey"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = Tables.region(s, dir)
      .filter(col("r_name") === lit("ASIA"))
      .select(col("r_regionkey"))
    li(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(Casts.asMoney(col("l_extendedprice"))
        * (one - Casts.asMoney(col("l_discount")))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .transform(Relational.orderedOnce(col("revenue").desc, col("n_name")))
  }

  val q15Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** q16 — cube + grouping_id (completes the grouping-sets family next to
    * q14's rollup). The grouping-id bit order (first grouped column = most
    * significant) matches DuckDB's GROUPING(a, b) — pinned by the oracle.
    */
  def q16Cube(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        sum(Casts.asMoney(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("gid"), col("sum_qty"), col("n_rows"))
      .transform(Relational.orderedOnce(col("gid"), col("returnflag"), col("linestatus")))

  val q16Sql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |  COALESCE(l_linestatus, '(all)') AS linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, returnflag, linestatus""".stripMargin

  /** q17 — correlated scalar subquery (TPC-H Q17 shape): lineitems below
    * 20% of their part's average quantity. Spelled as the decorrelated
    * plan Catalyst would produce: a per-part aggregate joined back —
    * the aggregate side is small (one row per part) and broadcast-able.
    * Parity note: avg(l_quantity) is exact (whole-number doubles sum
    * exactly), so the 0.2×avg threshold is bit-identical across engines.
    */
  def q17AvgSubquery(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val thresh = l
      .groupBy(col("l_partkey").as("t_partkey"))
      .agg((avg(col("l_quantity")) * lit(0.2)).as("qty_thresh"))
    val brandParts = Tables.part(s, dir)
      .filter(col("p_brand") === lit("Brand#1"))
      .select(col("p_partkey"))
    l.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .join(thresh, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg((sum(Casts.asMoney(col("l_extendedprice"))).cast(DoubleType) / lit(7.0))
        .as("avg_yearly"),
        count(lit(1)).as("n_rows"))

  }

  val q17Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n_rows
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** q18 — groupBy + HAVING semi-join (TPC-H Q18 shape): orders whose
    * total quantity exceeds a threshold, joined back for order detail.
    * The having-side aggregate shuffles once on orderkey; the join back
    * to orders is key-aligned.
    */
  def q18Having(s: SparkSession, dir: String): DataFrame = {
    val big = li(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(Casts.asMoney(col("l_quantity"))).as("sum_qty_dec"))
      .filter(col("sum_qty_dec") > lit(150))
      .select(col("l_orderkey"), col("sum_qty_dec").cast(DoubleType).as("sum_qty"))
    ord(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        Casts.asMoney(col("o_totalprice")).cast(DoubleType).as("totalprice"),
        col("sum_qty"))
      .transform(Relational.orderedOnce(col("o_orderkey")))
  }

  val q18Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
      |  CAST(sum_qty_dec AS DOUBLE) AS sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150) ON o_orderkey = l_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** q19 — analytic window-function suite: lag/lead, ntile, percent_rank,
    * cume_dist, rank over a deterministic total order within each return
    * flag. percent_rank/cume_dist are single rational divisions over a
    * unique ordering key, so they hash-match exactly. One window (one
    * shuffle + sort) serves every function.
    */
  def q19WindowSuite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (l_orderkey, l_linenumber) is NOT unique in this testdata — the
    // total order needs all four key columns or lag/lead are tie-broken
    // engine-arbitrarily.
    val key = Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(key: _*)
    li(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1998-06-01")))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_returnflag"), col("l_quantity"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"),
        lead(col("l_quantity"), 1).over(w).as("next_qty"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        rank().over(w).as("rk"))
      .transform(df => Relational.orderedOnce((col("l_returnflag") +: key): _*)(df))
  }

  val q19Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, l_quantity,
      |  lag(l_quantity, 1) OVER w AS prev_qty,
      |  lead(l_quantity, 1) OVER w AS next_qty,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  CAST(rank() OVER w AS INTEGER) AS rk
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-06-01'
      |WINDOW w AS (PARTITION BY l_returnflag
      |             ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey)
      |ORDER BY l_returnflag, l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** q20 — string-function suite over the documents corpus: edit distance
    * between adjacent docs (classic Levenshtein, integer-exact in both
    * engines), translate, reverse, ascii — all codegen'd built-ins, no
    * UDFs. The self-join on doc_id+1 is key-aligned (one shuffle).
    */
  def q20StringSuite(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    // The corpus is a single parquet split; without an explicit
    // repartition the broadcast self-join stays one partition and the
    // O(len²) Levenshtein DP runs single-core (8 s → 0.4 s at sf0.1).
    val a = d.select(col("doc_id"), col("text").as("text_a"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val b = d.select((col("doc_id") - lit(1L)).as("doc_id"), col("text").as("text_b"))
    a.join(b, Seq("doc_id"))
      .select(
        col("doc_id"),
        levenshtein(col("text_a"), col("text_b")).as("edit_dist"),
        length(translate(col("text_a"), "aeiou", "")).as("no_vowel_len"),
        substring(reverse(col("text_a")), 1, 12).as("rev_prefix"),
        ascii(col("text_a")).as("first_byte"))
      .transform(Relational.orderedOnce(col("doc_id")))
  }

  val q20Sql: String =
    """SELECT a.doc_id,
      |  CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist,
      |  CAST(length(replace(replace(replace(replace(replace(a.text,
      |    'a',''), 'e',''), 'i',''), 'o',''), 'u','')) AS INTEGER) AS no_vowel_len,
      |  substring(reverse(a.text), 1, 12) AS rev_prefix,
      |  CAST(ascii(a.text) AS INTEGER) AS first_byte
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY a.doc_id""".stripMargin

  /** q21 — arbitrary GROUPING SETS through the spark.sql TEXT surface over
    * catalog-registered tables (S1 name resolution + the SQL entry point
    * the reference's notebooks use): sets ((flag), (status), ()) — not
    * expressible as rollup/cube — against the same DuckDB spelling.
    */
  def q21GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.catalogTable(s, dir, "lineitem") // ensure registration
    val db = Tables.dbFor(dir)
    s.sql(
      s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
         |  COALESCE(l_linestatus, '(all)') AS linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  count(*) AS n_rows
         |FROM $db.lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
      .transform(Relational.orderedOnce(col("returnflag"), col("linestatus")))
  }

  val q21Sql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |  COALESCE(l_linestatus, '(all)') AS linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  /** q22 — EXISTS subquery (TPC-H Q4 shape): orders with at least one
    * line shipped after the order date, counted per priority. The
    * DataFrame spelling is the decorrelated plan: a left-semi join on the
    * key with the correlated predicate as join condition.
    */
  def q22Exists(s: SparkSession, dir: String): DataFrame = {
    val o = ord(s, dir)
    val l = li(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
      col("o_orderkey") === col("l_orderkey")
        && col("l_shipdate") > col("o_orderdate"),
      "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .transform(Relational.orderedOnce(col("o_orderpriority")))
  }

  val q22Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q23 — correlated MIN subquery (TPC-H Q2 shape): each order's
    * cheapest line(s). Decorrelated: per-key min aggregate joined back on
    * (key, value) — both shuffles key-aligned.
    */
  def q23MinSubquery(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val mins = l.groupBy(col("l_orderkey").as("m_orderkey"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    l.join(mins,
      col("l_orderkey") === col("m_orderkey")
        && col("l_extendedprice") === col("min_price"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"),
        Casts.asMoney(col("l_extendedprice")).cast(DoubleType).as("price"))
      .transform(Relational.orderedOnce(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey")))
  }

  val q23Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM lineitem l
      |WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM lineitem l2
      |                         WHERE l2.l_orderkey = l.l_orderkey)
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** q24 — TPC-H Q14 shape: promo revenue share over a date window.
    * Numerator and denominator are exact decimal sums (order-independent
    * partial aggregation); the ratio divides the two exact doubles, so
    * both engines compute the identical IEEE quotient.
    */
  def q24PromoRatio(s: SparkSession, dir: String): DataFrame = {
    val one = Casts.asMoney(lit(1))
    val revenue = Casts.asMoney(col("l_extendedprice")) *
      (one - Casts.asMoney(col("l_discount")))
    li(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === lit("PROMO"), revenue)
          .otherwise(Casts.asMoney(lit(0)))).cast(DoubleType).as("promo_revenue"),
        sum(revenue).cast(DoubleType).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100.0) * col("promo_revenue") / col("total_revenue"))
          .as("promo_pct"))
  }

  val q24Sql: String =
    """SELECT
      |  CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
      |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |   / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin

  /** q25 — TPC-H Q19 shape: equi-join with a DISJUNCTIVE residual (OR of
    * brand/size/quantity bands). The planner must keep l_partkey =
    * p_partkey as the join key and evaluate the OR as a post-join filter
    * — never a cartesian (PlanQualitySpec covers the whole catalog).
    */
  def q25DisjunctiveJoin(s: SparkSession, dir: String): DataFrame = {
    val one = Casts.asMoney(lit(1))
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val branches =
      (col("p_brand") === lit("Brand#13") && col("p_size").between(1, 15)
        && col("l_quantity").between(1, 20)) ||
      (col("p_brand") === lit("Brand#19") && col("p_size").between(10, 30)
        && col("l_quantity").between(10, 35)) ||
      (col("p_type") === lit("PROMO") && col("p_size").between(20, 50)
        && col("l_quantity").between(20, 50))
    li(s, dir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey") && branches)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(Casts.asMoney(col("l_extendedprice"))
          * (one - Casts.asMoney(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
  }

  val q25Sql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey AND (
      |  (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity BETWEEN 1 AND 20) OR
      |  (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
      |    AND l_quantity BETWEEN 10 AND 35) OR
      |  (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50
      |    AND l_quantity BETWEEN 20 AND 50))""".stripMargin

  /** Registry consumed by SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_promo_ratio" -> (q24PromoRatio _),
    "q25_disjunctive_join" -> (q25DisjunctiveJoin _),
    "q22_exists" -> (q22Exists _),
    "q23_min_subquery" -> (q23MinSubquery _),
    "q15_star_join" -> (q15StarJoin _),
    "q21_grouping_sets" -> (q21GroupingSets _),
    "q16_cube" -> (q16Cube _),
    "q17_avg_subquery" -> (q17AvgSubquery _),
    "q18_having" -> (q18Having _),
    "q19_window_suite" -> (q19WindowSuite _),
    "q20_string_suite" -> (q20StringSuite _),
    "q01_agg" -> (q01Agg _),
    "q02_conditional_sum" -> (q02ConditionalSum _),
    "q03_semi_join" -> (q03SemiJoin _),
    "q04_anti_join" -> (q04AntiJoin _),
    "q05_window_seq" -> (q05WindowSeq _),
    "q06_rollup_collect" -> (q06RollupCollect _),
    "q07_pivot_sum" -> (q07PivotSum _),
    "q08_dim_join_decode" -> (q08DimJoinDecode _),
    "q09_date_index" -> (q09DateIndex _),
    "q10_flagship_document" -> (q10Flagship _),
    "q11_scalar_funcs" -> (q11ScalarFuncs _),
    "q12_topk" -> (q12TopK _),
    "q13_setops" -> (q13SetOps _),
    "q14_rollup" -> (q14Rollup _))

  val oracles: Map[String, String] = Map(
    "q24_promo_ratio" -> q24Sql,
    "q25_disjunctive_join" -> q25Sql,
    "q22_exists" -> q22Sql,
    "q23_min_subquery" -> q23Sql,
    "q15_star_join" -> q15Sql,
    "q21_grouping_sets" -> q21Sql,
    "q16_cube" -> q16Sql,
    "q17_avg_subquery" -> q17Sql,
    "q18_having" -> q18Sql,
    "q19_window_suite" -> q19Sql,
    "q20_string_suite" -> q20Sql,
    "q01_agg" -> q01Sql,
    "q02_conditional_sum" -> q02Sql,
    "q03_semi_join" -> q03Sql,
    "q04_anti_join" -> q04Sql,
    "q05_window_seq" -> q05Sql,
    "q06_rollup_collect" -> q06Sql,
    "q07_pivot_sum" -> q07Sql,
    "q08_dim_join_decode" -> q08Sql,
    "q09_date_index" -> q09Sql,
    "q10_flagship_document" -> q10Sql,
    "q11_scalar_funcs" -> q11Sql,
    "q12_topk" -> q12Sql,
    "q13_setops" -> q13Sql,
    "q14_rollup" -> q14Sql)
}
