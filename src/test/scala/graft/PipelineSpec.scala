package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{OrdinaryPayment, RunParams, WorkflowType}

/** Flagship-pipeline semantic pins, modeled on the golden-output diff
  * (`PMT_KAL_5776815_1.json` vs `PMT_KAL_5776815_1_New.json` — SURVEY §5):
  * per-period rider arrays carry only the period's own rider; amount =
  * basic+rider grain total, amount_life = basic only.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val doc = OrdinaryPayment(spark, sfDir,
    RunParams(WorkflowType.OneTimeInforce, "1995-01-01", "2002-01-01")).cache()

  test("flagship entry produces documents (driver t1 smoke)") {
    assert(doc.count() > 0)
  }

  test("golden document: canonical JSON byte-equality against checked-in fixture") {
    // The engine's analogue of the reference's golden-output diff
    // (PMT_KAL_5776815_1_New.json): one full nested document, rendered as
    // canonical JSON, compared byte-for-byte. Re-bless intentionally via
    // `runMain graft.tools.GoldenGen`.
    val expected = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/test/resources/golden_payment_doc.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val key = "\"pmt_refer_code_of_company\":\"([^\"]+)\"".r
      .findFirstMatchIn(expected).get.group(1)
    val actual = OrdinaryPayment
      .typed(spark, sfDir, RunParams(WorkflowType.OneTimeInforce, "1995-01-01", "2002-01-01"))
      .toDF()
      .where($"pmt_refer_code_of_company" === key)
      .toJSON.head()
    assert(actual === expected)
  }

  test("business keys are unique and follow the PMT_KAL_<id>_<run> format") {
    val keys = doc.select($"pmt_refer_code_of_company").as[String].collect()
    assert(keys.distinct.length === keys.length)
    assert(keys.forall(_.matches("PMT_KAL_\\d+_\\d+")))
  }

  test("periods are sorted by sequence and sequences are 1..n per document") {
    val seqs = doc.select(
      transform($"payment_period_seqs", p => p.getField("pmt_prd_premium_seq")).as("s"))
      .as[Seq[Int]].collect()
    assert(seqs.forall(s => s === (1 to s.size)))
  }

  test("corrected golden semantics: period rider array has the period's own rider only") {
    val rows = doc.select(explode($"payment_period_seqs").as("p"))
      .select(
        $"p.pmt_prd_status".as("status"),
        size($"p.payment_premium_type_riders").as("n_riders"))
      .as[(String, Int)].collect()
    // status '31'/'99' encodes returnflag R (rider periods) in the decode
    // table; rider periods carry exactly 1 rider, others 0.
    assert(rows.forall { case (_, n) => n == 0 || n == 1 })
    assert(rows.exists(_._2 == 1))
  }

  test("amount_life (basic only) never exceeds amount (basic + rider)") {
    val bad = doc.select(explode($"payment_period_seqs").as("p"))
      .where($"p.pmt_prd_premium_amount_life" > $"p.pmt_prd_premium_amount")
      .count()
    assert(bad === 0)
  }

  test("every document carries the literal endorsement placeholder") {
    val n = doc.select(explode($"payment_period_seqs").as("p"))
      .where(size($"p.payment_premium_type_endorsements") =!= 1)
      .count()
    assert(n === 0)
  }

  test("content-hash ids are unique per document") {
    val ids = doc.select($"id").as[String].collect()
    assert(ids.distinct.length === ids.length)
    assert(ids.forall(_.length == 64))
  }

  test("typed Dataset[PaymentDoc] boundary round-trips the document contract") {
    val docs = OrdinaryPayment.typed(spark, sfDir,
      RunParams(WorkflowType.OneTimeInforce, "1996-01-01", "1998-01-01"))
    val d = docs.head()
    assert(d.pmt_refer_code_of_company.startsWith("PMT_KAL_"))
    assert(d.payment_period_seqs.nonEmpty)
    assert(d.payment_period_seqs.forall(p =>
      p.pmt_prd_premium_amount.scale == 2
        && p.payment_premium_type_endorsements.size == 1))
    assert(docs.count() > 0)
  }

  test("workflow branches partition the fact: inforce + noninforce = daily") {
    def count(w: WorkflowType) = OrdinaryPayment(spark, sfDir,
      RunParams(w, "1996-01-01", "1998-01-01")).count()
    val daily = count(WorkflowType.Daily)
    val in = count(WorkflowType.OneTimeInforce)
    val out = count(WorkflowType.OneTimeNonInforce)
    assert(in + out === daily)
  }
}
