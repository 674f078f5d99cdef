package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.{OrdinaryPayment, RunParams, WorkflowType}

/** Regenerates the checked-in golden payment document
  * (src/test/resources/golden_payment_doc.json): the first document (by
  * business key) of the sf0.001 pipeline run that carries a rider, rendered
  * as canonical JSON (schema field order, decimal money, nested arrays) —
  * the engine's analogue of the reference's golden-output JSON diff
  * (`PMT_KAL_5776815_1_New.json`). PipelineSpec byte-compares against it;
  * run this main only to intentionally re-bless the contract.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/golden_payment_doc.json")
    val spark = graft.core.Sessions.local(4)
    import spark.implicits._
    val doc = OrdinaryPayment
      .typed(spark, "/root/testdata/sf0.001",
        RunParams(WorkflowType.OneTimeInforce, "1995-01-01", "2002-01-01"))
      .toDF()
      .where(size(col("payment_riders")) > 0)
      .orderBy(col("pmt_refer_code_of_company"))
      .limit(1)
    val json = doc.toJSON.head()
    val key = doc.select(col("pmt_refer_code_of_company")).as[String].head()
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), json)
    println(s"[golden] key=$key bytes=${json.length} -> $out")
    spark.stop()
  }
}
