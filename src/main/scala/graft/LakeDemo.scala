package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeWriter
import graft.orchestrate.Orchestrator
import graft.orchestrate.Orchestrator.JobSpec
import graft.pipeline.{OrdinaryPayment, RunParams, WorkflowType}

/** End-to-end lake demo (the reference's production shape): the
  * orchestrator dispatches per-table jobs by priority group; each job runs
  * a pipeline and appends run-index-partitioned parquet to the lake.
  * Usage: runMain graft.LakeDemo [sfDir] [runIndex]
  */
object LakeDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val runIndex = args.lift(1).map(_.toInt).getOrElse(1)
    val lakeRoot = args.lift(2).getOrElse(
      Files.createTempDirectory("graft-lake-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val jobs = Seq(
      JobSpec(1, "payment_documents", 1, parallelRun = false),
      JobSpec(2, "event_hourly", 2, parallelRun = true),
      JobSpec(3, "doc_quality", 2, parallelRun = true))

    val results = Orchestrator.run(jobs) { spec =>
      val df = spec.targetTable match {
        case "payment_documents" =>
          OrdinaryPayment.flattened(spark, sfDir,
            RunParams(WorkflowType.OneTimeInforce, "1995-01-01", "2002-01-01"))
        case "event_hourly" =>
          graft.streaming.Streams.eventsHourly(spark, sfDir)
        case "doc_quality" =>
          graft.ext.TextAnalysis.qualityFeatures(
            graft.core.Tables.documents(spark, sfDir), "text")
            .select(col("doc_id"), col("quality_score"))
      }
      val withIdx = df.withColumn("run_index",
        LakeWriter.runIndexKey(lit("20260812"), runIndex))
      LakeWriter.appendPartitioned(withIdx, s"$lakeRoot/${spec.targetTable}", "run_index")
    }

    results.foreach { r =>
      println(s"[lake-demo] ${r.spec.targetTable} priority=${r.spec.priority} " +
        s"parallel=${r.spec.parallelRun} outcome=${if (r.outcome.isSuccess) "OK" else s"FAILED: ${r.outcome.failed.get.getMessage}"} ${r.durationMs}ms")
    }
    println(s"[lake-demo] lake root: $lakeRoot")
    graft.core.Tables.all.take(0) // keep import
    new java.io.File(lakeRoot).listFiles().foreach { t =>
      val parts = Option(t.listFiles()).map(_.map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith(".")).sorted.mkString(", ")).getOrElse("")
      val n = spark.read.parquet(t.getAbsolutePath).count()
      println(s"[lake-demo] table=${t.getName} rows=$n partitions=[$parts]")
    }
    spark.stop()
  }
}
