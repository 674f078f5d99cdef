package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeWriter
import graft.orchestrate.Orchestrator
import graft.orchestrate.Orchestrator.DagJob
import graft.pipeline.{OrdinaryPayment, RunParams, WorkflowType}

/** End-to-end lake demo (the reference's production shape, upgraded to
  * dependency-DAG dispatch): each job starts when ITS dependencies
  * finish — the event and document jobs don't wait behind the flagship
  * pipeline the way a priority barrier would make them. Jobs append
  * run-index-partitioned parquet to the lake; the corpus job ingests
  * documents through the incremental dedup state; maintenance compacts
  * behind its producer. Usage: runMain graft.LakeDemo [sfDir] [runIndex]
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

    val corpusState = s"$lakeRoot/corpus_state"

    // True dependencies, not barrier groups: everything gates on the
    // data-quality check; compaction gates on its producer only.
    val jobs = Seq(
      DagJob("dq_gate"),
      DagJob("payment_documents", Set("dq_gate")),
      DagJob("event_hourly", Set("dq_gate")),
      DagJob("doc_quality", Set("dq_gate")),
      DagJob("user_state_scd2", Set("dq_gate")),
      DagJob("corpus_dedup", Set("dq_gate")),
      DagJob("compact_doc_quality", Set("doc_quality")),
      DagJob("corpus_maintenance", Set("corpus_dedup")))

    val results = Orchestrator.runDag(jobs, maxConcurrentThreads = 3,
      maxAttempts = 2) { job =>
      def append(df: org.apache.spark.sql.DataFrame, table: String): Unit =
        LakeWriter.appendPartitioned(
          df.withColumn("run_index", LakeWriter.runIndexKey(lit("20260812"), runIndex)),
          s"$lakeRoot/$table", "run_index")
      job.id match {
        case "dq_gate" =>
          import graft.ops.DataQuality._
          assertClean(graft.core.Tables.orders(spark, sfDir), Seq(
            NotNull("o_orderkey"), Unique(Seq("o_orderkey")),
            Accepted("o_orderstatus", Seq("O", "F", "P"))))
        case "payment_documents" =>
          append(OrdinaryPayment.flattened(spark, sfDir,
            RunParams(WorkflowType.OneTimeInforce, "1995-01-01", "2002-01-01")),
            "payment_documents")
        case "event_hourly" =>
          append(graft.streaming.Streams.eventsHourly(spark, sfDir), "event_hourly")
        case "doc_quality" =>
          append(graft.ext.TextAnalysis.qualityFeatures(
            graft.core.Tables.documents(spark, sfDir), "text")
            .select(col("doc_id"), col("quality_score")), "doc_quality")
        case "user_state_scd2" =>
          graft.streaming.Streams.scd2IngestStreaming(
            spark, sfDir, s"$lakeRoot/user_state")
          ()
        case "corpus_dedup" =>
          val stats = graft.ext.IncrementalDedup.ingest(
            graft.core.Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
            "doc_id", "text", corpusState)
          println(s"[lake-demo] corpus_dedup accepted=${stats.accepted} " +
            s"dupsWithin=${stats.dupsWithinDelivery} dupsVsCorpus=${stats.dupsVsCorpus}")
        case "compact_doc_quality" =>
          val n = LakeWriter.compact(spark, s"$lakeRoot/doc_quality",
            targetBytes = 256L * 1024 * 1024, partitionCols = Seq("run_index"))
          println(s"[lake-demo] compacted doc_quality (hive layout kept, ~$n file budget)")
        case "corpus_maintenance" =>
          // policy-driven: fold the delta chain / small files only when a
          // signal trips, then reclaim unreferenced version dirs.
          // compactState holds the same writer lock as ingest, reconciles
          // any crashed publish before touching versions, and re-stamps
          // the bands sync marker so the version bump from compaction is
          // not mistaken for a crash at the next ingest.
          val compacted =
            graft.ext.IncrementalDedup.compactState(spark, corpusState)
          if (compacted.isEmpty)
            println("[lake-demo] corpus healthy, no compaction")
          else println(s"[lake-demo] corpus compacted: ${compacted.mkString(", ")}")
      }
    }

    results.foreach { r =>
      println(s"[lake-demo] ${r.id} outcome=${
        if (r.skipped) "SKIPPED"
        else if (r.outcome.isSuccess) "OK"
        else s"FAILED: ${r.outcome.failed.get.getMessage}"} ${r.durationMs}ms")
    }
    println(s"[lake-demo] lake root: $lakeRoot")
    new java.io.File(lakeRoot).listFiles().sortBy(_.getName).foreach { t =>
      if (t.getName == "corpus_state") {
        val n = graft.ext.IncrementalDedup
          .survivors(spark, corpusState, "doc_id", "text").count()
        println(s"[lake-demo] table=corpus_state/survivors rows=$n " +
          s"(versioned manifest: ${graft.lake.Versioned.manifest(s"$corpusState/survivors")})")
      } else {
        val parts = Option(t.listFiles()).map(_.map(_.getName)
          .filter(n => !n.startsWith("_") && !n.startsWith(".")).sorted.mkString(", ")).getOrElse("")
        val n = spark.read.parquet(t.getAbsolutePath).count()
        println(s"[lake-demo] table=${t.getName} rows=$n partitions=[$parts]")
      }
    }
    spark.stop()
  }
}
