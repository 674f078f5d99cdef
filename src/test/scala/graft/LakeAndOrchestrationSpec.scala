package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.lake.LakeWriter
import graft.orchestrate.Orchestrator
import graft.orchestrate.Orchestrator.JobSpec

/** Lake-writer (S3-S7) and orchestrator (O1-O6) specs, pinned to the
  * reference fixtures: the partition-write fixture
  * (`pyspark_add_index_on_s3.py:20-25`, expected layout
  * `transactiondate_index=2026-01-23_1/`) and the 7-job/3-priority
  * job-control fixture (`test_glue_job.ipynb` cell `9a918133`).
  */
class LakeAndOrchestrationSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture = Seq(
    (1L, "widget", 100L, 20260123),
    (2L, "gadget", 200L, 20260123),
    (3L, "doohickey", 300L, 20260123)).toDF("id", "product", "amount", "transactiondate")

  test("partitioned writes rebalance: hint resolves and a hot folder splits") {
    // Plain repartition(partitionCol) serializes a hot partition value
    // into one writer task (AQE never splits user-specified hash
    // partitioning); the writers must go through the REBALANCE hint. A
    // typo'd hint name silently no-ops with a warning, so pin BOTH the
    // plan node and the behavior.
    val ss = spark.newSession()
    graft.core.Sessions.tune(ss)
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    ss.conf.set("spark.sql.adaptive.rebalancePartitionsSmallPartitionFactor", "0.2")
    import ss.implicits._
    // ~90% of rows in one folder, payload large enough to exceed several
    // 64 KB advisory partitions
    val df = ss.range(20000)
      .select(
        (when($"id" < 18000, lit("hot")).otherwise(lit("cold"))).as("part"),
        concat(lit("x" * 200), $"id".cast("string")).as("payload"))
    // plan shape: the hint must survive analysis as RebalancePartitions
    val hinted = df.hint("rebalance", col("part"))
    assert(hinted.queryExecution.optimizedPlan.toString.contains("RebalancePartitions"),
      "rebalance hint did not resolve — writers would fall back to single-task folders")
    val out = Files.createTempDirectory("graft-rebal").toString + "/t"
    LakeWriter.appendPartitioned(df.toDF(), out, "part")
    val hotFiles = new java.io.File(s"$out/part=hot").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(hotFiles > 1,
      s"hot folder written by a single task ($hotFiles file) — skew split did not engage")
    // and the data is intact
    assert(ss.read.parquet(out).count() === 20000L)
  }

  test("run-index partition write produces the reference layout and survives read-back") {
    val out = Files.createTempDirectory("graft-lake").toString
    val df = writeFixture.withColumn("transactiondate_index",
      LakeWriter.runIndexKey($"transactiondate", 1))
    assert(df.select($"transactiondate_index").distinct().as[String].collect()
      === Array("2026-01-23_1"))
    LakeWriter.appendPartitioned(df, out, "transactiondate_index")
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    assert(dirs.toSeq === Seq("transactiondate_index=2026-01-23_1"))
    val back = LakeWriter.readBack(df, out)
    assert(back.count() === 3)
    assert(back.schema("transactiondate_index").dataType.typeName === "string")
  }

  test("append mode re-runs land in new run-index folders without overwriting") {
    val out = Files.createTempDirectory("graft-lake2").toString
    (1 to 2).foreach { run =>
      val df = writeFixture.withColumn("transactiondate_index",
        LakeWriter.runIndexKey($"transactiondate", run))
      LakeWriter.appendPartitioned(df, out, "transactiondate_index")
    }
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).sorted
    assert(dirs.toSeq === Seq(
      "transactiondate_index=2026-01-23_1", "transactiondate_index=2026-01-23_2"))
    assert(LakeWriter.readBack(writeFixture, out).count() === 6)
  }

  test("maxRecordsPerFile bounds output file sizes (debug small-file setting)") {
    val out = Files.createTempDirectory("graft-lake3").toString
    val df = spark.range(1000).toDF("id")
      .withColumn("part", lit("2026-01-23_1"))
    LakeWriter.appendPartitioned(df, out, "part", maxRecordsPerFile = 100L)
    val files = new java.io.File(s"$out/part=2026-01-23_1").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.length >= 10, s"expected >=10 bounded files, got ${files.length}")
  }

  test("JSON document sink round-trips the nested flagship shape") {
    val out = Files.createTempDirectory("graft-json").toString
    val docs = Seq((1L, Seq((1, "a"), (2, "b")))).toDF("id", "periods")
    LakeWriter.writeJsonDocuments(docs, out)
    assert(spark.read.json(out).count() === 1)
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    val dir = Files.createTempDirectory("graft-dyn").toString + "/t"
    Seq((1L, "p1"), (2L, "p2"), (3L, "p3")).toDF("v", "part")
      .write.partitionBy("part").parquet(dir)
    // re-run delivers ONLY p2, with corrected data
    LakeWriter.overwritePartitionsDynamic(
      Seq((20L, "p2")).toDF("v", "part"), dir, "part")
    val out = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(out === Set((1L, "p1"), (20L, "p2"), (3L, "p3")),
      "siblings must survive; p2 must be replaced, not appended")
  }

  test("compaction collapses a fragmented directory, preserving content exactly") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = spark.range(100000L).select(
      col("id"), (col("id") % 7).as("grp"), concat(lit("row_"), col("id")).as("payload"))
    // fragment: tiny maxRecordsPerFile -> many small files
    df.repartition(8).write.option("maxRecordsPerFile", 2000L).parquet(dir)
    val before = spark.read.parquet(dir)
    val filesBefore = before.inputFiles.length
    assert(filesBefore >= 50, s"fixture not fragmented: $filesBefore files")
    val sumBefore = before.agg(sum(col("id"))).head().getLong(0)

    val nFiles = LakeWriter.compact(spark, dir, targetBytes = 1L * 1024 * 1024)
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length === nFiles)
    assert(after.inputFiles.length < filesBefore / 5,
      s"compaction barely helped: ${after.inputFiles.length} vs $filesBefore")
    assert(after.count() === 100000L)
    assert(after.agg(sum(col("id"))).head().getLong(0) === sumBefore)
    assert(after.select("id").distinct().count() === 100000L)
    // staging/backup directories are gone (atomic swap completed)
    assert(!new java.io.File(dir + ".compacting").exists())
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("partition-pruned reads scan only the matching run-index folder") {
    val out = Files.createTempDirectory("graft-prune").toString
    (1 to 3).foreach { run =>
      val df = writeFixture.withColumn("transactiondate_index",
        LakeWriter.runIndexKey($"transactiondate", run))
      LakeWriter.appendPartitioned(df, out, "transactiondate_index")
    }
    // AQE wraps the plan and hides the executed scan's metrics — disable
    // it for this one assertion so the leaf IS the executed scan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pruned = spark.read.parquet(out)
        .where($"transactiondate_index" === "2026-01-23_2")
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters"), s"expected partition filters:\n$scan")
      // collect(), not count(): count() builds a separate QueryExecution,
      // so the metrics below would belong to a plan that never ran.
      assert(pruned.collect().length === 3)
      // physical proof: the scan's numFiles metric shows it touched only
      // the matching folder's file, not all three partitions
      // (df.inputFiles is logical/pre-pruning and would list all 3).
      val numFiles = pruned.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles")).map(_.value).sum
      assert(numFiles === 1, s"pruned scan must read 1 file, read $numFiles")
      assert(spark.read.parquet(out).count() === 9)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bucketed tables join with zero shuffle (co-located SMJ)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    LakeWriter.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    LakeWriter.writeBucketed(o, "o_bucketed", "o_orderkey", 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"), "inner")
    // Force SMJ (broadcast would hide the bucketing win at this size).
    val smj = joined.hint("merge")
    val plan = smj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(smj.count() === li.count())
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
  }

  /** The 7-job/3-priority fixture with its expected dispatch discipline. */
  private val jobControl = Seq(
    JobSpec(1, "users", 1, parallelRun = true),
    JobSpec(2, "products", 1, parallelRun = true),
    JobSpec(3, "orders", 2, parallelRun = false),
    JobSpec(4, "logs_a", 2, parallelRun = true),
    JobSpec(5, "logs_b", 2, parallelRun = true),
    JobSpec(6, "logs_c", 2, parallelRun = true),
    JobSpec(7, "history", 3, parallelRun = false))

  test("DAG dispatch: dependency order, straggler overlap, failure cascade") {
    import Orchestrator.DagJob
    // diamond with a side straggler: d needs (b, c); e is independent
    val dag = Seq(
      DagJob("a"),
      DagJob("b", Set("a")), DagJob("c", Set("a")),
      DagJob("d", Set("b", "c")),
      DagJob("e"))
    val events = mutable.ArrayBuffer[(String, String)]() // (phase, id)
    val live = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxLive = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = Orchestrator.runDag(dag, maxConcurrentThreads = 3) { j =>
      val l = live.incrementAndGet()
      maxLive.getAndUpdate(m => math.max(m, l))
      events.synchronized { events += (("start", j.id)) }
      Thread.sleep(60)
      events.synchronized { events += (("end", j.id)) }
      live.decrementAndGet()
      ()
    }
    assert(results.size === 5 && results.forall(_.outcome.isSuccess))
    val order = events.synchronized(events.toList)
    def pos(phase: String, id: String) = order.indexOf((phase, id))
    // every dependency ended before its dependent started
    for (j <- dag; dep <- j.dependsOn)
      assert(pos("end", dep) < pos("start", j.id), s"${j.id} started before $dep ended")
    // independent jobs actually overlapped (no global barrier)
    assert(maxLive.get() >= 2, "independent jobs should run concurrently")

    // failure cascade: b fails -> d skipped; a, c, e unaffected
    val r2 = Orchestrator.runDag(dag, maxConcurrentThreads = 3) { j =>
      if (j.id == "b") throw new RuntimeException("boom")
    }
    val byId = r2.map(r => r.id -> r).toMap
    assert(byId("b").outcome.isFailure && !byId("b").skipped)
    assert(byId("d").skipped && byId("d").outcome.isFailure)
    assert(Seq("a", "c", "e").forall(byId(_).outcome.isSuccess))

    // metadata-frame loading: array and CSV spellings of depends_on
    import spark.implicits._
    val metaDag = Orchestrator.dagFrom(Seq(
      ("a", null.asInstanceOf[String]),
      ("b", "a"), ("c", "a"),
      ("d", "b, c"), ("e", "")).toDF("job_id", "depends_on"))
    assert(metaDag.toSet === dag.toSet)
    val arrDag = Orchestrator.dagFrom(Seq(
      ("a", Seq.empty[String]), ("b", Seq("a")), ("c", Seq("a")),
      ("d", Seq("b", "c")), ("e", Seq.empty[String]))
      .toDF("job_id", "depends_on"))
    assert(arrDag.toSet === dag.toSet)

    // malformed graphs rejected up front
    intercept[IllegalArgumentException] {
      Orchestrator.runDag(Seq(DagJob("x", Set("y")), DagJob("y", Set("x"))))(_ => ())
    }
    intercept[IllegalArgumentException] {
      Orchestrator.runDag(Seq(DagJob("x", Set("nope"))))(_ => ())
    }
    intercept[IllegalArgumentException] {
      Orchestrator.runDag(Seq(DagJob("x"), DagJob("x")))(_ => ())
    }
  }

  test("backfill windows: contiguous half-open chunks; windowed re-runs ≡ one-shot") {
    import graft.orchestrate.Backfill
    assert(Backfill.windows("2020-01-01", "2020-01-10", 3) === Seq(
      ("2020-01-01", "2020-01-04"), ("2020-01-04", "2020-01-07"),
      ("2020-01-07", "2020-01-10")))
    // last chunk clamps to the range end
    assert(Backfill.windows("2020-01-01", "2020-01-08", 3).last ===
      ("2020-01-07", "2020-01-08"))
    assert(Backfill.windows("2020-01-01", "2020-01-01", 3) === Seq.empty)

    // end-to-end: hourly aggregation backfilled per window with dynamic
    // partition overwrite equals the one-shot run — and re-running one
    // window is idempotent (the resume-after-failure contract)
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("dt", date_format($"ts", "yyyy-MM-dd"))
    val bounds = events
      .agg(min($"dt"), date_format(expr("min(ts) + INTERVAL 2 DAYS"), "yyyy-MM-dd"),
        date_format(expr("max(ts) + INTERVAL 1 DAY"), "yyyy-MM-dd"))
      .collect().head.toSeq.map(_.toString)
    val (d0, dMid, dEnd) = (bounds(0), bounds(1), bounds(2))
    val chunkDays = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(d0), java.time.LocalDate.parse(dMid)).toInt
    val lake = java.nio.file.Files
      .createTempDirectory("graft-backfill").toString + "/hourly"
    def runWindow(lo: String, hi: String): Unit =
      LakeWriter.overwritePartitionsDynamic(
        graft.streaming.Streams.hourlyAgg(
          events.where($"dt" >= lo && $"dt" < hi))
          .withColumn("dt", substring($"window_start", 1, 10)),
        lake, "dt")
    val jobs = Backfill.jobs(d0, dEnd, chunkDays)
    assert(jobs.size >= 2, s"need >=2 windows, got ${jobs.size}")
    val results = Orchestrator.runDag(jobs, maxConcurrentThreads = 2) { j =>
      val (lo, hi) = Backfill.windowOf(j, d0, dEnd, chunkDays)
      runWindow(lo, hi)
    }
    assert(results.forall(_.outcome.isSuccess))
    // re-run the first window alone: dynamic overwrite makes it a no-op
    val (lo0, hi0) = Backfill.windowOf(jobs.head, d0, dEnd, chunkDays)
    runWindow(lo0, hi0)
    val backfilled = spark.read.parquet(lake)
      .select($"window_start", $"event_type", $"n_events", $"sum_value", $"n_users")
    val oneShot = graft.streaming.Streams.hourlyAgg(events)
    assert(backfilled.count() === oneShot.count())
    assert(backfilled.exceptAll(oneShot).count() === 0L)
    assert(oneShot.exceptAll(backfilled).count() === 0L)
  }

  test("dagFromPriorities preserves the reference's dispatch discipline") {
    val dag = Orchestrator.dagFromPriorities(jobControl)
    assert(dag.map(_.id).toSet === jobControl.map(_.targetTable).toSet)
    val started = mutable.ArrayBuffer[String]()
    val results = Orchestrator.runDag(dag, maxConcurrentThreads = 3) { j =>
      started.synchronized { started += j.id }
      Thread.sleep(10)
    }
    assert(results.forall(_.outcome.isSuccess))
    val order = started.synchronized(started.toList)
    val prio = jobControl.map(j => j.targetTable -> j.priority).toMap
    // barrier semantics survive: start order is non-decreasing in priority
    val prios = order.map(prio)
    assert(prios === prios.sorted,
      s"priority order violated: $order")
    // sequential-first within each group
    jobControl.groupBy(_.priority).foreach { case (_, group) =>
      val (par, seq) = group.partition(_.parallelRun)
      for (s <- seq; p <- par)
        assert(order.indexOf(s.targetTable) < order.indexOf(p.targetTable),
          s"${s.targetTable} must start before parallel ${p.targetTable}")
    }
  }

  test("orchestrator honors priority barriers and sequential-first discipline") {
    val started = mutable.ArrayBuffer[(Int, String)]()
    val results = Orchestrator.run(jobControl, maxConcurrentThreads = 3) { spec =>
      started.synchronized { started += ((spec.priority, spec.targetTable)) }
      Thread.sleep(10)
    }
    assert(results.size === 7)
    assert(results.forall(_.outcome.isSuccess))
    val priorities = started.map(_._1).toSeq
    assert(priorities === priorities.sorted, "priority groups must run in ascending order")
    // within priority 2, the sequential job starts before any parallel job
    val p2 = started.filter(_._1 == 2).map(_._2)
    assert(p2.head === "orders")
  }

  test("job-control list loads from a metadata frame (reference piority spelling)") {
    val meta = Seq((1, "t_payment", 1, false), (2, "t_policy", 1, true),
      (3, "t_rider", 2, true))
      .toDF("table_id", "target_table", "piority", "parallel_run")
    val jobs = Orchestrator.jobsFrom(meta)
    assert(jobs === Seq(
      Orchestrator.JobSpec(1, "t_payment", 1, parallelRun = false),
      Orchestrator.JobSpec(2, "t_policy", 1, parallelRun = true),
      Orchestrator.JobSpec(3, "t_rider", 2, parallelRun = true)))
    // corrected spelling also accepted
    val jobs2 = Orchestrator.jobsFrom(
      meta.withColumnRenamed("piority", "priority"))
    assert(jobs2 === jobs)
  }

  test("ORC source/sink roundtrip (columnar alternative format)") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("CSV source/sink roundtrip with explicit schema (ODS extract format)") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/t"
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    src.write.option("header", "true").csv(dir)
    val back = spark.read
      .schema(src.schema) // explicit schema: no inference drift
      .option("header", "true")
      .csv(dir)
    assert(back.schema === src.schema)
    val a = src.orderBy("n_nationkey").collect().toSeq
    val b = back.orderBy("n_nationkey").collect().toSeq
    assert(a === b)
  }

  test("corrupt-record-tolerant JSON ingestion quarantines bad rows (PERMISSIVE)") {
    val dir = Files.createTempDirectory("graft-corrupt").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch.jsonl"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 "v": "broken json
        |{"id": 3, "v": "also ok"}
        |""".stripMargin)
    val schema = "id long, v string, _corrupt_record string"
    // Spark disallows querying ONLY the corrupt column from a raw file
    // scan — materialize first (the documented quarantine workflow)
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache()
    try {
      val good = df.where(col("_corrupt_record").isNull)
      val bad = df.where(col("_corrupt_record").isNotNull)
      assert(good.count() === 2L)
      assert(bad.count() === 1L)
      // the quarantined row preserves the raw line for replay/debugging
      assert(bad.select("_corrupt_record").head().getString(0).contains("broken json"))
    } finally df.unpersist()
    // strict mode for publish gates: malformed rows dropped entirely
    val dropped = spark.read.schema("id long, v string")
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() === 2L)
  }

  test("schema evolution: mergeSchema reads unioned columns across run folders") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/run=1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2_added").write.parquet(s"$dir/run=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v1", "v2_added", "run"))
    val rows = merged.select("id", "v2_added").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(rows(1L) === None, "pre-evolution rows read the new column as null")
    assert(rows(2L) === Some(9.5))
  }

  test("orchestrator retries transient failures and reports attempt counts") {
    val failures = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobs = Seq(
      Orchestrator.JobSpec(1, "flaky", 1, parallelRun = false),
      Orchestrator.JobSpec(2, "stable", 1, parallelRun = true),
      Orchestrator.JobSpec(3, "doomed", 1, parallelRun = true))
    val results = Orchestrator.run(jobs, maxAttempts = 3) { spec =>
      spec.targetTable match {
        case "flaky" => // fails twice, succeeds on the 3rd attempt
          val n = failures.merge(spec.tableId, 1, _ + _)
          if (n < 3) throw new RuntimeException(s"transient #$n")
        case "doomed" => throw new RuntimeException("permanent")
        case _ => ()
      }
    }
    val byName = results.map(r => r.spec.targetTable -> r).toMap
    assert(byName("flaky").outcome.isSuccess && byName("flaky").attempts === 3)
    assert(byName("stable").outcome.isSuccess && byName("stable").attempts === 1)
    assert(byName("doomed").outcome.isFailure && byName("doomed").attempts === 3)
  }

  test("orchestrator captures per-job failures without aborting the run") {
    val results = Orchestrator.run(jobControl, maxConcurrentThreads = 3) { spec =>
      if (spec.targetTable == "logs_b") sys.error("boom")
    }
    assert(results.count(_.outcome.isFailure) === 1)
    assert(results.find(_.spec.targetTable == "logs_b").get.outcome.isFailure)
    assert(results.size === 7)
  }

  test("abortOnGroupFailure stops later priority groups after a failed barrier") {
    val results = Orchestrator.run(jobControl, abortOnGroupFailure = true) { spec =>
      if (spec.targetTable == "users") sys.error("boom") // priority-1 job
    }
    assert(results.map(_.spec.priority).toSet === Set(1),
      "groups after the failed barrier must not run")
    assert(results.count(_.outcome.isFailure) === 1)
  }

  test("orchestrated Spark jobs share one session across driver threads") {
    val counts = mutable.Map[String, Long]()
    Orchestrator.run(jobControl.filter(_.priority == 2)) { spec =>
      val n = spark.range(1000).filter($"id" % 7 === 0).count()
      counts.synchronized { counts(spec.targetTable) = n }
    }
    assert(counts.values.toSet === Set(143L))
  }

  test("concurrent dispatch of REAL engine jobs returns sequential-identical results") {
    // VERDICT r10 #2: the mock-job specs never pinned result-equality
    // when heavy catalog families actually RACE on one session. Run
    // three real families sequentially, then 3-wide parallel (each in
    // its own FAIR pool — mode=FAIR alone leaves every job in the
    // FIFO-internal default pool), and require identical collected
    // results. OrchestratorRehearsal measures the same shape at a
    // rehearsal decade; this is the value pin at spec scale.
    val dir = "/root/testdata/sf0.001"
    val jobs = Seq("q10_flagship_document", "x37_tfidf", "x38_incremental_dedup")
    def rows(name: String): Set[String] =
      graft.SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).groupBy(identity).view
        .mapValues(_.length).toMap.map { case (r, n) => s"$n x $r" }.toSet
    val sequential = jobs.map(n => n -> rows(n)).toMap
    val concurrent = new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()
    val specs = jobs.zipWithIndex.map { case (n, i) =>
      JobSpec(i, n, priority = 1, parallelRun = true)
    }
    val results = Orchestrator.run(specs, maxConcurrentThreads = 3) { spec =>
      concurrent.put(spec.targetTable,
        Orchestrator.inSparkPool(spark, spec.targetTable)(rows(spec.targetTable)))
    }
    assert(results.forall(_.outcome.isSuccess),
      results.filter(_.outcome.isFailure).map(_.outcome).mkString("; "))
    jobs.foreach { n =>
      assert(concurrent.get(n) === sequential(n), s"$n diverged under concurrency")
    }
  }

  test("inSparkPool restores the caller's pool assignment (r12 ADVICE)") {
    // nested calls and callers with their own pool must get their
    // assignment back — clearing to null would silently drop an outer
    // job's FAIR pool after any inner helper used one
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    try {
      sc.setLocalProperty("spark.scheduler.pool", "outer")
      val seen = Orchestrator.inSparkPool(spark, "inner") {
        val inInner = sc.getLocalProperty("spark.scheduler.pool")
        val afterNested = Orchestrator.inSparkPool(spark, "nested") {
          sc.getLocalProperty("spark.scheduler.pool")
        }
        (inInner, afterNested, sc.getLocalProperty("spark.scheduler.pool"))
      }
      assert(seen === (("inner", "nested", "inner")))
      assert(sc.getLocalProperty("spark.scheduler.pool") === "outer")
      // and with NO prior assignment the property ends unset, not "null"-ed
      sc.setLocalProperty("spark.scheduler.pool", null)
      Orchestrator.inSparkPool(spark, "solo") { () }
      assert(sc.getLocalProperty("spark.scheduler.pool") === null)
    } finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }

  test("x120 orchestrated DAG: published-table handoff yields the corpus aggregates") {
    // the catalog face of O1-O6 (VERDICT r12 #6): two root jobs publish
    // tables 2-wide, the rollup job aggregates the PUBLISHED tables —
    // so its rows equal the corpus total only if the dependency-ordered
    // publish/consume handoff actually happened
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("x120_orchestrated_dag")(spark, dir)
      .collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val total = docs.count()
    val rollup = out.filter(_.getString(0) == "rollup")
    assert(rollup.map(_.getString(1)).sorted.toSeq === Seq("by_lang", "by_source"))
    assert(rollup.forall(_.getLong(2) == total),
      s"rollup rows ${rollup.mkString(", ")} != corpus total $total")
    val bySource = out.filter(_.getString(0) == "by_source")
    assert(bySource.map(_.getLong(2)).sum == total)
    assert(bySource.length == docs.select("source").distinct.count())
    val byLang = out.filter(_.getString(0) == "by_lang")
    assert(byLang.map(_.getLong(2)).sum == total)
    // deterministic presentation: sorted by (job, k)
    val keys = out.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("x120 reuses one scratch root per (session, dir) (ADVICE r13 #2)") {
    // repeated invocations in one JVM (bench rounds) must not accumulate
    // scratch dirs: the root is allocated once and republished with
    // overwrite-mode writes. Read the root via the package-private map
    // keyed by (sessionUUID, dir) — counting global tmpdir entries would
    // flake whenever a parallel JVM creates/reaps graft-x120 dirs between
    // snapshots (ADVICE r14 #3).
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries("x120_orchestrated_dag")(spark, dir).count()
    val key = s"${graft.queries.ExtQueries.x120SessionKey(spark)}|$dir"
    val root1 = graft.queries.ExtQueries.x120Roots.get(key)
    assert(root1 != null, "first invocation registered no scratch root")
    val mapSize1 = graft.queries.ExtQueries.x120Roots.size
    val out = graft.SparkEntry.queries("x120_orchestrated_dag")(spark, dir)
    assert(graft.queries.ExtQueries.x120Roots.get(key) === root1,
      "second invocation replaced the scratch root")
    assert(graft.queries.ExtQueries.x120Roots.size === mapSize1,
      "second invocation grew the roots map")
    assert(out.count() > 0)
  }

  test("x120 returned frame survives a subsequent republish (VERDICT r15 #1)") {
    // the r15 scaladoc documented a hazard: the returned frame was a
    // lazy read over a shared scratch root that the NEXT invocation
    // republishes over (overwrite-mode), so a slow consumer could read
    // a stale/torn 27-row frame. The fix materializes inside the lock —
    // the returned plan must be a local relation (no scratch-file scan)
    // and must stay exact when consumed AFTER a republish.
    val dir = "/root/testdata/sf0.001"
    val first = graft.SparkEntry.queries("x120_orchestrated_dag")(spark, dir)
    assert(first.queryExecution.optimizedPlan.collectLeaves().forall(
      _.nodeName.contains("LocalRelation")),
      s"x120 result still scans scratch files:\n${first.queryExecution.optimizedPlan}")
    // republish every scratch table over the root the first frame used
    graft.SparkEntry.queries("x120_orchestrated_dag")(spark, dir).count()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val rollup = first.collect().filter(_.getString(0) == "rollup")
    assert(rollup.length == 2 && rollup.forall(_.getLong(2) == total),
      s"first frame torn by republish: ${rollup.mkString(", ")} vs $total")
  }
}
