package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** The 10× scale rehearsal (VERDICT r8 #1): run the heaviest operator
  * families against a corpus 10× past the bench's sf0.1 and MEASURE the
  * cost curve instead of asserting it. Every scale claim in the tree was
  * extrapolated from sf0.1; this main is the first exercise above it.
  *
  * For each rehearsed op the harness times `iters` noop-sink runs at the
  * base dir (sf0.1) and at the ScaleGen dir (10× rows), then reports the
  * floor-over-floor ratio. A data-linear operator on a fixed-core host
  * should land ratio ≈ the row factor (10); candidate-pair-shaped ops
  * (fuzzy join, LSH banding) may bend worse — THAT is the number this
  * tool exists to surface, per-op, attributably. Failures (budget-guard
  * refusals included) are recorded verbatim, not absorbed: a guard
  * engaging at 10× is a rehearsal FINDING, not an error to hide.
  *
  * Ops rehearsed (the r8 verdict's list, extended with the relational
  * family and the corpus-scale near-dup path):
  *  - x104_fuzzy_join        — PPJoin candidate generation vs n²
  *  - x107_containment       — exact co-shingle pairs (budget-guarded)
  *  - x32_minhash_pairs      — the LSH path the refusals point at
  *  - x105_semdedup          — SRP bucket + within-bucket cosine
  *    (plus the bits=0 autoBits variant as `x105_semdedup_auto`)
  *  - x92_shuffle            — two-level global permutation
  *  - x38_incremental_dedup  — exact tier + LSH band tier + components
  *  - x61_event_hourly_stream— streaming twin (AvailableNow, memory sink)
  *  - q10_flagship_document  — the reference-parity flagship over the
  *    ScaleGen orders/lineitem star
  *  - x37_tfidf              — df join + per-doc weights
  *  - x68_sessionize         — gap-based sessions (skew-sensitive: a hot
  *    user is one fat window partition on the Zipf twin)
  *  - x69_sessionize_stream / x110_event_dedup_stream — per-key-state
  *    streaming twins; state-store rows/memory land in the artifact via
  *    [[graft.streaming.Streams.lastStreamRunStats]]
  *  - x84_transitions / x80_rolling_window — the other bare-user_id
  *    window shapes (lag chain, trailing range frame): the zipf twin
  *    measured them at 2.77× / 169.8× pre-fix, 0.81 / 1.08 after the
  *    [[graft.ops.Windows]] skew-split primitives
  *  - x110_bounded (synthetic) — the watermark-bounded append-mode x110
  *    over a time-sliced staged delivery: state_rows_max witnesses
  *    EVICTION, vs the complete-mode twin whose state is all buckets
  *  - lakeskew (synthetic)   — hot-folder WRITE path: partitioned
  *    append / dynamic overwrite / hive compact under a ~30%-hot
  *    partition value, with per-folder file distributions and the
  *    exec-mode rebalance skew-split audit (VERDICT r10 #1)
  *  - ANN IVF with nCells=0  — corpus-derived resolution (autoCells):
  *    build timed separately from a fixed-200-query probe batch, plus
  *    untimed subset recall@5; runs on both corpus shapes ("ann" =
  *    near-uniform, "annc" = 32-Gaussian clustered).
  *
  * Timing follows Bench's conventions: noop sink (no column pruning, no
  * I/O), cache/persistent-RDD cleanup between runs, floor quoted (host
  * stalls are additive noise). Deep decades (100×+) need
  * `SPARK_DRIVER_MEM=48g` — build.sbt forks `run` with
  * `-Xmx${SPARK_DRIVER_MEM:-8g}`, so `SBT_OPTS` never reaches the forked
  * JVM; all local[32] executor threads share that one heap and the
  * 60M-row flagship count OOMs under the 8 GB default. Budget DISK too:
  * the 1000× star's shuffle spill runs tens of GB — clear scratch
  * orphans first (everything this harness creates reaps at JVM exit via
  * [[graft.core.Scratch]]).
  *
  * Usage:
  *   runMain graft.tools.ScaleRehearsal <baseDir> <scaleDir> <outJson> [label]
  * (scaleDir from `runMain graft.tools.ScaleGen <scaleDir> <factor>`)
  */
object ScaleRehearsal {

  private val OpNames = Seq(
    "x92_shuffle",
    "x105_semdedup",
    "x38_incremental_dedup",
    "x61_event_hourly_stream",
    "x104_fuzzy_join",
    // relational family (needs the ScaleGen orders/lineitem star):
    // the flagship nested-document pipeline and the two heaviest
    // text entries from the bench artifact
    "q10_flagship_document",
    "x107_containment",
    // the corpus-scale near-dup path x107's refusal points at — rehearsed
    // so the artifact witnesses the alternative WORKING where the exact
    // spelling refuses
    "x32_minhash_pairs",
    "x37_tfidf",
    // skew-sensitive batch op (single hot user ⇒ one fat window
    // partition) — in the list for the Zipf-twin rehearsal (r9 #1)
    "x68_sessionize",
    // per-key-state streaming twins (r9 #2): state ∝ key cardinality,
    // recorded from the progress metrics via Streams.lastStreamRunStats
    "x69_sessionize_stream",
    "x110_event_dedup_stream",
    // the other bare-user_id window ops (x68's pre-fix exposure class):
    // lag chain and hour-range frame over the hot key's whole timeline
    "x84_transitions",
    "x80_rolling_window")

  /** Locale-pinned numeric formatting: the `f` interpolator uses the JVM
    * default locale, which under a comma-decimal locale would emit
    * `1,234` inside the artifact and break JSON parsing.
    */
  private[tools] def num(d: Double, decimals: Int = 3): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(d))

  /** Minimal JSON string escaper: Spark stage-failure messages are
    * routinely multi-line, and a literal newline inside a JSON string
    * makes the whole artifact unparseable.
    */
  private[tools] def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < 0x20 => sb.append("\\u%04x".format(c.toInt))
      case c             => sb.append(c)
    }
    sb.toString
  }

  private case class Run(
      op: String,
      scale: String,
      secs: Seq[Double],
      rows: Long,
      error: Option[String],
      recall: Option[Double] = None,
      state: Option[graft.streaming.Streams.StreamRunStats] = None) {
    def floor: Double = if (secs.isEmpty) Double.NaN else secs.min
    def json: String = {
      val secsJson = secs.map(s => num(s)).mkString("[", ",", "]")
      val err = error.map(e =>
        s""","error":"${jsonStr(e.take(300))}"""").getOrElse("")
      val rec = recall.map(r => s""","recall":${num(r)}""").getOrElse("")
      val st = state.map(s =>
        s""","state":{"batches":${s.batches},"input_rows":${s.inputRows},""" +
          s""""state_rows_last":${s.stateRowsLast},"state_rows_max":${s.stateRowsMax},""" +
          s""""state_mem_bytes_max":${s.stateMemoryBytesMax},""" +
          s""""dropped_by_watermark":${s.droppedByWatermark}}""").getOrElse("")
      s"""{"op":"$op","scale":"$scale","secs":$secsJson,"rows":$rows$rec$st$err}"""
    }
  }

  private def cleanup(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    System.gc()
  }

  private def timed(spark: SparkSession, op: String, scale: String,
      iters: Int)(mk: () => org.apache.spark.sql.DataFrame): Run = {
    val secs = Seq.newBuilder[Double]
    var rows = -1L
    var error: Option[String] = None
    // One-shot streaming ops record progress metrics on the calling
    // thread (Streams.lastStreamRunStats); clear before each run so a
    // captured value is attributable to THIS op, keep the last one.
    var state: Option[graft.streaming.Streams.StreamRunStats] = None
    var i = 0
    while (i < iters && error.isEmpty) {
      graft.streaming.Streams.clearLastStreamRunStats()
      val t0 = System.nanoTime()
      try mk().write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => error = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      val s = (System.nanoTime() - t0) / 1e9
      if (error.isEmpty) {
        secs += s
        graft.streaming.Streams.lastStreamRunStats.foreach { st =>
          state = Some(st)
          System.err.println(s"[rehearsal] $op $scale iter=$i state_rows_max=${st.stateRowsMax} " +
            s"state_mem_max=${st.stateMemoryBytesMax} dropped=${st.droppedByWatermark}")
        }
        System.err.println(f"[rehearsal] $op $scale iter=$i $s%.2f s")
      } else System.err.println(s"[rehearsal] $op $scale iter=$i FAILED: ${error.get}")
      cleanup(spark)
      i += 1
    }
    if (error.isEmpty) {
      try rows = mk().count()
      catch { case _: Throwable => () }
      cleanup(spark)
    }
    Run(op, scale, secs.result(), rows, error, state = state)
  }

  /** [[timed]] for side-effecting phases (the lakehouse WRITE path): the
    * thunk IS the operation, no noop sink; it returns a result gauge
    * (rows published / files produced / rows read) recorded as `rows`.
    */
  private def timedU(spark: SparkSession, op: String, scale: String,
      iters: Int)(run: () => Long): Run = {
    val secs = Seq.newBuilder[Double]
    var rows = -1L
    var error: Option[String] = None
    var i = 0
    while (i < iters && error.isEmpty) {
      val t0 = System.nanoTime()
      try rows = run()
      catch { case e: Throwable =>
        error = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      val s = (System.nanoTime() - t0) / 1e9
      if (error.isEmpty) {
        secs += s
        System.err.println(f"[rehearsal] $op $scale iter=$i $s%.2f s rows=$rows")
      } else System.err.println(s"[rehearsal] $op $scale iter=$i FAILED: ${error.get}")
      cleanup(spark)
      i += 1
    }
    Run(op, scale, secs.result(), rows, error)
  }

  /** Lakehouse WRITE-path rehearsal (VERDICT r9 #3): every other op here
    * reads with a noop sink, but the discipline the reference is actually
    * about is the write side — partitioned append, bounded file sizes,
    * compaction, stat-pruned reads. Per scale this times:
    *  - lake_publish_delta — FOUR publishDelta deliveries of the events
    *    table split by time quartile (the daily-append shape), each
    *    range-laid-out on the epoch column so file footers carry tight
    *    [min,max] ranges, footer stats recorded on `ts_sec`
    *  - lake_read_pruned  — readWhere over the LAST ~5% of the time range
    *    against the 4-delta chain: manifest-level data skipping (the
    *    selected-vs-total file counts land in the artifact)
    *  - lake_compact      — compact(256 MB) of a fresh 4-delta chain per
    *    iteration (chains pre-built OUTSIDE the timed region)
    * and records the compacted file-count/size distribution against the
    * reference's 128–512 MB file-size guidance
    * (all_from_gemini.txt:262-268,364-368 ≙ LakeWriter defaults).
    */
  private def lakeRuns(spark: SparkSession, dir: String, scale: String,
      iters: Int): (Seq[Run], String) = {
    import graft.lake.Versioned
    val events = graft.core.Tables.events(spark, dir)
      .withColumn("ts_sec",
        graft.core.EventTime.epochUs(col("ts")).cast("double") / lit(1e6))
    // Quartile cuts + the pruned-read window: one driver-side quantile
    // pass, harness setup (the deltas a daily append would receive).
    val q = events.stat.approxQuantile(
      "ts_sec", Array(0.25, 0.5, 0.75, 0.95), 0.001)
    val cuts = Array(Double.NegativeInfinity, q(0), q(1), q(2),
      Double.PositiveInfinity)
    def slice(i: Int) =
      events.where(col("ts_sec") > cuts(i) && col("ts_sec") <= cuts(i + 1))
        .repartitionByRange(8, col("ts_sec"))
    def freshRoot() =
      graft.core.Scratch.reapAtExit(
        Files.createTempDirectory("graft-lake").toString) + "/events"
    def publishChain(root: String): Long = {
      (0 until 4).foreach(i =>
        Versioned.publishDelta(slice(i), root, statsCols = Seq("ts_sec")))
      Versioned.publishedRows(root).getOrElse(-1L)
    }
    val pub = timedU(spark, "lake_publish_delta", scale, iters)(() =>
      publishChain(freshRoot()))
    if (pub.error.isDefined) {
      val e = pub.error
      return (Seq(pub, Run("lake_read_pruned", scale, Nil, -1, e),
        Run("lake_compact", scale, Nil, -1, e)), "null")
    }
    // one canonical chain for the pruned-read phase
    val chainRoot = freshRoot()
    publishChain(chainRoot)
    val totalFiles = Versioned.read(spark, chainRoot).inputFiles.length
    var selectedFiles = -1
    var prunedRows = -1L
    val readPruned = timedU(spark, "lake_read_pruned", scale, iters) { () =>
      val df = Versioned.readWhere(spark, chainRoot, "ts_sec",
        q(3), Double.MaxValue)
      selectedFiles = df.inputFiles.length
      prunedRows = df.count()
      prunedRows
    }
    // compaction chains pre-built OUTSIDE the timed region (compacting an
    // already-compacted table would measure different work)
    val compactRoots = (0 until iters).map { _ =>
      val r = freshRoot(); publishChain(r); r
    }
    var ci = 0
    val comp = timedU(spark, "lake_compact", scale, iters) { () =>
      val r = compactRoots(ci); ci += 1
      Versioned.compact(spark, r)
      Versioned.read(spark, r).inputFiles.length.toLong
    }
    val filesJson = {
      val sizes = Versioned.read(spark, compactRoots.head).inputFiles
        .map(f => Files.size(Paths.get(new java.net.URI(f)))).sorted
      val mb = sizes.map(_ / 1048576.0)
      val inBand = mb.count(s => s >= 128.0 && s <= 512.0)
      s"""{"chain_files":$totalFiles,"pruned_selected_files":$selectedFiles,""" +
        s""""pruned_rows":$prunedRows,"compacted_files":${sizes.length},""" +
        s""""compacted_total_mb":${num(mb.sum, 1)},""" +
        s""""compacted_min_mb":${num(mb.head, 1)},""" +
        s""""compacted_median_mb":${num(mb(mb.length / 2), 1)},""" +
        s""""compacted_max_mb":${num(mb.last, 1)},""" +
        s""""n_in_128_512mb":$inBand,"target_mb":256}"""
    }
    (Seq(pub, readPruned, comp), filesJson)
  }

  /** Hot-folder WRITE-path rehearsal (VERDICT r10 #1): round 10 routed
    * every partitioned writer through the REBALANCE hint so AQE can
    * split a hot folder across writer tasks — spec-pinned at plan-node
    * level but never TIMED under a hot key. Partitioned by `event_type`
    * (~30% hot on the zipf twin), per scale this times:
    *  - lake_append_hot    — [[graft.lake.LakeWriter.appendPartitioned]]
    *    into a fresh root (gauge: files written)
    *  - lake_overwrite_hot — [[graft.lake.LakeWriter.overwritePartitionsDynamic]]
    *    re-delivering the same folders over the appended root
    *  - lake_compact_hive  — hive-layout
    *    [[graft.lake.LakeWriter.compact]] of a pre-fragmented table
    *    (fragmentation built OUTSIDE the timed region)
    * and records the per-folder file-count/size distribution of the
    * append output (hot folder vs rest, against the reference's
    * 128–512 MB guidance) plus an EXEC-MODE audit of the writer's
    * aligned plan: executing the rebalance-hinted frame's own
    * QueryExecution and counting skewed `AQEShuffleRead`s on its
    * RebalancePartitions exchange — the runtime evidence (not just node
    * presence) that a hot folder splits instead of serializing one
    * writer task.
    */
  private def lakeSkewRuns(spark: SparkSession, dir: String, scale: String,
      iters: Int): (Seq[Run], String) = {
    import graft.lake.LakeWriter
    val events = graft.core.Tables.events(spark, dir)
    def freshRoot() =
      graft.core.Scratch.reapAtExit(
        Files.createTempDirectory("graft-lakeskew").toString) + "/events"
    def fileCount(root: String): Long =
      spark.read.parquet(root).inputFiles.length.toLong
    // per-folder distribution of a write's output: hot-vs-rest file
    // counts and sizes are the write-path skew gauge
    def folderStats(root: String): Seq[(String, Int, Double)] = {
      val byFolder = spark.read.parquet(root).inputFiles
        .groupBy(f => new java.net.URI(f).getPath
          .split("/").takeRight(2).head)
      byFolder.toSeq.map { case (folder, fs) =>
        val mb = fs.map(f => Files.size(Paths.get(new java.net.URI(f)))).sum / 1048576.0
        (folder, fs.length, mb)
      }.sortBy(-_._3)
    }
    var appendRoot: String = null
    val app = timedU(spark, "lake_append_hot", scale, iters) { () =>
      appendRoot = freshRoot()
      LakeWriter.appendPartitioned(events, appendRoot, "event_type")
      fileCount(appendRoot)
    }
    if (app.error.isDefined) {
      val e = app.error
      return (Seq(app, Run("lake_overwrite_hot", scale, Nil, -1, e),
        Run("lake_compact_hive", scale, Nil, -1, e)), "null")
    }
    // snapshot the APPEND output's layout now — the overwrite phase
    // re-delivers dynamic overwrites into this same root, so a later
    // read would report the last overwrite's files, not the append's
    val appendJson = folderStats(appendRoot).map { case (folder, n, mb) =>
      s"""{"folder":"${jsonStr(folder)}","files":$n,"mb":${num(mb, 1)}}"""
    }.mkString("[", ",", "]")
    val ow = timedU(spark, "lake_overwrite_hot", scale, iters) { () =>
      LakeWriter.overwritePartitionsDynamic(events, appendRoot, "event_type")
      fileCount(appendRoot)
    }
    // fragmented hive tables for compaction, built outside the timed
    // region: a low record cap forces ~40 files/folder — the small-file
    // shape the reference flags as reader-slow (all_from_gemini.txt:458-486)
    val nRows = events.count()
    val fragCap = math.max(1L, nRows / 200)
    val compactRoots = (0 until iters).map { _ =>
      val r = freshRoot()
      LakeWriter.appendPartitioned(events, r, "event_type",
        maxRecordsPerFile = fragCap)
      r
    }
    val fragFilesBefore = fileCount(compactRoots.head)
    var ci = 0
    val comp = timedU(spark, "lake_compact_hive", scale, iters) { () =>
      val r = compactRoots(ci); ci += 1
      LakeWriter.compact(spark, r, partitionCols = Seq("event_type"))
      fileCount(r)
    }
    // exec-mode rebalance audit under the ENGINE session's AQE settings:
    // run the writer's exact pre-write plan (the rebalance hint on the
    // partition column) through ITS OWN QueryExecution — df.write would
    // clone a fresh one and leave AQE decisions invisible — and count
    // skewed AQEShuffleReads in the final section
    val aligned = events.hint("rebalance", col("event_type"))
    aligned.queryExecution.toRdd.count()
    val rawPlan = aligned.queryExecution.executedPlan.toString
    val planFinal = {
      val f = rawPlan.indexOf("== Final Plan ==")
      val i = rawPlan.indexOf("== Initial Plan ==")
      if (f >= 0 && i > f) rawPlan.substring(f, i) else rawPlan
    }
    val skewedReads = "AQEShuffleRead [^\\n]*skewed".r.findAllIn(planFinal).length
    val hasRebalance = rawPlan.contains("REBALANCE_PARTITIONS_BY_COL")
    System.err.println(s"[rehearsal] lake_skew $scale rebalance_skewed_reads=$skewedReads " +
      s"rebalance_node=$hasRebalance")
    cleanup(spark)
    val compactJson = folderStats(compactRoots.head).map { case (folder, n, mb) =>
      s"""{"folder":"${jsonStr(folder)}","files":$n,"mb":${num(mb, 1)}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"append_folders":$appendJson,"compacted_folders":$compactJson,""" +
        s""""frag_cap_rows":$fragCap,"frag_files_before":$fragFilesBefore,""" +
        s""""rebalance_skewed_reads":$skewedReads,""" +
        s""""rebalance_node_present":$hasRebalance}"""
    (Seq(app, ow, comp), json)
  }

  /** Exact top-5 for a query subset by distributed cross join (nQ ×
    * corpus cosine rows — 40M at the 100× corpus, seconds on 32 cores),
    * compared against the index's answers → recall@5. UNTIMED: recall
    * is a quality gauge, the brute-force twin is not part of the
    * operator under measurement.
    */
  private def subsetRecall(queries: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame): Double = {
    import org.apache.spark.sql.expressions.Window
    val exact = queries.select(col("vec_id"), col("embedding").as("emb_a"))
      .crossJoin(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("emb_b")))
      .where(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        graft.ext.Similarity.cosineCol(col("emb_a"), col("emb_b")).as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("score").desc, col("neighbor_id"))))
      .where(col("rank") <= 5)
      .select(col("vec_id"), col("neighbor_id"))
    val denom = exact.count().toDouble
    if (denom == 0) 0.0
    else approx.select(col("vec_id"), col("neighbor_id"))
      .join(exact, Seq("vec_id", "neighbor_id")).count().toDouble / denom
  }

  /** IVF with corpus-derived resolution: timed build (nCells = 0 →
    * autoCells) into a fresh root + timed fixed-size query batch +
    * untimed subset recall@5. `table` picks the corpus shape
    * (near-uniform `embeddings` or `embeddings_clustered`); `prefix`
    * namespaces the emitted op names.
    */
  private def annRuns(spark: SparkSession, dir: String, scale: String,
      iters: Int, table: String = "embeddings",
      prefix: String = "ann"): Seq[(Run, Int)] = {
    val embs = graft.core.Tables.load(spark, dir, table)
      .select(col("vec_id"), col("embedding"))
    var resolved = 0
    val build = {
      val secs = Seq.newBuilder[Double]
      var error: Option[String] = None
      var i = 0
      while (i < iters && error.isEmpty) {
        val root = graft.core.Scratch.reapAtExit(
          Files.createTempDirectory("graft-rehearsal-ivf").toString) + "/ivf"
        val t0 = System.nanoTime()
        try {
          val meta = graft.ext.AnnIndex.buildIvfIndex(embs, root, nCells = 0)
          resolved = meta.nCells
        } catch { case e: Throwable =>
          error = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[rehearsal] ${prefix}_ivf_build $scale iter=$i $s%.2f s cells=$resolved")
        if (error.isEmpty) secs += s
        cleanup(spark)
        i += 1
      }
      Run(s"${prefix}_ivf_build_auto", scale, secs.result(), resolved.toLong, error)
    }
    // Query phase reuses ONE published index (build-once/query-many):
    // fixed 200-query batch at both scales, so the measured quantity is
    // per-query latency against corpus size (ncells grows ~sqrt(n),
    // members-per-probed-cell ~sqrt(n) — expect ~sqrt(10) ≈ 3.2×, not 10×).
    val query = if (build.error.isDefined) {
      Run(s"${prefix}_ivf_query_auto", scale, Nil, -1, build.error)
    } else {
      val root = graft.core.Scratch.reapAtExit(
        Files.createTempDirectory("graft-rehearsal-ivfq").toString) + "/ivf"
      graft.ext.AnnIndex.buildIvfIndex(embs, root, nCells = 0)
      val nprobe = math.max(1, math.round(0.375 * resolved).toInt)
      val queries = embs.limit(200).cache()
      queries.count()
      val r = timed(spark, s"${prefix}_ivf_query_auto", scale, iters)(() =>
        graft.ext.AnnIndex.ivfTopKIndexed(spark, queries, root, k = 5,
          nprobe = nprobe))
      val rec = subsetRecall(queries, embs,
        graft.ext.AnnIndex.ivfTopKIndexed(spark, queries, root, k = 5,
          nprobe = nprobe))
      System.err.println(f"[rehearsal] ${prefix}_ivf_query_auto $scale recall@5=$rec%.3f nprobe=$nprobe/$resolved")
      queries.unpersist()
      cleanup(spark)
      r.copy(rows = if (r.rows >= 0) r.rows else -1, recall = Some(rec))
    }
    Seq((build, resolved), (query, resolved))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scaleDir = args.lift(1).getOrElse(
      sys.error("usage: ScaleRehearsal <baseDir> <scaleDir> <outJson> [scaleLabel]"))
    val outJson = args.lift(2).getOrElse("SCALE_REHEARSAL.json")
    val scaleLabel = args.lift(3).getOrElse("x10")
    val iters = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_N", "2").toInt
    // Comma list to rehearse a subset (e.g. skip the candidate-pair-shaped
    // ops at factors where their cost is the KNOWN quantity); "ann",
    // "annc", "x105_semdedup_auto", and "x110_bounded" name the synthetic
    // ops below.
    val opFilter = sys.env.get("SPARK_GRAFT_REHEARSAL_OPS")
      .map(_.split(",").map(_.trim).toSet)
    def wanted(op: String) = opFilter.forall(_.contains(op))
    val spark = graft.core.Sessions.local()
    spark.range(1000000L).selectExpr("sum(id)").collect() // session warmup

    val runs = Seq.newBuilder[Run]
    var annCells = Map.empty[String, Int]
    var lakeFiles = Map.empty[String, String]
    Seq("base" -> baseDir, scaleLabel -> scaleDir).foreach { case (scale, dir) =>
      OpNames.filter(wanted).foreach { op =>
        val fn = SparkEntry.queries(op)
        runs += timed(spark, op, scale, iters)(() => fn(spark, dir))
      }
      // semDedup with corpus-derived SRP resolution (bits = 0 → autoBits):
      // the catalog's x105 pins bits = 4 for oracle comparability, which
      // is exactly the pinned-resolution shape that bends quadratic at
      // 100× — this op is the auto path the scaladoc prescribes at scale.
      // Watermark-BOUNDED x110 twin (r9 #2: "bounded" must be read off
      // the state-store metrics, not asserted): append mode + 2h
      // watermark over a time-sliced ordered delivery, so the recorded
      // state_rows_max witnesses eviction — the complete-mode catalog
      // x110 above holds one state row per bucket forever by design.
      // Staging (a one-time table rewrite with ascending mtimes) is
      // harness setup, outside the timed region; 8 slices ⇒ the
      // watermark advances 7 times mid-stream.
      if (wanted("x110_bounded")) {
        val staged = graft.streaming.Streams.stageTimeSliced(
          graft.core.Tables.events(spark, dir), "ts", slices = 8)
        runs += timed(spark, "x110_bounded", scale, iters)(() =>
          graft.streaming.Streams.idempotentEventsStreamingBounded(
            spark, staged, delay = "2 hours"))
      }
      // lakehouse WRITE path (r9 #3): publish/compact/pruned-read timings
      // + compacted file-size distribution
      if (wanted("lake")) {
        val (rs, filesJson) = lakeRuns(spark, dir, scale, iters)
        runs ++= rs
        lakeFiles += (scale -> filesJson)
      }
      // hot-folder write path (r10 #1): partitioned writers under a 30%-hot
      // partition value, with the exec-mode rebalance skew-split audit
      if (wanted("lakeskew")) {
        val (rs, skewJson) = lakeSkewRuns(spark, dir, scale, iters)
        runs ++= rs
        lakeFiles += (s"${scale}_hot" -> skewJson)
      }
      if (wanted("x105_semdedup_auto"))
        runs += timed(spark, "x105_semdedup_auto", scale, iters)(() =>
          graft.ext.Similarity.semDedup(
            graft.core.Tables.embeddings(spark, dir), "vec_id", "embedding",
            bits = 0, tauNum = 2, tauDen = 5))
      if (wanted("ann"))
        annRuns(spark, dir, scale, iters).foreach { case (r, cells) =>
          runs += r
          annCells += (s"${r.op}_$scale" -> cells)
        }
      // clustered-corpus twin (recall-meaningful shape) — only where the
      // ScaleGen table exists (the driver's testdata has no clustered twin)
      if (wanted("annc") &&
          new java.io.File(s"$dir/embeddings_clustered.parquet").exists)
        annRuns(spark, dir, scale, iters, table = "embeddings_clustered",
            prefix = "annc").foreach { case (r, cells) =>
          runs += r
          annCells += (s"${r.op}_$scale" -> cells)
        }
    }
    val all = runs.result()
    val byOp = all.groupBy(_.op)
    val ratios = byOp.collect {
      case (op, rs) if rs.size == 2 && rs.forall(r => r.error.isEmpty && r.secs.nonEmpty) =>
        val base = rs.find(_.scale == "base").get.floor
        val scaled = rs.find(_.scale == scaleLabel).get.floor
        op -> (scaled / base)
    }
    val json =
      s"""{"runs":[${all.map(_.json).mkString(",")}],""" +
        s""""floor_ratio_${scaleLabel}_over_base":{${
          ratios.toSeq.sortBy(_._1)
            .map { case (op, r) => s""""$op":${num(r, 2)}""" }.mkString(",")}},""" +
        s""""ann_resolved_cells":{${
          annCells.toSeq.sorted
            .map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
        s""""lake_files":{${
          lakeFiles.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""${jsonStr(k)}":$v""" }.mkString(",")}},""" +
        s""""iters":$iters,"base":"${jsonStr(baseDir)}",""" +
        s""""scale_label":"${jsonStr(scaleLabel)}","scale_dir":"${jsonStr(scaleDir)}"}"""
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
