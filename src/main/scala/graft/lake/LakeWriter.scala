package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lakehouse write discipline (SURVEY §2.1 S3-S7).
  *
  * The reference's write contract: append-mode snappy parquet, hive-style
  * partitioned by a derived run-index key, file sizes bounded with
  * `maxRecordsPerFile` (`pyspark_add_index_on_s3.py:54-57`,
  * `links.txt:56-62`). The run-index partition value
  * `<yyyy-MM-dd>_<runIndex>` lets every re-run land in a fresh folder
  * without overwriting (`all_from_gemini.txt:245-255`) — the reference's
  * batch-incremental mechanism.
  *
  * Scale notes:
  *  - `maxRecordsPerFile` defaults to 2,000,000 (≈200-300 MB snappy
  *    parquet), the reference's production setting targeting the
  *    128-512 MB reader sweet spot (`all_from_gemini.txt:262-268`).
  *  - Never `coalesce(1)`: a single writer task OOMs on >1 GB outputs
  *    (the reference's G.1X incident, `all_from_gemini.txt:264-266`).
  *    Writer tasks align with output folders via the REBALANCE hint,
  *    NOT plain `repartition(partitionCols)`: AQE's skew splitter only
  *    acts on RebalancePartitions nodes, so the plain spelling would
  *    serialize a hot partition value (a 30%-of-events event_type on
  *    the zipf rehearsal corpus) into ONE writer task. Rebalance both
  *    coalesces small folders' tasks and splits hot ones — a split
  *    folder simply gets several part files, which the hive layout and
  *    `maxRecordsPerFile` already expect.
  */
object LakeWriter {

  val ProductionMaxRecordsPerFile: Long = 2000000L

  /** Align writer tasks with output folders, skew-safely: the REBALANCE
    * hint emits a `RebalancePartitions` node, the only shuffle shape
    * AQE's splitter will break up when one partition value is hot
    * (`spark.sql.adaptive.optimizeSkewsInRebalancePartitions`, on by
    * default). Plain `repartition(cols)` promises exactly-one partition
    * per key and is therefore never split — a 30%-hot folder key would
    * bottleneck the whole write on one task.
    */
  private def alignToFolders(df: DataFrame, cols: Seq[String]): DataFrame =
    df.hint("rebalance", cols.map(col): _*)

  /** Run-index partition key: `format_string("%s_%s", yyyy-MM-dd, idx)`
    * (`pyspark_add_index_on_s3.py:31-41`). Input tolerated as int-like or
    * string `yyyyMMdd` (defensive cast, `promting_and_code.txt:74`).
    */
  def runIndexKey(compactDate: Column, runIndex: Int): Column =
    format_string("%s_%s",
      date_format(to_date(compactDate.cast("string"), "yyyyMMdd"), "yyyy-MM-dd"),
      lit(runIndex))

  /** Append partitioned snappy parquet with bounded file sizes (S3+S4+S5). */
  def appendPartitioned(
      df: DataFrame,
      path: String,
      partitionCol: String,
      maxRecordsPerFile: Long = ProductionMaxRecordsPerFile): Unit =
    alignToFolders(df, Seq(partitionCol))
      .write
      .mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "snappy")
      .partitionBy(partitionCol)
      .parquet(path)

  /** S7: per-document JSON sink (the golden-output document shape). */
  def writeJsonDocuments(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S6: read-back verification of a written path. */
  def readBack(df: DataFrame, path: String): DataFrame =
    df.sparkSession.read.parquet(path)

  /** Dynamic partition overwrite: replaces ONLY the partitions present in
    * `df`, leaving sibling partitions untouched — the idempotent-re-run
    * upsert between blind `append` (duplicates on retry) and whole-table
    * `overwrite` (data loss). The writer-level option scopes the behavior
    * to this write, not the session.
    */
  def overwritePartitionsDynamic(
      df: DataFrame,
      path: String,
      partitionCol: String,
      maxRecordsPerFile: Long = ProductionMaxRecordsPerFile): Unit =
    alignToFolders(df, Seq(partitionCol))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "snappy")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Small-file compaction — lake maintenance for the reader-performance
    * cliff the reference documents (1,000 files per 10 M rows "flagged
    * slow for readers", `all_from_gemini.txt:458-486`; 128-512 MB sweet
    * spot, `:262-268`). Rewrites a parquet directory into
    * ceil(totalBytes / targetBytes) files via round-robin repartition
    * (even sizes without a key), never `coalesce(1)` (single-task OOM,
    * the G.1X incident). Staged write + two-move swap, so readers never
    * see a PARTIALLY-WRITTEN directory — but between the two renames the
    * table path briefly does not exist, so a concurrent reader can catch
    * a not-found window (retry the read, or use [[Versioned]] for the
    * pointer-indirection layout with no window at all). A crash between
    * the moves is self-healing: the next call restores the `.old`
    * snapshot before compacting (see [[recoverSwap]]). Returns the
    * target file budget (the exact file count on the unpartitioned path;
    * with `partitionCols` the hive layout is kept and per-folder files
    * are bounded by `maxRecordsPerFile` instead).
    *
    * Scale shape: one full read + one shuffle-free round-robin exchange +
    * one write — O(data) with no driver materialization; each of the N
    * writer tasks streams one output file.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetBytes: Long = 256L * 1024 * 1024,
      partitionCols: Seq[String] = Nil): Int = {
    import java.nio.file.{Files, Paths}
    recoverSwap(path)
    val df = spark.read.parquet(path)
    val files = df.inputFiles
    val totalBytes = files.map(f =>
      Files.size(Paths.get(new java.net.URI(f)))).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val staging = path.stripSuffix("/") + ".compacting"
    // Per-folder file sizing from the table's OWN bytes/row, not a flat
    // record cap: 2M records of a narrow schema is ~50 MB on disk, far
    // under the 128–512 MB guidance the cap is meant to serve. Row counts
    // come from the parquet footers — O(files) metadata reads, no scan.
    lazy val recordsPerFile = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = spark.sparkContext.hadoopConfiguration
      val totalRows = files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf))
        try r.getRecordCount finally r.close()
      }.sum
      if (totalRows > 0 && totalBytes > 0)
        math.max(1L, (totalRows.toDouble * targetBytes / totalBytes).toLong)
      else ProductionMaxRecordsPerFile
    }
    // Partitioned tables keep their hive layout: rebalance on the
    // partition key (folder-aligned tasks, hot folders split by AQE) and
    // bound file sizes per folder instead of globally.
    val writer =
      if (partitionCols.isEmpty) df.repartition(nFiles).write
      else alignToFolders(df, partitionCols)
        .write
        .option("maxRecordsPerFile", recordsPerFile)
        .partitionBy(partitionCols: _*)
    writer.mode("overwrite").option("compression", "snappy").parquet(staging)
    swapIn(path, staging)
    nFiles
  }

  /** Replace the directory at `path` with the fully-written `staging`
    * directory via two ATOMIC_MOVEs (old → `.old`, staging → path), then
    * reclaim `.old`. Readers never observe a partially-written directory;
    * they CAN catch a brief not-found window between the renames — callers
    * needing zero-window publishes use [[Versioned]]. A missing `path`
    * (first publish) is a single move.
    */
  private[graft] def swapIn(path: String, staging: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val p = Paths.get(path)
    val bak = Paths.get(path.stripSuffix("/") + ".old")
    if (Files.exists(p)) {
      Files.move(p, bak, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(staging), p, StandardCopyOption.ATOMIC_MOVE)
      org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
    } else
      Files.move(Paths.get(staging), p, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Startup recovery for [[swapIn]] crash windows: a crash between the
    * two moves leaves `<path>.old` holding the only copy of the table —
    * move it back; a crash before the swap leaves a stale half-written
    * staging `.compacting`/`.staging` sibling — delete it so the next
    * ATOMIC_MOVE doesn't target a non-empty directory (ENOTEMPTY).
    * Idempotent; safe to call before every compact/ingest run.
    */
  private[graft] def recoverSwap(path: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val p = Paths.get(path)
    val bak = Paths.get(path.stripSuffix("/") + ".old")
    if (Files.exists(bak) && !Files.exists(p))
      Files.move(bak, p, StandardCopyOption.ATOMIC_MOVE)
    else if (Files.exists(bak))
      org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
    Seq(".compacting", ".staging").foreach { suf =>
      val stale = Paths.get(path.stripSuffix("/") + suf)
      if (Files.exists(stale))
        org.apache.commons.io.FileUtils.deleteDirectory(stale.toFile)
    }
  }

  /** Bucketed catalog table: pre-shuffles data into `buckets` files per
    * the key so future equi-joins/aggregations on that key are
    * co-located — NO exchange at read time. This is the 100 TB answer to
    * repeated fact⋈fact joins on the same key (pay the shuffle once at
    * write): two tables bucketed the same way sort-merge join with zero
    * shuffle (see LakeAndOrchestrationSpec's plan assertion).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)
}
