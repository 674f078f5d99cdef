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
  *    `repartition(partitionCols)` aligns writer tasks with output
  *    folders so each folder is written by one task, while AQE re-splits
  *    skewed partitions.
  */
object LakeWriter {

  val ProductionMaxRecordsPerFile: Long = 2000000L

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
    df.repartition(col(partitionCol))
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
