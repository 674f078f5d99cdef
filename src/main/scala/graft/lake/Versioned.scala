package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version-pointer table layout: the truly gap-free publish that an
  * in-place directory swap cannot provide (between "move old aside" and
  * "move staging in" the table path does not exist; see
  * [[LakeWriter.compact]]'s contract note).
  *
  * Layout under a table root:
  * {{{
  *   root/v000001/...parquet     immutable version directories
  *   root/v000002/...parquet
  *   root/_CURRENT               manifest: one live version dir per line
  * }}}
  *
  * The `_CURRENT` pointer is a MANIFEST — the list of directories whose
  * union is the table. A snapshot [[publish]] writes a brand-new version
  * directory and repoints the manifest to just it; a log-structured
  * [[publishDelta]] appends the new directory to the manifest, making
  * appends O(delta) — corpus-sized tables grow by delivery without ever
  * rewriting history (the minimal form of the Delta/Iceberg log).
  * Either way the pointer flips with an atomic file replace (write
  * `_CURRENT.tmp`, `ATOMIC_MOVE` onto `_CURRENT`), so there is NO
  * instant at which the table is missing or partially written: a reader
  * resolves a complete manifest of immutable directories before or after
  * the flip, never between.
  *
  * Crash safety (single-writer discipline, which the orchestrator's
  * job-control layer provides): a crash before the pointer move leaves an
  * orphan version directory the manifest never references — readers are
  * unaffected and [[vacuum]] reclaims it. A crash after the move is a
  * completed publish. No recovery step is ever required to read.
  *
  * Scale notes: on an object store the pointer becomes a small
  * put-if-match object, and version directories are never renamed (S3
  * renames are copies; the pointer is the only thing that changes).
  * [[compact]] folds a long manifest back to one directory; [[vacuum]]
  * keeps a window of recently unreferenced directories so in-flight
  * readers of a previous manifest finish before their files disappear.
  */
object Versioned {

  private val Pointer = "_CURRENT"
  private val VerDir = """v(\d{6})""".r

  private def root(p: String): Path = Paths.get(p.stripSuffix("/"))

  private def listVersions(rootPath: Path): Seq[Int] =
    if (!Files.isDirectory(rootPath)) Nil
    else
      Files.list(rootPath).iterator.asScala
        .map(_.getFileName.toString)
        .collect { case VerDir(n) => n.toInt }
        .toSeq
        .sorted

  /** The live manifest: version numbers whose directories' union is the
    * table (one entry for snapshot tables, many for log tables). Empty if
    * never published.
    */
  def manifest(tableRoot: String): Seq[Int] = {
    val ptr = root(tableRoot).resolve(Pointer)
    if (!Files.exists(ptr)) Nil
    else
      new String(Files.readAllBytes(ptr), "UTF-8")
        .linesIterator.map(_.trim).filter(_.nonEmpty)
        .map {
          case VerDir(n) => n.toInt
          case other => throw new IllegalStateException(
            s"corrupt $Pointer manifest entry: '$other'")
        }
        .toSeq
  }

  /** The highest live version number, if the table has ever been
    * published.
    */
  def currentVersion(tableRoot: String): Option[Int] =
    manifest(tableRoot).maxOption

  private def dirName(v: Int): String = f"v$v%06d"

  private def writeDir(
      df: DataFrame, rootPath: Path, maxRecordsPerFile: Long): Int = {
    Files.createDirectories(rootPath)
    // next = max over DIRECTORIES (not the manifest): a crashed publish
    // leaves an orphan dir above the manifest, and reusing its number
    // would write into a non-empty directory
    val next = listVersions(rootPath).lastOption.getOrElse(0) + 1
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "snappy")
      .parquet(rootPath.resolve(dirName(next)).toString)
    next
  }

  private def flipPointer(rootPath: Path, versions: Seq[Int]): Unit = {
    val tmp = rootPath.resolve(Pointer + ".tmp")
    Files.write(tmp,
      versions.map(dirName).mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.move(tmp, rootPath.resolve(Pointer),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Publish `df` as the complete new table state (snapshot semantics)
    * and atomically repoint readers to it. Returns the published version
    * number. Previous versions' files are untouched (reclaim with
    * [[vacuum]]).
    */
  def publish(
      df: DataFrame,
      tableRoot: String,
      maxRecordsPerFile: Long = LakeWriter.ProductionMaxRecordsPerFile): Int = {
    val rootPath = root(tableRoot)
    val next = writeDir(df, rootPath, maxRecordsPerFile)
    flipPointer(rootPath, Seq(next))
    next
  }

  /** Append `df` as a new delta of a log-structured table: the manifest
    * grows by one directory, history is never rewritten — O(delta) work
    * per delivery regardless of table size. Returns the new version
    * number. Fold a long manifest with [[compact]].
    */
  def publishDelta(
      df: DataFrame,
      tableRoot: String,
      maxRecordsPerFile: Long = LakeWriter.ProductionMaxRecordsPerFile): Int = {
    val rootPath = root(tableRoot)
    val prev = manifest(tableRoot)
    val next = writeDir(df, rootPath, maxRecordsPerFile)
    flipPointer(rootPath, prev :+ next)
    next
  }

  /** Read the live table: the union of the manifest's directories (one
    * scan for snapshot tables). Never observes a partial or missing
    * table: the manifest flips atomically between sets of immutable
    * directories.
    */
  def read(spark: SparkSession, tableRoot: String): DataFrame = {
    val live = manifest(tableRoot)
    if (live.isEmpty)
      throw new IllegalStateException(s"no published version under $tableRoot")
    val paths = live.map(v => root(tableRoot).resolve(dirName(v)).toString)
    spark.read.parquet(paths: _*)
  }

  /** True once the table has a published manifest. */
  def exists(tableRoot: String): Boolean = manifest(tableRoot).nonEmpty

  /** Rewrite the live table into ceil(bytes/targetBytes) files in ONE
    * directory and publish it as the new manifest — collapses a
    * log-structured table's delta chain and compacts small files, with
    * no reader-visible window. Returns the new version number.
    */
  def compact(
      spark: SparkSession,
      tableRoot: String,
      targetBytes: Long = 256L * 1024 * 1024): Int = {
    val df = read(spark, tableRoot)
    val totalBytes = df.inputFiles.map(f =>
      Files.size(Paths.get(new java.net.URI(f)))).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    publish(df.repartition(nFiles), tableRoot)
  }

  /** Delete version directories the manifest no longer references,
    * retaining the `keep - 1` most recent unreferenced ones (so readers
    * that resolved a just-replaced manifest finish before their files
    * disappear). Orphans of crashed publishes are reclaimed the same
    * way; under the single-writer discipline nothing else writes there.
    * Returns the number of directories removed.
    */
  def vacuum(tableRoot: String, keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the live manifest")
    val rootPath = root(tableRoot)
    val live = manifest(tableRoot).toSet
    if (live.isEmpty) return 0
    val unreferenced = listVersions(rootPath).filterNot(live)
    val doomed = unreferenced.dropRight(keep - 1)
    doomed.foreach { v =>
      org.apache.commons.io.FileUtils
        .deleteDirectory(rootPath.resolve(dirName(v)).toFile)
    }
    doomed.size
  }
}
