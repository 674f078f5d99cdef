package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.core.SchemaContract

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

  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator.asScala.toList
    finally s.close() // directory streams hold a file descriptor
  }

  private def listVersions(rootPath: Path): Seq[Int] =
    if (!Files.isDirectory(rootPath)) Nil
    else
      listDir(rootPath)
        .map(_.getFileName.toString)
        .collect { case VerDir(n) => n.toInt }
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

  private val StatsFile = "_GRAFT_STATS.tsv"
  private val MetaFile = "_GRAFT_META"

  /** Exact row count of the live table from per-version metadata — no
    * scan; recorded at publish time by an Observation riding the write.
    * None if any live directory predates metadata recording.
    */
  def publishedRows(tableRoot: String): Option[Long] = {
    val live = manifest(tableRoot)
    if (live.isEmpty) return None
    val counts = live.map { v =>
      val f = root(tableRoot).resolve(dirName(v)).resolve(MetaFile)
      if (!Files.exists(f)) return None
      new String(Files.readAllBytes(f), "UTF-8").linesIterator
        .collectFirst { case l if l.startsWith("rows=") => l.stripPrefix("rows=").toLong }
        .getOrElse(return None)
    }
    Some(counts.sum)
  }

  private def writeDir(
      df: DataFrame, rootPath: Path, maxRecordsPerFile: Long,
      statsCols: Seq[String]): Int = {
    Files.createDirectories(rootPath)
    // next = max over DIRECTORIES (not the manifest): a crashed publish
    // leaves an orphan dir above the manifest, and reusing its number
    // would write into a non-empty directory
    val next = listVersions(rootPath).lastOption.getOrElse(0) + 1
    val dir = rootPath.resolve(dirName(next))
    // row count observed DURING the write (Observation rides the action —
    // no second scan), recorded with the version for reconciliation
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "snappy")
      .parquet(dir.toString)
    Files.write(dir.resolve(MetaFile),
      s"rows=${obs.get("rows")}\n".getBytes("UTF-8"))
    if (statsCols.nonEmpty) {
      // Per-file min/max from the parquet FOOTERS of the just-written
      // files — no second data scan (re-reading the write to compute
      // stats costs as much as the write itself at 100 TB; footers are
      // O(files) metadata reads). Written INSIDE the version dir before
      // the pointer flips, so stats publish atomically with their data.
      // A column whose footer stats are missing, NaN-tainted, non-plain
      // (decimal/timestamp/date annotations change the physical-value
      // scale vs readWhere's double cast), or otherwise unusable records
      // the "na" sentinel → readWhere treats the file as unprunable.
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val lines = listDir(dir)
        .filter { p =>
          val name = p.getFileName.toString
          name.endsWith(".parquet") && !name.startsWith("_") &&
            !name.startsWith(".")
        }
        .sortBy(_.getFileName.toString)
        .flatMap { p =>
          val ranges = footerRanges(conf, p, statsCols)
          statsCols.map { c =>
            ranges.getOrElse(c, None) match {
              case Some((mn, mx)) => s"${p.getFileName}\t$c\t$mn\t$mx"
              case None => s"${p.getFileName}\t$c\tna\tna"
            }
          }
        }
      Files.write(dir.resolve(StatsFile),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    next
  }

  /** Footer min/max per requested column for one parquet file, as
    * doubles comparable with [[readWhere]]'s `cast("double")` filter.
    * `None` = no usable range (the conservative, never-wrong answer):
    * non-primitive or annotated logical types (decimal/timestamp/date
    * physical values are scaled differently than Spark's double cast),
    * chunks with absent/invalid statistics (parquet drops FP stats on
    * NaN — exactly the case where a naive min/max would prune wrongly),
    * or an all-null file (no range at all). All-null CHUNKS inside a
    * file with other valid chunks contribute nothing — a range filter
    * never matches null rows, so that stays exact.
    */
  private def footerRanges(
      conf: org.apache.hadoop.conf.Configuration, file: Path,
      cols: Seq[String]): Map[String, Option[(Double, Double)]] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri), conf))
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      val plainNumeric = Set[PrimitiveTypeName](
        PrimitiveTypeName.INT32, PrimitiveTypeName.INT64,
        PrimitiveTypeName.FLOAT, PrimitiveTypeName.DOUBLE)
      cols.map { c =>
        val usable = schema.getFieldCount > 0 &&
          schema.containsField(c) && {
            val t = schema.getType(schema.getFieldIndex(c))
            t.isPrimitive &&
              t.asPrimitiveType.getLogicalTypeAnnotation == null &&
              plainNumeric(t.asPrimitiveType.getPrimitiveTypeName)
          }
        if (!usable) c -> None
        else {
          var lo = Double.PositiveInfinity
          var hi = Double.NegativeInfinity
          var valid = true
          var any = false
          footer.getBlocks.asScala.foreach { b =>
            b.getColumns.asScala
              .filter(_.getPath.toDotString == c)
              .foreach { cc =>
                val st = cc.getStatistics
                if (st == null || st.isEmpty) valid = false
                else if (!st.hasNonNullValue) {
                  // stats present but no value range: an all-null chunk
                  // (numNulls == chunk rows) is safely skippable; anything
                  // else (e.g. NaN-dropped FP stats) poisons the range
                  if (!(st.isNumNullsSet && st.getNumNulls == b.getRowCount))
                    valid = false
                } else {
                  val mn = st.genericGetMin.asInstanceOf[Number].doubleValue
                  val mx = st.genericGetMax.asInstanceOf[Number].doubleValue
                  if (java.lang.Double.isFinite(mn) &&
                    java.lang.Double.isFinite(mx)) {
                    if (mn < lo) lo = mn
                    if (mx > hi) hi = mx
                    any = true
                  } else valid = false
                }
              }
          }
          c -> (if (valid && any) Some((lo, hi)) else None)
        }
      }.toMap
    } finally reader.close()
  }

  /** Per-file [min, max] entries of `column` for one version dir, if the
    * dir was published with stats covering it. A file's inner Option is
    * `None` for the "na" sentinel (no usable range — the file must be
    * read). Legacy stats written by the pre-footer implementation could
    * contain textual NaN; those parse to `None` too rather than flowing
    * into a range test where every NaN comparison is false (a file with
    * in-range rows would be silently pruned).
    */
  private def fileStats(
      dir: Path, column: String): Option[Map[String, Option[(Double, Double)]]] = {
    val f = dir.resolve(StatsFile)
    if (!Files.exists(f)) None
    else {
      val entries = new String(Files.readAllBytes(f), "UTF-8")
        .linesIterator.filter(_.nonEmpty).map(_.split('\t'))
        .collect { case Array(file, c, lo, hi) if c == column =>
          file -> (
            if (lo == "na" || hi == "na") None
            else {
              val (l, h) = (lo.toDouble, hi.toDouble)
              if (java.lang.Double.isFinite(l) && java.lang.Double.isFinite(h))
                Some((l, h))
              else None
            })
        }
        .toMap
      if (entries.isEmpty) None else Some(entries)
    }
  }

  private val History = "_HISTORY"

  private def flipPointer(rootPath: Path, versions: Seq[Int]): Unit = {
    val tmp = rootPath.resolve(Pointer + ".tmp")
    Files.write(tmp,
      versions.map(dirName).mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.move(tmp, rootPath.resolve(Pointer),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // append-only publish log: one line per flip, enabling time travel.
    // Appended AFTER the pointer flip — a crash between the two leaves
    // the newest manifest missing from history (readable live, not
    // time-travelable), never a phantom entry.
    Files.write(rootPath.resolve(History),
      (versions.map(dirName).mkString(",") + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** The publish log: every manifest this table has ever pointed at, in
    * flip order (last = live). Time-travel index for [[readAsOf]].
    *
    * Crash tolerance: a torn trailing line (append died mid-write) is
    * dropped, and when the log's last entry disagrees with the live
    * manifest (crash between pointer flip and append) the live manifest
    * is virtually appended — so the last entry ALWAYS reflects what
    * [[read]] serves ("-1 = live" holds across crashes; the un-logged
    * intermediate publish is readable live but not time-travelable,
    * which the flip-order comment documents).
    */
  def history(tableRoot: String): Seq[Seq[Int]] = {
    val f = root(tableRoot).resolve(History)
    val logged: Seq[Seq[Int]] =
      if (!Files.exists(f)) Nil
      else {
        val raw = new String(Files.readAllBytes(f), "UTF-8")
        val lines = raw.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
        lines.zipWithIndex.flatMap { case (line, i) =>
          val parts = line.split(',').toSeq
          if (parts.forall(VerDir.matches))
            Some(parts.map { case VerDir(n) => n.toInt })
          else if (i == lines.size - 1 && !raw.endsWith("\n"))
            None // torn trailing append — drop it
          else throw new IllegalStateException(
            s"corrupt $History entry: '$line'")
        }
      }
    val live = manifest(tableRoot)
    if (live.nonEmpty && !logged.lastOption.contains(live)) logged :+ live
    else logged
  }

  /** Time travel: read the table as of publish `ordinal` (0-based index
    * into [[history]]; negative counts from the end, -1 = live). Fails
    * if [[vacuum]] already reclaimed a directory that manifest needs —
    * retention (`keep`) is the time-travel horizon.
    */
  def readAsOf(spark: SparkSession, tableRoot: String, ordinal: Int): DataFrame = {
    val h = history(tableRoot)
    require(h.nonEmpty, s"no publish history under $tableRoot")
    val idx = if (ordinal < 0) h.size + ordinal else ordinal
    require(idx >= 0 && idx < h.size,
      s"publish ordinal $ordinal out of range (${h.size} publishes)")
    val wanted = h(idx)
    val missing = wanted.filterNot(v =>
      Files.isDirectory(root(tableRoot).resolve(dirName(v))))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"publish #$idx needs vacuumed version(s) ${missing.mkString(", ")} — " +
          "raise vacuum's keep to widen the time-travel horizon")
    val paths = wanted.map(v => root(tableRoot).resolve(dirName(v)).toString)
    SchemaContract.assertHomogeneous(spark.read.parquet(paths: _*), tableRoot)
  }

  /** Compaction-need policy: true when the manifest chain is longer than
    * `maxManifestLen` (delta-read fan-out) or the live table's mean file
    * size fell under `minFileBytes` (small-file reader tax) — the two
    * signals a maintenance scheduler acts on.
    */
  def needsCompaction(
      tableRoot: String,
      maxManifestLen: Int = 8,
      minFileBytes: Long = 32L * 1024 * 1024): Boolean = {
    val live = manifest(tableRoot)
    if (live.isEmpty) return false
    if (live.size > maxManifestLen) return true
    val files = live.flatMap { v =>
      listDir(root(tableRoot).resolve(dirName(v)))
        .filter(_.getFileName.toString.endsWith(".parquet"))
    }
    // a single file can't be folded further — without this, any table
    // whose TOTAL size is under minFileBytes would re-compact forever
    files.size > 1 &&
      files.map(Files.size).sum / files.size < minFileBytes
  }

  /** Publish `df` as the complete new table state (snapshot semantics)
    * and atomically repoint readers to it. Returns the published version
    * number. Previous versions' files are untouched (reclaim with
    * [[vacuum]]).
    */
  def publish(
      df: DataFrame,
      tableRoot: String,
      maxRecordsPerFile: Long = LakeWriter.ProductionMaxRecordsPerFile,
      statsCols: Seq[String] = Nil): Int = {
    val rootPath = root(tableRoot)
    val next = writeDir(df, rootPath, maxRecordsPerFile, statsCols)
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
      maxRecordsPerFile: Long = LakeWriter.ProductionMaxRecordsPerFile,
      statsCols: Seq[String] = Nil): Int = {
    val rootPath = root(tableRoot)
    val prev = manifest(tableRoot)
    val next = writeDir(df, rootPath, maxRecordsPerFile, statsCols)
    flipPointer(rootPath, prev :+ next)
    next
  }

  /** Read the live table: the union of the manifest's directories (one
    * scan for snapshot tables). Never observes a partial or missing
    * table: the manifest flips atomically between sets of immutable
    * directories.
    */
  def read(
      spark: SparkSession,
      tableRoot: String,
      mergeSchema: Boolean = false): DataFrame = {
    val live = manifest(tableRoot)
    if (live.isEmpty)
      throw new IllegalStateException(s"no published version under $tableRoot")
    val paths = live.map(v => root(tableRoot).resolve(dirName(v)).toString)
    // mergeSchema: log tables whose deltas EVOLVED (added columns) union
    // under the merged schema, older deltas null-filling the new columns
    // — pay the extra footer pass only when evolution is expected
    SchemaContract.assertHomogeneous(
      spark.read.option("mergeSchema", mergeSchema).parquet(paths: _*), tableRoot)
  }

  /** True once the table has a published manifest. */
  def exists(tableRoot: String): Boolean = manifest(tableRoot).nonEmpty

  /** Enforce the single-writer discipline the layout assumes: an
    * advisory `_WRITER_LOCK` taken with an atomic create-new (the same
    * primitive object stores expose as if-none-match put). A second
    * writer fails fast instead of interleaving version allocations. The
    * lock never gates READERS — publishes stay gap-free without it.
    *
    * A crashed holder leaves a stale lock. `breakLock` removes it after
    * the operator confirms the holder is gone, and callers on unattended
    * build-if-absent paths may pass `staleAfterMillis`: a lock whose
    * mtime is older than that is presumed abandoned. Three properties
    * make the break safe against the races a naive delete+create has:
    * (1) LIVE holders under a finite horizon heartbeat the lock's mtime
    * every horizon/3, so only a genuinely dead holder's lock ever ages
    * out — a merely-slow writer keeps its lock fresh at any runtime;
    * (2) the break itself is an ATOMIC_MOVE of the stale file to a
    * contender-unique name — exactly one contender wins the move, and
    * nobody ever deletes a lock another contender just re-created;
    * (3) the lock body carries a per-acquisition token, and release
    * deletes the lock only if the token is still ours.
    */
  def withWriterLock[A](
      tableRoot: String,
      staleAfterMillis: Long = Long.MaxValue)(body: => A): A = {
    val rootPath = root(tableRoot)
    Files.createDirectories(rootPath)
    val lock = rootPath.resolve("_WRITER_LOCK")
    val token =
      s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}:" +
        java.util.UUID.randomUUID().toString
    def acquire(): Unit =
      Files.write(lock, s"$token\n".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    def failFast(): Nothing = {
      val holder =
        try new String(Files.readAllBytes(lock), "UTF-8").trim
        catch { case _: java.io.IOException => "<unknown>" }
      throw new IllegalStateException(
        s"another writer holds $tableRoot (holder: $holder); " +
          "if it crashed, Versioned.breakLock(tableRoot) releases it")
    }
    try acquire()
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val ageMs =
          try System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis
          catch { case _: java.io.IOException => -1L } // holder just released
        if (ageMs >= 0 && ageMs <= staleAfterMillis) failFast()
        // presumed-dead holder (or lock vanished between the failed
        // create and the stat). Break by ATOMIC_MOVE to a unique name:
        // one contender wins the stale file; everyone — winner or not —
        // then re-contends a single CREATE_NEW, so at most one enters
        // and no contender can delete another's fresh lock.
        if (ageMs >= 0) {
          val grave = rootPath.resolve(
            s"_WRITER_LOCK.broken.${java.util.UUID.randomUUID()}")
          try {
            Files.move(lock, grave, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            Files.deleteIfExists(grave)
          } catch { case _: java.io.IOException => () } // another contender won
        }
        try acquire()
        catch { case _: java.nio.file.FileAlreadyExistsException => failFast() }
    }
    // Heartbeat while the body runs: a finite horizon is only safe if a
    // LIVE holder can never age out, whatever its runtime.
    val beat: Option[java.util.concurrent.ScheduledExecutorService] =
      if (staleAfterMillis == Long.MaxValue || staleAfterMillis <= 0) None
      else {
        val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
          r => { val t = new Thread(r, "graft-writer-lock-heartbeat"); t.setDaemon(true); t })
        val period = math.max(1L, staleAfterMillis / 3L)
        ex.scheduleAtFixedRate(
          () => try Files.setLastModifiedTime(lock,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch { case _: java.io.IOException => () },
          period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
        Some(ex)
      }
    try body
    finally {
      beat.foreach(_.shutdownNow())
      // release only OUR acquisition: if the horizon was misjudged and a
      // contender legitimately broke us, its fresh lock must survive
      val ours =
        try new String(Files.readAllBytes(lock), "UTF-8").trim == token
        catch { case _: java.io.IOException => false }
      if (ours) Files.deleteIfExists(lock)
    }
  }

  /** Remove a stale writer lock after confirming its holder is dead. */
  def breakLock(tableRoot: String): Boolean =
    Files.deleteIfExists(root(tableRoot).resolve("_WRITER_LOCK"))

  /** Stale-lock horizon for UNATTENDED build-if-absent paths (ANN index
    * builds, incremental-dedup state updates): long enough that no live
    * holder at bench scale plausibly still runs, short enough that a
    * crashed first-builder doesn't wedge every later caller until a
    * human runs `breakLock`. Attended/interactive publishes should keep
    * the permanent default and page the operator instead.
    */
  val UnattendedStaleLockMillis: Long = 30L * 60L * 1000L

  /** Range read with file-level stat pruning: version dirs published with
    * `statsCols` covering `column` contribute only files whose
    * [min, max] intersects [lo, hi]; dirs without stats contribute all
    * their files (correctness never depends on stats). The residual
    * filter is applied on top, so the result is exactly
    * `read(...).where(column between lo and hi)` — with (lay the data
    * out via [[ZOrder.zArrange]]) most files never opened. This is
    * manifest-level data skipping: at 100 TB the win is in LISTING and
    * footer reads, before any row group is touched.
    */
  def readWhere(
      spark: SparkSession,
      tableRoot: String,
      column: String,
      lo: Double,
      hi: Double): DataFrame = {
    val live = manifest(tableRoot)
    if (live.isEmpty)
      throw new IllegalStateException(s"no published version under $tableRoot")
    val filter = col(column).cast("double") >= lit(lo) &&
      col(column).cast("double") <= lit(hi)
    val selected: Seq[String] = live.flatMap { v =>
      val dir = root(tableRoot).resolve(dirName(v))
      fileStats(dir, column) match {
        case Some(stats) =>
          stats.collect {
            // no usable range (na sentinel / legacy NaN) → never prune
            case (file, None) => dir.resolve(file).toString
            case (file, Some((mn, mx))) if mn <= hi && mx >= lo =>
              dir.resolve(file).toString
          }
        case None =>
          // filter on the file NAME: matching "/_" against the whole path
          // would drop every file of a table rooted under an
          // underscore-prefixed directory
          listDir(dir)
            .filter { p =>
              val name = p.getFileName.toString
              name.endsWith(".parquet") && !name.startsWith("_") &&
                !name.startsWith(".")
            }
            .map(_.toString)
      }
    }
    if (selected.isEmpty) read(spark, tableRoot).where(lit(false))
    else SchemaContract.assertHomogeneous(
      spark.read.parquet(selected: _*), tableRoot).where(filter)
  }

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
    // Reconcile the byte target with the record cap: a flat 2M-record cap
    // re-splits each byte-targeted partition of a NARROW schema into
    // undersized files — the 100× write-path rehearsal measured 6 × ≤53 MB
    // against a 256 MB target because 2M rows of the events schema is only
    // ~53 MB on disk. Derive records-per-file from the observed on-disk
    // bytes/row (meta row counts — no scan), with 20% headroom over the
    // even split so repartition imbalance doesn't shave off a tiny tail
    // file; worst case ≈ 1.2 × target, inside the 128–512 MB guidance.
    val recordsPerFile = publishedRows(tableRoot) match {
      case Some(rows) if rows > 0 && totalBytes > 0 =>
        math.max(1L, (rows.toDouble * targetBytes / totalBytes * 1.2).toLong)
      case _ => LakeWriter.ProductionMaxRecordsPerFile
    }
    // and fold the chain WITHOUT losing readWhere's file skipping: re-record
    // per-file pruning stats for every column the live chain had stats for,
    // and RE-CLUSTER on them — round-robin folding scatters each file's
    // min/max across the whole domain, which keeps the stats while making
    // every one unprunable. Range partitioning restores contiguous
    // per-file ranges (first column dominates; multi-column rectangles
    // are [[ZOrder]]'s job, not compact's).
    val statsCols = liveStatsColumns(tableRoot)
    val folded =
      if (statsCols.nonEmpty) df.repartitionByRange(nFiles, statsCols.map(col): _*)
      else df.repartition(nFiles)
    publish(folded, tableRoot,
      maxRecordsPerFile = recordsPerFile, statsCols = statsCols)
  }

  /** Columns with recorded per-file pruning stats anywhere in the LIVE
    * manifest (union over the version dirs' stats files) — what [[compact]]
    * re-records, so folding a delta chain doesn't silently demote
    * [[readWhere]] from file-skipping to full scans.
    */
  private def liveStatsColumns(tableRoot: String): Seq[String] =
    manifest(tableRoot).flatMap { v =>
      val f = root(tableRoot).resolve(dirName(v)).resolve(StatsFile)
      if (!Files.exists(f)) Nil
      else new String(Files.readAllBytes(f), "UTF-8").linesIterator
        .filter(_.nonEmpty).map(_.split('\t'))
        .collect { case a if a.length == 4 => a(1) }.toSeq
    }.distinct

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
