package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Encoding-agnostic event-time ingestion (VERDICT r7 "Next round" #1-#3).
  *
  * The reference tolerates loosely-typed sources by defensive cast at every
  * boundary (`ibs_ordinary_payment_utilities.py:92-96`; SURVEY §1.2 "mixed
  * int/string input tolerated via defensive cast"). Round 7 shipped with the
  * opposite stance on the engine's own `events.ts` column — one hard-coded
  * physical encoding (INT64 TIMESTAMP(NANOS) read as long) — and a driver-
  * side re-encode to TIMESTAMP(MICROS, isAdjustedToUTC=false) silently broke
  * or garbled six entries. This object is the fix: ONE canonicalization
  * point that accepts every encoding the column has ever shipped with, and a
  * LOUD plausibility guard so a future drift refuses instead of answering.
  *
  * Canonical type: `TimestampType` (UTC-instant micros; sessions pin
  * `spark.sql.session.timeZone=UTC`, so the NTZ→instant cast is a pure
  * micros reinterpretation — bit-identical to what the DuckDB oracle reads
  * from the same file).
  */
object EventTime {

  /** Accepted plausible range for decoded event time: [2000-01-01,
    * 2100-01-01) UTC. A mis-decode (micros read as nanos, seconds as
    * micros, …) lands decades outside this band, so the guard catches every
    * off-by-10^3 family error while never tripping on real data.
    */
  private val MinPlausibleMs = java.time.Instant.parse("2000-01-01T00:00:00Z").toEpochMilli
  private val MaxPlausibleMs = java.time.Instant.parse("2100-01-01T00:00:00Z").toEpochMilli

  /** Canonicalize a timestamp column to `TimestampType`, whatever the
    * physical encoding:
    *
    *  - `LongType` — the legacy TIMESTAMP(NANOS) contract surfaced through
    *    `spark.sql.legacy.parquet.nanosAsLong` (kept ON in [[Sessions]] so a
    *    nanos-encoded file still READS; integer `DIV`, not double division,
    *    which would lose precision on ~1e18 nano values);
    *  - `TimestampNTZType` — TIMESTAMP(MICROS, isAdjustedToUTC=false), the
    *    encoding the testdata ships as of round 8; cast via the UTC session;
    *  - `TimestampType` — TIMESTAMP(MICROS, isAdjustedToUTC=true), what the
    *    engine's own parquet writes produce; pass-through.
    *
    * Any other type refuses loudly — canonicalization must never guess.
    */
  def canonicalTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"unsupported physical encoding for event-time column '$tsCol': $other; " +
            "expected INT64 nanos-as-long, TIMESTAMP_NTZ (micros), or TIMESTAMP")
    }

  /** Epoch extraction in MICROSECONDS, safe for every canonical-or-not
    * timestamp type (NTZ casts through the UTC session path; TimestampType
    * cast is a no-op). ALL epoch math in the engine routes through here —
    * never raw `unix_micros(col)` at call sites, which throws on NTZ.
    */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  // Memo granularity: per FILE — a live ingestion root that receives new
  // deliveries gets each NEW file checked exactly once (O(delta), the
  // IncrementalDedup discipline). Files whose footers can't answer are
  // memoized only AFTER the scan fallback has covered them, so a later
  // delivery in the unverdicted bucket is still checked (ADVICE r8: a
  // root-keyed fallback memo silently skipped every post-first-scan
  // delivery). Bounded LRU so a months-lived ingestion driver doesn't
  // grow the set without bound (VERDICT r8 #6): at the cap, the oldest
  // entries age out and an aged-out file merely re-checks — one footer
  // read — never mis-passes.
  private val MemoCap = 1 << 20
  private val checkedFiles: java.util.Set[String] =
    java.util.Collections.newSetFromMap(java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > MemoCap
      }))

  /** Assert the timestamps of the RAW (pre-canonicalization) frame land in
    * the plausible band once decoded, and that every backing file's
    * physical encoding AGREES with the schema the frame imposes — memoized
    * per (SparkContext, file). A wrong-encoding read produces 1970-era (or
    * year-52xxx) values at full speed with zero warnings (the r7
    * silent-garbage mode: x61 emitted 10 rows vs the oracle's 3385); this
    * turns that failure into an immediate, named refusal. The homogeneity
    * check closes the delivery-drift variant: a LATER file landing in a
    * root with a different INT64 meaning (e.g. a micros file under a
    * sniffed long-nanos schema) would be read raw with no error from the
    * parquet layer at all. Empty inputs pass (nothing to mis-decode).
    * Returns `df` for chaining.
    *
    * Scale shape: one driver-side footer read per NEW file, ever — no data
    * pages touched (Spark's v1 parquet source never answers min/max from
    * stats, so an agg would scan the column; measured in ProfileAggPush).
    * Files whose footers can't give a verdict (missing stats, INT96, …)
    * fall back to a distributed single-column min/max scan over EXACTLY
    * those files with driver-side decode (monotonic in every supported
    * encoding, so decode commutes with min/max), and are memoized only
    * after the scan passes — so a later unverdicted delivery is scanned
    * too, still O(new files), never O(root).
    *
    * NOTE: callers should not assume laziness — when the fallback engages
    * this method runs a Spark job (one narrow scan of the unverdicted
    * files) inside what otherwise looks like a loader.
    */
  def assertPlausible(df: DataFrame, key: String, tsCol: String = "ts"): DataFrame = {
    val spark = df.sparkSession
    val appId = spark.sparkContext.applicationId
    val imposed = df.schema(tsCol).dataType
    // memo includes the IMPOSED type: if a root's sniffed schema ever
    // changes (listing order moved a different-encoding file first),
    // every file re-checks against the new imposed type and the
    // heterogeneity refusal fires before any stream starts
    val newFiles = df.inputFiles.filter(f => !checkedFiles.contains(s"$appId#$imposed#$f"))
    if (newFiles.isEmpty) return df
    val conf = spark.sessionState.newHadoopConf()
    val unverdicted = scala.collection.mutable.ArrayBuffer.empty[String]
    newFiles.foreach { file =>
      footerVerdict(conf, file, tsCol) match {
        case Some((fileType, range)) =>
          // TimestampType vs TimestampNTZType is NOT drift: both are raw
          // INT64 micros, identical under the UTC-pinned session (the
          // adjustedToUTC flag changes only display semantics, which the
          // session normalizes away) — refusing that mix would contradict
          // the documented eventsStream contract (ADVICE r8). The hard
          // refusal is for mixes that reinterpret the raw INT64: a micros
          // file under a long-nanos schema or vice versa.
          require(fileType == imposed || (isMicrosTs(fileType) && isMicrosTs(imposed)),
            s"heterogeneous event-time encodings under '$key': file '$file' " +
              s"encodes $tsCol as $fileType but the root's imposed schema reads " +
              s"$imposed — one imposed schema cannot decode both (the parquet " +
              "layer reinterprets raw INT64 silently). Quarantine or re-encode " +
              "the delivery; a root's encoding must be homogeneous.")
          range.foreach { case (mnMs, mxMs) => requireBand(key, tsCol, mnMs, mxMs) }
          checkedFiles.add(s"$appId#$imposed#$file")
        case None => unverdicted += file
      }
    }
    if (unverdicted.nonEmpty) {
      // scan ONLY the files the footers couldn't answer for, under the
      // root's imposed schema (single pruned column — no full-row read)
      val slice = spark.read
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(tsCol, imposed))))
        .parquet(unverdicted.toSeq: _*)
      scanRangeMs(slice, tsCol).foreach { case (mnMs, mxMs) =>
        requireBand(key, tsCol, mnMs, mxMs)
      }
      unverdicted.foreach(f => checkedFiles.add(s"$appId#$imposed#$f"))
    }
    df
  }

  /** Both micros-backed timestamp Spark types — same raw INT64, same decode
    * under a UTC session; see the homogeneity check above.
    */
  private def isMicrosTs(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  private def requireBand(key: String, tsCol: String, mnMs: Long, mxMs: Long): Unit =
    require(mnMs >= MinPlausibleMs && mxMs < MaxPlausibleMs,
      s"event-time plausibility check FAILED for '$key': decoded $tsCol spans " +
        s"[${java.time.Instant.ofEpochMilli(mnMs)}, ${java.time.Instant.ofEpochMilli(mxMs)}], " +
        "outside [2000-01-01, 2100-01-01) — the physical encoding of the file " +
        "has likely drifted (micros read as nanos or vice versa). Refusing to " +
        "serve mis-decoded timestamps; fix EventTime.canonicalTs for the new encoding.")

  /** One file's footer verdict: the Spark type its annotation maps to
    * (under the engine's session — TIMESTAMP(NANOS) surfaces as long via
    * the nanosAsLong flag; annotation-less INT64 IS the nanos-as-long
    * contract) plus the row-group min/max decoded to epoch millis by the
    * file's OWN unit. None when the footer can't answer (missing column,
    * non-INT64 physical type, unusable stats, IO error) — the caller falls
    * back to the distributed scan.
    */
  private def footerVerdict(
      conf: org.apache.hadoop.conf.Configuration,
      file: String,
      tsCol: String): Option[(DataType, Option[(Long, Long)])] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    try {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf))
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        if (!schema.containsField(tsCol)) return None
        val t = schema.getType(schema.getFieldIndex(tsCol))
        if (!t.isPrimitive ||
          t.asPrimitiveType.getPrimitiveTypeName != PrimitiveTypeName.INT64)
          return None
        // (Spark type the file reads AS, raw-int64 → epoch-ms divisor)
        val (sparkType, divisor) = t.asPrimitiveType.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            val adjusted = ts.isAdjustedToUTC
            ts.getUnit match {
              case TimeUnit.NANOS => (LongType, 1000000L) // nanosAsLong path
              case TimeUnit.MICROS =>
                (if (adjusted) TimestampType else TimestampNTZType, 1000L)
              case TimeUnit.MILLIS =>
                (if (adjusted) TimestampType else TimestampNTZType, 1L)
            }
          case null => (LongType, 1000000L) // bare INT64: nanos-as-long contract
          case _ => return None
        }
        var lo = Long.MaxValue
        var hi = Long.MinValue
        footer.getBlocks.asScala.foreach { b =>
          b.getColumns.asScala.filter(_.getPath.toDotString == tsCol).foreach { cc =>
            val st: org.apache.parquet.column.statistics.Statistics[_] =
              cc.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue) {
              // an all-null chunk is skippable; anything else → no verdict
              if (!(st != null && st.isNumNullsSet && st.getNumNulls == b.getRowCount))
                return None
            } else {
              lo = math.min(lo, st.genericGetMin.asInstanceOf[Number].longValue / divisor)
              hi = math.max(hi, st.genericGetMax.asInstanceOf[Number].longValue / divisor)
            }
          }
        }
        Some((sparkType, if (lo > hi) None else Some((lo, hi))))
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed fallback: single-column min/max over the raw frame,
    * decoded driver-side on the two scalars. None for empty inputs.
    */
  private def scanRangeMs(df: DataFrame, tsCol: String): Option[(Long, Long)] = {
    def decodedMs(v: Any): Long = v match {
      case l: java.lang.Long => l / 1000000L // nanos-as-long
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case d: java.time.LocalDateTime => // NTZ surfaces as LocalDateTime
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => throw new IllegalArgumentException(
        s"unsupported event-time scalar ${other.getClass} for '$tsCol'")
    }
    val row = df.agg(min(col(tsCol)).as("mn"), max(col(tsCol)).as("mx")).head()
    if (row.isNullAt(0)) None
    else Some((decodedMs(row.get(0)), decodedMs(row.get(1))))
  }
}
