package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Per-root physical-schema contract guard — the generalization of
  * [[EventTime]]'s footer homogeneity check to EVERY table an incremental
  * ingest path reads (VERDICT r8 "Next round" #3).
  *
  * The failure class: a root accumulates deliveries over time under ONE
  * imposed read schema (sniffed at first read, or pinned by a catalog /
  * manifest). A later delivery whose files physically encode a column
  * differently is — for several encodings — absorbed by the parquet layer
  * with no error at all, silently reinterpreting raw values: INT64
  * timestamp unit drift (the r7 events bug), date-as-int32, decimal
  * rescale (raw unscaled ints read under the wrong scale), bare-binary
  * under a string schema. Others fail only at execution time, deep in a
  * job, with a per-row exception that names no file. This guard refuses
  * at the FOOTER, before any row flows, naming the file and column.
  *
  * Scale shape: one driver-side footer read per NEW (appId, schema, file)
  * triple, LRU-memoized like [[EventTime]] — O(delta) on live ingest
  * roots, no data pages touched. Columns whose parquet structure the
  * walker doesn't recognize (exotic legacy list encodings) are skipped,
  * never falsely refused.
  */
object SchemaContract {

  private val MemoCap = 1 << 20
  private val checked: java.util.Set[String] =
    java.util.Collections.newSetFromMap(java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > MemoCap
      }))

  /** Assert every backing file of `df` physically agrees with the schema
    * the frame imposes, leaf column by leaf column. Missing columns are
    * ALLOWED (schema evolution null-fills); type disagreements refuse by
    * file and column name. Returns `df` for chaining. Driver-side footer
    * IO only — never runs a Spark job.
    */
  def assertHomogeneous(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    val appId = spark.sparkContext.applicationId
    // imposed-schema digest in the memo key: if the root's sniffed schema
    // changes, every file re-checks against the new imposed types
    val schemaTag = df.schema.catalogString.hashCode.toHexString
    val newFiles = df.inputFiles.filter(f => !checked.contains(s"$appId#$schemaTag#$f"))
    if (newFiles.isEmpty) return df
    val conf = spark.sessionState.newHadoopConf()
    newFiles.foreach { file =>
      fileLeafTypes(conf, file).foreach { leaves =>
        leaves.foreach { case (path, fileType) =>
          imposedLeafType(df.schema, path).foreach { imposed =>
            require(compatible(fileType, imposed),
              s"schema-contract violation under '$key': file '$file' encodes " +
                s"column '${path.mkString(".")}' as $fileType but the root's " +
                s"imposed schema reads ${imposed.catalogString} — the parquet " +
                "layer would reinterpret or reject raw values mid-job. " +
                "Quarantine or re-encode the delivery; a root's physical " +
                "encoding must be homogeneous per column.")
          }
        }
      }
      checked.add(s"$appId#$schemaTag#$file")
    }
    df
  }

  /** Raw-compatible pairs beyond exact equality:
    *  - both micros-backed timestamp types (same raw INT64; the
    *    adjustedToUTC flag only changes display under a UTC session);
    *  - file STRING under imposed BINARY (string bytes ARE bytes — the
    *    reverse direction is the unsafe one and refuses).
    */
  private def compatible(file: DataType, imposed: DataType): Boolean = {
    def microsTs(t: DataType) = t == TimestampType || t == TimestampNTZType
    file == imposed ||
      (microsTs(file) && microsTs(imposed)) ||
      (file == StringType && imposed == BinaryType)
  }

  /** All leaf columns of one file's parquet schema, as (dotted path from
    * the root, Spark type the file natively surfaces under this engine's
    * session — TIMESTAMP(NANOS) is long via the pinned nanosAsLong flag).
    * None when the footer can't be read; unmappable leaves (INT96, exotic
    * annotations) are omitted individually.
    */
  private def fileLeafTypes(
      conf: org.apache.hadoop.conf.Configuration,
      file: String): Option[Seq[(Seq[String], DataType)]] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    try {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        Some(schema.getColumns.asScala.toSeq.flatMap { cd =>
          val path = cd.getPath.toSeq
          leafSparkType(cd.getPrimitiveType).map(t => (path, t))
        })
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Map one parquet primitive leaf to the Spark type it surfaces as.
    * None = unmappable, skip (never guess a refusal).
    */
  private def leafSparkType(
      t: org.apache.parquet.schema.PrimitiveType): Option[DataType] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val prim = t.getPrimitiveTypeName
    t.getLogicalTypeAnnotation match {
      case s: LogicalTypeAnnotation.StringLogicalTypeAnnotation => Some(StringType)
      case _: LogicalTypeAnnotation.EnumLogicalTypeAnnotation => Some(StringType)
      case _: LogicalTypeAnnotation.JsonLogicalTypeAnnotation => Some(StringType)
      case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
        Some(DecimalType(d.getPrecision, d.getScale))
      case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => Some(DateType)
      case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        ts.getUnit match {
          case TimeUnit.NANOS => Some(LongType) // nanosAsLong session contract
          case _ => Some(if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType)
        }
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
        (i.getBitWidth, i.isSigned) match {
          case (8, true) => Some(ByteType)
          case (16, true) => Some(ShortType)
          case (32, true) => Some(IntegerType)
          case (64, true) => Some(LongType)
          // Spark widens unsigned ints into the next signed type
          case (8, false) => Some(ShortType)
          case (16, false) => Some(IntegerType)
          case (32, false) => Some(LongType)
          case (64, false) => Some(DecimalType(20, 0))
          case _ => None
        }
      case null =>
        prim match {
          case INT32 => Some(IntegerType)
          case INT64 => Some(LongType)
          case FLOAT => Some(FloatType)
          case DOUBLE => Some(DoubleType)
          case BOOLEAN => Some(BooleanType)
          case BINARY => Some(BinaryType)
          case _ => None // INT96 / FIXED without annotation: no verdict
        }
      case _ => None // UUID, time-of-day, interval, …: no silent-drift class mapped
    }
  }

  /** Resolve a parquet leaf path against the imposed Spark schema. Walks
    * structs by field name (case-insensitive, Spark's resolution default),
    * standard 3-level lists (`list`/`element`) plus the legacy spellings
    * Spark's reader accepts (`bag`/`array`/`<name>_tuple`), and maps
    * (`key_value`.`key|value`). None when the column doesn't exist in the
    * imposed schema (evolution null-fill — allowed) or the structure is
    * unrecognized (skip, never falsely refuse).
    */
  private def imposedLeafType(schema: DataType, path: Seq[String]): Option[DataType] =
    (schema, path) match {
      case (t, Seq()) if !t.isInstanceOf[StructType] &&
        !t.isInstanceOf[ArrayType] && !t.isInstanceOf[MapType] => Some(t)
      case (s: StructType, head +: rest) =>
        s.fields.find(_.name.equalsIgnoreCase(head))
          .flatMap(f => imposedLeafType(f.dataType, rest))
      case (a: ArrayType, head +: rest) if Set("list", "bag", "array")(head.toLowerCase)
        || head.toLowerCase.endsWith("_tuple") =>
        rest match {
          // 3-level: list/element (or legacy array/item names) then recurse
          case inner +: tail if Set("element", "item", "array", "array_element")(
            inner.toLowerCase) => imposedLeafType(a.elementType, tail)
          // 2-level legacy: the repeated group IS the element
          case tail => imposedLeafType(a.elementType, tail)
        }
      case (m: MapType, head +: rest) if Set("key_value", "map")(head.toLowerCase) =>
        rest match {
          case Seq("key", tail @ _*) => imposedLeafType(m.keyType, tail)
          case Seq("value", tail @ _*) => imposedLeafType(m.valueType, tail)
          case _ => None
        }
      case _ => None
    }
}
