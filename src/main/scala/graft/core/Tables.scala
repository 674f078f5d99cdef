package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Source layer (SURVEY §2.1 S1/S2).
  *
  * The reference resolves catalog tables by name
  * (`ibs_ordinary_payment_utilities.py:25-26` style
  * `spark_session.table('processing_ibs.…')`); our engine resolves the
  * driver-generated parquet testdata identically by name, rooted at a
  * scale-factor directory. Scans are lazy DataFrames — Catalyst pushes
  * filters and prunes columns into the parquet reader.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set once at session setup by
    * [[Sessions]] — a loader must NOT mutate session conf, which would race
    * concurrent orchestrator jobs) and convert with integer division —
    * double division would lose precision on ~1e18 nano values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    requireNanosConf(spark)
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private[graft] def requireNanosConf(spark: SparkSession): Unit =
    require(
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events requires spark.sql.legacy.parquet.nanosAsLong=true; build the " +
        "session via graft.core.Sessions.local or pass it through Sessions.tune")

  // --- Catalog-by-name resolution (SURVEY §2.1 S1) -------------------------
  //
  // The reference's first operation is name-based catalog resolution
  // (`spark_session.table('processing_ibs.ibs_t_policy_payment_transaction')`,
  // ibs_ordinary_payment_utilities.py:25-26). Mirror it: register the
  // testdata as external parquet tables in a session-catalog database, then
  // resolve with spark.table("db.tbl"). The events table is registered as a
  // raw external table plus a converting VIEW, so by-name readers get the
  // same micros timestamp column as [[events]].

  val DefaultDb = "graft"

  // SHARED-catalog identity + db -> registered dir. Keyed by the
  // SparkContext (not the session): CREATE/DROP TABLE mutate the external
  // catalog that all sessions of a context share, so a per-session key
  // would let one session's re-registration silently invalidate another
  // session's cached entry and serve the wrong directory's data. The
  // context key includes applicationId so entries can't collide across
  // contexts even on an identityHashCode reuse.
  private val registeredDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def contextKey(spark: SparkSession): String =
    spark.sparkContext.applicationId + "#" +
      System.identityHashCode(spark.sparkContext)

  /** Directory-scoped database name: a stable hash of `dir`, so each data
    * directory registers under its OWN db and a table name, once resolved,
    * can never be silently repointed at a different directory by a sibling
    * session (the check-then-use race a shared mutable db would have under
    * the FAIR concurrent scheduler).
    */
  def dbFor(dir: String): String = {
    val crc = new java.util.zip.CRC32
    crc.update(dir.getBytes("UTF-8"))
    f"graft_${crc.getValue}%08x"
  }

  /** Register every testdata table under `db` (external parquet tables over
    * `dir`; metastore-backed, so `spark.table("graft.lineitem")` resolves).
    * Idempotent per (session, db, dir); re-registers when `dir` changes.
    * NOTE: re-registering a fixed `db` at a new dir repoints its names for
    * every concurrent reader — query paths use [[catalogTable]], which
    * scopes the db per-dir and so never repoints.
    */
  def registerCatalog(spark: SparkSession, dir: String, db: String = DefaultDb): Unit =
    registeredDirs.synchronized {
      val key = contextKey(spark) + "/" + db
      if (registeredDirs.get(key) == dir) return
      requireNanosConf(spark) // events_raw schema inference needs it
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      all.filterNot(_ == "events").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $db.$t")
        spark.sql(s"CREATE TABLE $db.$t USING parquet LOCATION '$dir/$t.parquet'")
      }
      spark.sql(s"DROP TABLE IF EXISTS $db.events_raw")
      spark.sql(s"CREATE TABLE $db.events_raw USING parquet LOCATION '$dir/events.parquet'")
      spark.sql(s"DROP VIEW IF EXISTS $db.events")
      val cols = spark.table(s"$db.events_raw").schema.fields.map { f =>
        if (f.name == "ts" && f.dataType == LongType) "timestamp_micros(ts DIV 1000) AS ts"
        else f.name
      }
      spark.sql(s"CREATE VIEW $db.events AS SELECT ${cols.mkString(", ")} FROM $db.events_raw")
      registeredDirs.put(key, dir)
    }

  /** Pure name-based resolution, the reference's `spark_session.table(...)`
    * shape — requires a prior [[registerCatalog]] (or any saveAsTable).
    */
  def catalog(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Register-if-needed + resolve by name: the S1 entry point for queries
    * that want catalog semantics against a scale-factor directory. The db
    * is scoped per-dir ([[dbFor]]), so concurrent jobs over different
    * directories each resolve their own names — registration is
    * write-once per db and the resolve can never observe a repoint.
    */
  def catalogTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    val db = dbFor(dir)
    registerCatalog(spark, dir, db)
    spark.table(s"$db.$table")
  }
}
