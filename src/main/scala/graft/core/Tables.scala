package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Leaf-level footer contract on every load (O(new files), memoized):
    * a drifted-type delivery under ANY table refuses by file name instead
    * of silently reinterpreting raw values — the generalization of the
    * events.ts guard (VERDICT r8 #3). Events additionally gets the
    * plausibility band via [[events]].
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    SchemaContract.assertHomogeneous(
      spark.read.parquet(s"$dir/$name.parquet"), s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** The events table's `ts` physical encoding has DRIFTED across driver
    * releases (TIMESTAMP(NANOS) through round 7, TIMESTAMP(MICROS, NTZ)
    * since) — so the loader is encoding-agnostic: [[EventTime.canonicalTs]]
    * accepts nanos-as-long, NTZ micros, and plain TIMESTAMP, and
    * [[EventTime.assertPlausible]] refuses loudly (once per root) if a
    * future encoding decodes outside [2000, 2100). The loader never mutates
    * session conf ([[Sessions]] sets `nanosAsLong` once at setup so a
    * nanos-encoded file still reads).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    EventTime.canonicalTs(
      EventTime.assertPlausible(load(spark, dir, "events"), s"$dir/events.parquet"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

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
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      all.filterNot(_ == "events").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $db.$t")
        spark.sql(s"CREATE TABLE $db.$t USING parquet LOCATION '$dir/$t.parquet'")
      }
      spark.sql(s"DROP TABLE IF EXISTS $db.events_raw")
      spark.sql(s"DROP VIEW IF EXISTS $db.events")
      // guard BEFORE anything queryable exists: a refusal must not leave a
      // registered $db.events view serving mis-decoded data (ADVICE r8 —
      // previously the view was created first and a refusal stranded it)
      val raw = EventTime.assertPlausible(
        spark.read.parquet(s"$dir/events.parquet"), s"$dir/events.parquet")
      spark.sql(s"CREATE TABLE $db.events_raw USING parquet LOCATION '$dir/events.parquet'")
      // encoding-agnostic converting view — same canonicalization (and the
      // same plausibility gate) as [[events]], spelled in SQL per encoding
      val cols = raw.schema.fields.map { f =>
        (f.name, f.dataType) match {
          case ("ts", LongType) => "timestamp_micros(ts DIV 1000) AS ts"
          case ("ts", TimestampNTZType) => "CAST(ts AS TIMESTAMP) AS ts"
          case ("ts", TimestampType) => "ts"
          case ("ts", other) => throw new IllegalArgumentException(
            s"unsupported events.ts encoding in catalog registration: $other")
          case (name, _) => name
        }
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
