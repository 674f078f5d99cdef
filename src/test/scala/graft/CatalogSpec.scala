package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.types.TimestampType

import graft.core.Tables

/** S1 catalog-by-name resolution + session-conf hygiene regressions. */
class CatalogSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("catalog-by-name resolves every table with path-based parity") {
    Tables.registerCatalog(spark, dir)
    Tables.all.foreach { t =>
      val byName = Tables.catalog(spark, s"${Tables.DefaultDb}.$t").count()
      val byPath =
        (if (t == "events") Tables.events(spark, dir) else Tables.load(spark, dir, t)).count()
      assert(byName === byPath, s"count mismatch for $t")
    }
  }

  test("catalog events view converts nanos to a timestamp column") {
    val ev = Tables.catalogTable(spark, dir, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema.fieldNames.toSeq === Tables.events(spark, dir).schema.fieldNames.toSeq)
  }

  test("re-registration against a different dir repoints the catalog") {
    Tables.registerCatalog(spark, "/root/testdata/sf0.001")
    val small = Tables.catalog(spark, s"${Tables.DefaultDb}.lineitem").count()
    Tables.registerCatalog(spark, "/root/testdata/sf0.01")
    val big = Tables.catalog(spark, s"${Tables.DefaultDb}.lineitem").count()
    assert(big > small)
    Tables.registerCatalog(spark, dir) // restore for other specs
  }

  test("cross-session re-registration never serves stale cached data") {
    // The external catalog is shared by all sessions of a context; the
    // idempotence cache must be keyed by the shared catalog, not the
    // session, or a sibling session's re-registration would be masked.
    Tables.registerCatalog(spark, "/root/testdata/sf0.001")
    val sibling = spark.newSession()
    sibling.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.registerCatalog(sibling, "/root/testdata/sf0.01")
    // original session asks for its dir again — must re-register, not
    // silently read the sibling's sf0.01 tables
    val n = Tables.catalogTable(spark, "/root/testdata/sf0.001", "lineitem").count()
    val expected = Tables.load(spark, "/root/testdata/sf0.001", "lineitem").count()
    assert(n === expected)
    Tables.registerCatalog(spark, dir) // restore
  }

  test("catalogTable scopes the db per-dir: names never repoint") {
    // Two dirs resolved concurrently land in distinct dbs, so neither
    // registration can repoint a name the other reader is using.
    assert(Tables.dbFor("/root/testdata/sf0.001") !== Tables.dbFor("/root/testdata/sf0.01"))
    val results = Await.result(
      Future.sequence(Seq(
        Future(Tables.catalogTable(spark, "/root/testdata/sf0.001", "lineitem").count()),
        Future(Tables.catalogTable(spark, "/root/testdata/sf0.01", "lineitem").count()),
        Future(Tables.catalogTable(spark, "/root/testdata/sf0.001", "lineitem").count()),
        Future(Tables.catalogTable(spark, "/root/testdata/sf0.01", "lineitem").count()))),
      2.minutes)
    assert(results(0) === results(2))
    assert(results(1) === results(3))
    assert(results(1) > results(0))
  }

  test("events loader is encoding-agnostic and never mutates session conf") {
    // The loader must serve CANONICAL TimestampType ts whatever the file's
    // physical encoding, without demanding or flipping session conf (the
    // r7 contract hard-coded nanos-as-long and broke when the testdata
    // re-encoded to TIMESTAMP(MICROS, NTZ)).
    val isolated = spark.newSession()
    isolated.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val e = Tables.events(isolated, dir)
    assert(e.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(e.count() > 0)
    // and the loader did NOT flip the conf behind the caller's back
    assert(isolated.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "false")
  }

  test("concurrent jobs read events without conf races") {
    val counts = Await.result(
      Future.sequence((1 to 4).map(_ => Future(Tables.events(spark, dir).count()))),
      2.minutes)
    assert(counts.distinct.size === 1)
  }
}
