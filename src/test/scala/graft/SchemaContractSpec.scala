package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.SchemaContract
import graft.lake.Versioned

/** The generalized delivery-drift guard (VERDICT r8 "Next round" #3): the
  * silent-reinterpretation class that hit `events.ts` in r7 can hit ANY
  * table an incremental ingest reads under an imposed schema. These specs
  * pin that a drifted-type later delivery under documents- and
  * embeddings-shaped roots refuses BY FILE NAME at the footer, before any
  * row flows — and that legitimate schema evolution (added columns) and
  * benign micros-timestamp flips do NOT refuse.
  */
class SchemaContractSpec extends SparkSpec {
  import spark.implicits._

  /** Write `df` as a single parquet part named `name` under `dir`. */
  private def delive(dir: java.nio.file.Path, name: String, df: DataFrame): Unit = {
    val staging = Files.createTempDirectory("graft-sc-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging)
      .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, dir.resolve(name))
  }

  private def docsV0: DataFrame = Seq(
    (1L, "the quick brown fox", "web", BigDecimal("0.75")),
    (2L, "lorem ipsum dolor", "books", BigDecimal("0.50")))
    .toDF("doc_id", "text", "source", "quality")
    .select($"doc_id", $"text", $"source", $"quality".cast(DecimalType(18, 2)))

  test("decimal rescale drift under a documents root refuses by file name") {
    // decimal(18,4) stores raw unscaled ints 100x the (18,2) contract —
    // the parquet layer absorbs the read and silently divides wrong
    val dir = Files.createTempDirectory("graft-sc-docs")
    delive(dir, "delivery-0.parquet", docsV0)
    delive(dir, "delivery-1.parquet",
      docsV0.withColumn("quality", $"quality".cast(DecimalType(18, 4))))
    val raw = spark.read.schema(docsV0.schema).parquet(dir.toString)
    val e = intercept[IllegalArgumentException](
      SchemaContract.assertHomogeneous(raw, dir.toString))
    assert(e.getMessage.contains("delivery-1.parquet"), e.getMessage)
    assert(e.getMessage.contains("quality"), e.getMessage)
  }

  test("timestamp-unit drift in a non-events table refuses by file name") {
    // created_at drifts micros -> nanos (surfaces as long under the
    // session's nanosAsLong): raw INT64 reinterpreted 1000x off
    val dir = Files.createTempDirectory("graft-sc-ts")
    val base = Seq((1L, 1704067200000000L)).toDF("doc_id", "us")
    delive(dir, "delivery-0.parquet",
      base.select($"doc_id", timestamp_micros($"us").as("created_at")))
    delive(dir, "delivery-1.parquet",
      base.select($"doc_id", ($"us" * 1000L).as("created_at")))
    val raw = spark.read
      .schema("doc_id long, created_at timestamp").parquet(dir.toString)
    val e = intercept[IllegalArgumentException](
      SchemaContract.assertHomogeneous(raw, dir.toString))
    assert(e.getMessage.contains("delivery-1.parquet"), e.getMessage)
    assert(e.getMessage.contains("created_at"), e.getMessage)
  }

  test("embedding element-type drift (float->double) refuses by file name") {
    // array leaf columns are checked too: emb.list.element DOUBLE under an
    // imposed array<float> schema fails only mid-job otherwise
    val dir = Files.createTempDirectory("graft-sc-emb")
    val v0 = Seq((1L, Seq(0.1f, 0.2f))).toDF("vec_id", "emb")
    delive(dir, "delivery-0.parquet", v0)
    delive(dir, "delivery-1.parquet",
      v0.select($"vec_id", $"emb".cast(ArrayType(DoubleType)).as("emb")))
    val raw = spark.read.schema(v0.schema).parquet(dir.toString)
    val e = intercept[IllegalArgumentException](
      SchemaContract.assertHomogeneous(raw, dir.toString))
    assert(e.getMessage.contains("delivery-1.parquet"), e.getMessage)
    assert(e.getMessage.contains("emb"), e.getMessage)
  }

  test("added-column evolution and micros-TS flips are NOT drift") {
    val dir = Files.createTempDirectory("graft-sc-ok")
    val base = Seq((1L, 1704067200000000L)).toDF("doc_id", "us")
    delive(dir, "delivery-0.parquet",
      base.select($"doc_id", timestamp_micros($"us").as("created_at")))
    // NTZ flip of the same raw micros + a NEW column the imposed schema
    // already carries (older files null-fill it)
    delive(dir, "delivery-1.parquet",
      base.select($"doc_id",
        timestamp_micros($"us").cast(TimestampNTZType).as("created_at"),
        lit("en").as("lang")))
    val raw = spark.read
      .schema("doc_id long, created_at timestamp, lang string")
      .parquet(dir.toString)
    SchemaContract.assertHomogeneous(raw, dir.toString) // must not throw
    assert(raw.count() === 2)
  }

  test("Versioned.read carries the guard on its ingest path") {
    // publishDelta a good then a drifted delivery: the LIVE read refuses
    // (the shape IncrementalDedup's state tables read through)
    val root = Files.createTempDirectory("graft-sc-ver").toString + "/t"
    Versioned.publish(docsV0, root)
    Versioned.read(spark, root).count() // good state reads fine
    Versioned.publishDelta(
      docsV0.withColumn("quality", $"quality".cast(DecimalType(18, 4))), root)
    val e = intercept[IllegalArgumentException](
      Versioned.read(spark, root).count())
    assert(e.getMessage.contains("schema-contract violation"), e.getMessage)
    assert(e.getMessage.contains("quality"), e.getMessage)
  }
}
