package graft

import org.apache.spark.sql.functions._

/** Dev tool: confirm whether parquet aggregate pushdown (a DSv2-only
  * feature) answers the plausibility guard's bare-column min/max from
  * footer stats, per physical encoding.
  */
object ProfileAggPush {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    // v2 parquet path: remove parquet from the v1 fallback list
    val ss = spark.newSession()
    ss.conf.set("spark.sql.sources.useV1SourceList", "")
    ss.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    for (sf <- Seq("/root/testdata/sf0.001")) {
      val raw = ss.read.parquet(s"$sf/events.parquet")
      println(s"== $sf ts=${raw.schema("ts").dataType} ==")
      raw.agg(min(col("ts")), max(col("ts"))).explain("formatted")
      println(raw.agg(min(col("ts")), max(col("ts"))).head())
    }
    spark.stop()
  }
}
