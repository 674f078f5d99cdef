package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 probe: decompose x35_curation — quality projection, clusters
  * (pairs + components), gated join, survivor window — to find where the
  * isolated ~5 s goes. Usage: Test/runMain graft.ProfileR21Curate
  */
object ProfileR21Curate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.Tables.documents(spark, dir)
    (1 to 3).foreach { i =>
      time(s"quality run$i") {
        noop(graft.ext.TextAnalysis.qualityFeatures(docs, "text")
          .select(col("doc_id"), col("lang"), col("quality_score"),
            md5(graft.ext.TextAnalysis.scrub(col("text"))).as("scrubbed_md5"),
            size(graft.ext.TextAnalysis.tokens(col("text"))).as("n_tokens")))
      }
      time(s"clusters run$i") {
        noop(graft.ext.Dedup.clusters(docs, "doc_id", "text", 3, 0.3))
      }
      time(s"curate run$i") {
        noop(graft.ext.Curation.curate(docs, qualityThreshold = 0.5))
      }
      time(s"x35-full run$i") {
        noop(graft.queries.ExtQueries.x35Curation(spark, dir))
      }
    }
    spark.stop()
  }
}
