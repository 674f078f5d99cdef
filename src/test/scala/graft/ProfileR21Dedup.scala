package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 probe: decompose the dedup-family floor (x31/x34/x35/x119 share the
  * tokenize→shingle→inverted-index→pair pipeline) into its sequential jobs
  * so the optimization targets the stage that actually costs, not the one
  * that looks expensive in the code. Times, on a quiet local[32] session at
  * SPARK_GRAFT_SF_DIR (default sf0.1):
  *   docs-scan     one pass over documents.parquet (noop)
  *   shingle-noop  tokenize+shingle+explode (noop) — the per-row CPU
  *   estimate      cache fill + Σ df·(df−1)/2 budget aggregate (head)
  *   pairs         the full jaccardPairs call (estimate + join + checkpoint)
  *   x31-full      the declared query (pairs + global sort)
  * Usage: Test/runMain graft.ProfileR21Dedup
  */
object ProfileR21Dedup {
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
    def estimate(sh: DataFrame): Double =
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(sum(col("df").cast("double") * (col("df") - 1).cast("double") / 2.0))
        .head().getAs[Any](0) match {
          case null => 0.0
          case d: java.lang.Double => d.doubleValue
        }
    (1 to 3).foreach { i =>
      time(s"docs-scan run$i") { noop(docs) }
      time(s"shingle-noop run$i") {
        noop(graft.ext.Dedup.shingles(docs, "doc_id", "text", 3))
      }
      time(s"estimate run$i") {
        val sh = graft.ext.Dedup.shingles(docs, "doc_id", "text", 3).cache()
        try println(f"[prof]   est=${estimate(sh)}%.0f")
        finally sh.unpersist(false)
      }
      time(s"pairs run$i") {
        noop(graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3))
      }
      time(s"x31-full run$i") {
        noop(graft.queries.ExtQueries.x31JaccardPairs(spark, dir))
      }
      // decompose the join job: candidates only, then +sizes, then +checkpoint
      time(s"inter-only run$i") {
        val sh = graft.ext.Dedup.shingles(docs, "doc_id", "text", 3).cache()
        try {
          val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
          val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
          noop(a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
            .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common")))
        } finally sh.unpersist(false)
      }
      time(s"inter+sizes run$i") {
        val sh = graft.ext.Dedup.shingles(docs, "doc_id", "text", 3).cache()
        try {
          val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
          val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
          val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
          val inter = a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
            .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
          val raw = inter
            .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
            .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
          noop(raw.withColumn("jaccard", col("n_common").cast("double")
              / (col("n_a") + col("n_b") - col("n_common")).cast("double"))
            .where(col("jaccard") >= lit(0.3)))
        } finally sh.unpersist(false)
      }
    }
    spark.stop()
  }
}
