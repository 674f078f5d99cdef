package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r22 probe: decompose the ANN floors — how much of x43/x41 is the
  * exact-twin witness (bruteForceTopK) vs the indexed probe+score path
  * vs the final sort. Usage: Test/runMain graft.ProfileR22Ann
  */
object ProfileR22Ann {
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
    val embs = graft.core.Tables.embeddings(spark, dir)
    // ensure indexes exist (first x43/x41 call builds)
    noop(SparkEntry.queries("x43_ann_ivf")(spark, dir))
    noop(SparkEntry.queries("x41_ann_lsh")(spark, dir))
    (1 to 3).foreach { i =>
      time(s"witness-bruteforce run$i") {
        noop(graft.ext.Similarity.bruteForceTopK(embs, 5).toDF())
      }
      time(s"x43-full run$i") { noop(SparkEntry.queries("x43_ann_ivf")(spark, dir)) }
      time(s"x41-full run$i") { noop(SparkEntry.queries("x41_ann_lsh")(spark, dir)) }
    }
    spark.stop()
  }
}
