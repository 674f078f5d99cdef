package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the x41 persisted-ANN path: build vs query vs
  * exact-twin recall join at sf0.1 (test source set — not shipped in the
  * production artifact).
  */
object ProfileX41 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    println("[prof] n_vectors: " + embs.count())
    val root = java.nio.file.Files
      .createTempDirectory("graft-prof-ann").toString + "/lsh"
    t("buildLshIndex")(graft.ext.AnnIndex.buildLshIndex(embs, root))
    val q1 = t("lshTopKIndexed cold")(
      graft.ext.AnnIndex.lshTopKIndexed(spark, embs, root, k = 5))
    t("noop write q1")(q1.write.format("noop").mode("overwrite").save())
    val q2 = t("lshTopKIndexed warm")(
      graft.ext.AnnIndex.lshTopKIndexed(spark, embs, root, k = 5))
    t("bruteForceTopK k=5")(
      graft.ext.Similarity.bruteForceTopK(embs, 5).toDF()
        .write.format("noop").mode("overwrite").save())
    t("ivf build")(graft.ext.AnnIndex.buildIvfIndex(embs,
      root.stripSuffix("lsh") + "ivf"))
    t("ivf query cold")(graft.ext.AnnIndex.ivfTopKIndexed(spark, embs,
      root.stripSuffix("lsh") + "ivf", k = 5)
      .write.format("noop").mode("overwrite").save())
    t("ivf query warm")(graft.ext.AnnIndex.ivfTopKIndexed(spark, embs,
      root.stripSuffix("lsh") + "ivf", k = 5)
      .write.format("noop").mode("overwrite").save())
    t("x41 entry as benched (warm)")(
      graft.queries.ExtQueries.x41AnnLsh(spark, dir)
        .write.format("noop").mode("overwrite").save())
    t("x43 entry as benched (warm)")(
      graft.queries.ExtQueries.x43AnnIvf(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
