package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21: equivalence + timing check for the withExactHits single-eval
  * rewrite — re-implements the OLD groupBy+rejoin spelling inline and
  * asserts the catalog entries (new spelling) return identical rows.
  */
object ProfileR21Ann {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("x41_ann_lsh", "x43_ann_ivf", "x47_ann_ivfpq").foreach { name =>
      val fn = SparkEntry.queries(name)
      // new spelling (catalog)
      val now = fn(spark, dir).collect().map(_.toString)
      // old spelling: strip n_exact_hits, recompute via groupBy+rejoin
      val approx = fn(spark, dir).drop("n_exact_hits")
      val embs = graft.core.Tables.embeddings(spark, dir)
      val exactPairs = graft.ext.Similarity.bruteForceTopK(embs, 5).toDF()
        .select(col("vec_id"), col("neighbor_id"))
      val hits = approx.select(col("vec_id"), col("neighbor_id"))
        .join(exactPairs, Seq("vec_id", "neighbor_id"))
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_exact_hits"))
      val old = approx.join(hits, Seq("vec_id"), "left")
        .na.fill(0L, Seq("n_exact_hits"))
        .orderBy(col("vec_id"), col("rank"))
        .collect().map(_.toString)
      val same = now.toSeq == old.toSeq
      println(s"[prof] $name rows_equal=$same n=${now.length}")
      if (!same) {
        now.toSeq.diff(old.toSeq).take(3).foreach(r => println(s"[prof]   new-only $r"))
        old.toSeq.diff(now.toSeq).take(3).foreach(r => println(s"[prof]   old-only $r"))
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[prof] $name new run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
