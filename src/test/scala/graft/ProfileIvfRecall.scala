package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileIvfRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val embs = graft.core.Tables.embeddings(spark, dir)
    val exact = graft.ext.Similarity.bruteForceTopK(embs, 5).toDF()
      .select(col("vec_id"), col("neighbor_id")).cache()
    val nVec = embs.count().toDouble
    exact.count()
    val root = java.nio.file.Files.createTempDirectory("prof-ivf").toString + "/s"
    graft.ext.AnnIndex.buildIvfIndex(embs, root, nCells = 16, iters = 2)
    val rootPq = java.nio.file.Files.createTempDirectory("prof-ivfpq").toString + "/s"
    graft.ext.AnnIndex.buildIvfPqIndex(embs, rootPq, nCells = 16, iters = 2, m = 16, k = 16)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select(col("vec_id"), col("neighbor_id"))
        .join(exact, Seq("vec_id", "neighbor_id")).count().toDouble / (nVec * 5)
    Seq(2, 4, 6, 8).foreach { np =>
      val t0 = System.nanoTime()
      val r = recallOf(graft.ext.AnnIndex.ivfTopKIndexed(spark, embs, root, k = 5, nprobe = np))
      println(f"[prof] ivf nprobe=$np recall@5=$r%.3f time=${(System.nanoTime()-t0)/1e9}%.2f s")
      val t1 = System.nanoTime()
      val rp = recallOf(graft.ext.AnnIndex.ivfPqTopKIndexed(spark, embs, rootPq, k = 5, nprobe = np, rerank = 50))
      println(f"[prof] ivfpq nprobe=$np recall@5=$rp%.3f time=${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    // rerank sweep at nprobe=4 for the PQ path (ADC shortlist depth)
    Seq(100, 200).foreach { rr =>
      val t1 = System.nanoTime()
      val rp = recallOf(graft.ext.AnnIndex.ivfPqTopKIndexed(spark, embs, rootPq, k = 5, nprobe = 4, rerank = rr))
      println(f"[prof] ivfpq nprobe=4 rerank=$rr recall@5=$rp%.3f time=${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
