package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF / IVF-PQ recall sweep on BOTH corpus shapes (VERDICT r8 #2): the
  * driver's near-uniform embeddings (recall ≈ probed fraction — the
  * degenerate case for space partitioning) and a 32-Gaussian clustered
  * fixture (the structure IVF exploits; see [[ClusteredEmbeddings]]).
  * SURVEY §«ANN recall» quotes both.
  */
object ProfileIvfRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    sweep(spark, "uniform(driver sf0.1)",
      graft.core.Tables.embeddings(spark, dir))
    sweep(spark, "clustered(32 gaussians)",
      ClusteredEmbeddings.fixture(spark, n = 2000, d = 64, k = 32))
    spark.stop()
  }

  private def sweep(spark: SparkSession, tag: String, embs: DataFrame): Unit = {
    val exact = graft.ext.Similarity.bruteForceTopK(embs, 5).toDF()
      .select(col("vec_id"), col("neighbor_id")).cache()
    val nVec = embs.count().toDouble
    exact.count()
    val root = java.nio.file.Files.createTempDirectory("prof-ivf").toString + "/s"
    graft.ext.AnnIndex.buildIvfIndex(embs, root, nCells = 16, iters = 2)
    val rootPq = java.nio.file.Files.createTempDirectory("prof-ivfpq").toString + "/s"
    graft.ext.AnnIndex.buildIvfPqIndex(embs, rootPq, nCells = 16, iters = 2, m = 16, k = 16)
    def recallOf(df: DataFrame): Double =
      df.select(col("vec_id"), col("neighbor_id"))
        .join(exact, Seq("vec_id", "neighbor_id")).count().toDouble / (nVec * 5)
    // through nprobe = 16 = nCells (VERDICT r18 #3): the exhaustive
    // endpoint anchors the curve — IVF probing every cell IS the exact
    // scan, so recall must read 1.0 there and the interesting question
    // is the cost ramp between the default and exhaustive
    Seq(2, 4, 6, 8, 12, 16).foreach { np =>
      val t0 = System.nanoTime()
      val r = recallOf(graft.ext.AnnIndex.ivfTopKIndexed(spark, embs, root, k = 5, nprobe = np))
      println(f"[prof] $tag ivf nprobe=$np recall@5=$r%.3f time=${(System.nanoTime()-t0)/1e9}%.2f s")
      val t1 = System.nanoTime()
      val rp = recallOf(graft.ext.AnnIndex.ivfPqTopKIndexed(spark, embs, rootPq, k = 5, nprobe = np, rerank = 50))
      println(f"[prof] $tag ivfpq nprobe=$np recall@5=$rp%.3f time=${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    // rerank sweep at nprobe=4 for the PQ path (ADC shortlist depth)
    Seq(100, 200).foreach { rr =>
      val t1 = System.nanoTime()
      val rp = recallOf(graft.ext.AnnIndex.ivfPqTopKIndexed(spark, embs, rootPq, k = 5, nprobe = 4, rerank = rr))
      println(f"[prof] $tag ivfpq nprobe=4 rerank=$rr recall@5=$rp%.3f time=${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    exact.unpersist()
  }
}
