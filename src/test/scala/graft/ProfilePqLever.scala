package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The m/k lever behind x47's quantization ceiling, exercised once with
  * numbers (VERDICT r19 #2): the r19 sweep pinned the m=16,k=16 IVF-PQ
  * path at ~0.778 recall@5 even probing every cell on the uniform sf0.1
  * corpus, and the x47 scaladoc NAMES wider m / larger k as the caller's
  * lever — but the lever had never been measured. This bounded run
  * builds IVF-PQ indexes at (m,k) ∈ {(16,16), (32,16), (16,64), (32,64)}
  * on the SAME corpus and reports, per variant: recall@5 at the default
  * nprobe=8 and at the exhaustive endpoint nprobe=16 (the quantization
  * cap — probe width is out of the equation there), plus warm query
  * seconds (2nd run of each query, ADC cost delta) and code bytes/vec.
  * `sbt "Test/runMain graft.ProfilePqLever"`.
  */
object ProfilePqLever {
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
    def recallOf(df: DataFrame): Double =
      df.select(col("vec_id"), col("neighbor_id"))
        .join(exact, Seq("vec_id", "neighbor_id")).count().toDouble / (nVec * 5)
    for ((m, k) <- Seq((16, 16), (32, 16), (16, 64), (32, 64))) {
      val root = java.nio.file.Files
        .createTempDirectory(s"prof-pq-m$m-k$k").toString + "/s"
      val tb = System.nanoTime()
      graft.ext.AnnIndex.buildIvfPqIndex(
        embs, root, nCells = 16, iters = 2, m = m, k = k)
      val buildSec = (System.nanoTime() - tb) / 1e9
      for (np <- Seq(8, 16)) {
        // warm timing: 2nd identical run, so the number is ADC+rerank
        // cost, not index-open noise
        def once(): (Double, Double) = {
          val t0 = System.nanoTime()
          val r = recallOf(graft.ext.AnnIndex.ivfPqTopKIndexed(
            spark, embs, root, k = 5, nprobe = np, rerank = 50))
          (r, (System.nanoTime() - t0) / 1e9)
        }
        once()
        val (r, sec) = once()
        println(f"[pq-lever] m=$m k=$k nprobe=$np recall@5=$r%.3f " +
          f"warm=$sec%.2f s build=$buildSec%.1f s bytes/vec=$m")
      }
    }
    exact.unpersist()
    spark.stop()
  }
}
