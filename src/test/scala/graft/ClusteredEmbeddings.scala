package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic clustered embedding fixture (VERDICT r8 "Next round" #2):
  * a mixture of `k` Gaussians on the unit sphere — the corpus structure
  * IVF space partitioning actually exploits. The driver's synthetic
  * embeddings are near-uniform (recall ≈ probed fraction by construction,
  * as x43's scaladoc documents), so recall numbers measured only there say
  * nothing about real-corpus behavior; this fixture is the other shape.
  *
  * Centers are i.i.d. N(0,1)^d normalized; members add N(0, sigma²) noise
  * and re-normalize. sigma = 0.15 keeps intra-cluster cosine ≈ 0.95+ while
  * inter-center cosine stays near 0 at d = 64 — clearly clustered, not
  * degenerate-duplicated.
  */
object ClusteredEmbeddings {

  def fixture(
      spark: SparkSession,
      n: Int = 2000,
      d: Int = 64,
      k: Int = 32,
      sigma: Double = 0.15,
      seed: Long = 7L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    def normalize(v: Array[Float]): Array[Float] = {
      var s = 0.0
      v.foreach(x => s += x.toDouble * x)
      val inv = (1.0 / math.sqrt(s)).toFloat
      v.map(_ * inv)
    }
    val centers = Array.fill(k)(normalize(Array.fill(d)(rnd.nextGaussian().toFloat)))
    val rows = (0 until n).map { i =>
      val c = centers(i % k)
      val v = normalize(Array.tabulate(d)(j =>
        c(j) + (sigma * rnd.nextGaussian()).toFloat))
      (i.toLong, v.toSeq, i % k)
    }
    rows.toDF("vec_id", "embedding", "label")
  }
}
