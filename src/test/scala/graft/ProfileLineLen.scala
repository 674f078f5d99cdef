package graft

/** Measurement twin of BenchLineSpec's fixed-part headroom test: prints
  * the production-shaped fixed-part (render(Nil)) length, the line
  * itself, and the live-line length, so the headroom bound is re-derived
  * from a number instead of guessed (VERDICT r19 #3 — measured 743/1795
  * on the r20 tree). `sbt "Test/runMain graft.ProfileLineLen"`. */
object ProfileLineLen {
  def main(args: Array[String]): Unit = {
    val names = SparkEntry.queries.keys.toSeq
    val median = names.sorted.zipWithIndex
      .map { case (n, i) => n -> (1.0 + (i % 9) + i * 0.017) }.toMap
    val minima = median.map { case (k, v) => k -> v * 0.9 }
    val recall = Seq("x41_ann_lsh", "x43_ann_ivf", "x47_ann_ivfpq",
      "x43_ivf_clustered", "x47_ivfpq_clustered", "x32_minhash_pairs",
      "x33_simhash_pairs", "x51_audio_witness", "x53_planted_twin")
      .map(_ -> 0.987).toMap
    def render(budget: Int) = Bench.renderLine(
      median, n = 3, sfDir = "/root/testdata/sf0.1",
      canaries = Seq((0.123, 3.456), (0.098, 0.622), (0.111, 2.104)),
      maxRdds = 2, minTotal = minima.values.sum, budget = budget,
      minima = minima, recall = recall, failed = Nil,
      canariesIo = Seq((0.056, 2.843), (0.061, 0.744), (0.059, 1.332)),
      foreignCpu = Seq(1701.3, 493.9, 137.9),
      stealCpu = Seq(1690.2, 461.0, 120.4),
      selfrun = Some((19, 5, 133.548)))
    val fixed = render(0)
    println(s"FIXED=${fixed.length}")
    println(fixed)
    val live = render(1800)
    println(s"LIVE=${live.length}")
  }
}
