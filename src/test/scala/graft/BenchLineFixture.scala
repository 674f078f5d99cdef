package graft

/** The production-shaped `renderLine` inputs shared by BenchLineSpec's
  * fixed-part headroom test and its measurement twin [[ProfileLineLen]]
  * (review r20): the spec's 1000-char bound is justified by the twin's
  * measurement, so both MUST render the same line shape by construction
  * — a fixture edited in one place only would let the enforced bound
  * and the measured number drift apart silently. Shape: the LIVE
  * catalog (117 names), production n=3, every gauge array populated at
  * the worst widths on record (foreign 1701.3 core-sec, r17 sidecar
  * line 1), the full production recall key set, a live selfrun tuple.
  */
object BenchLineFixture {
  val names: Seq[String] = SparkEntry.queries.keys.toSeq
  val median: Map[String, Double] = names.sorted.zipWithIndex
    .map { case (n, i) => n -> (1.0 + (i % 9) + i * 0.017) }.toMap
  val minima: Map[String, Double] = median.map { case (k, v) => k -> v * 0.9 }
  val recall: Map[String, Double] =
    Seq("x41_ann_lsh", "x43_ann_ivf", "x47_ann_ivfpq",
      "x43_ivf_clustered", "x47_ivfpq_clustered", "x32_minhash_pairs",
      "x33_simhash_pairs", "x51_audio_witness", "x53_planted_twin")
      .map(_ -> 0.987).toMap

  def render(budget: Int): String = Bench.renderLine(
    median, n = 3, sfDir = "/root/testdata/sf0.1",
    canaries = Seq((0.123, 3.456), (0.098, 0.622), (0.111, 2.104)),
    maxRdds = 2, minTotal = minima.values.sum, budget = budget,
    minima = minima, recall = recall, failed = Nil,
    canariesIo = Seq((0.056, 2.843), (0.061, 0.744), (0.059, 1.332)),
    foreignCpu = Seq(1701.3, 493.9, 137.9),
    stealCpu = Seq(1690.2, 461.0, 120.4),
    selfrun = Some((19, 5, 133.548)))
}
