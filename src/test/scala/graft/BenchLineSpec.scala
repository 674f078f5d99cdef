package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line is the harness's only window into performance —
  * and it parses the line from a ~2000-char output tail. Pin that the
  * renderer always stays within budget and always emits valid JSON,
  * no matter how large the catalog grows.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(line: String) = mapper.readTree(line)

  test("all queries fit when small; line is valid JSON with exact totals") {
    val median = (1 to 10).map(i => f"q$i%02d_test" -> i * 0.1).toMap
    val line = Bench.renderLine(median, n = 3, sfDir = "/tmp/sf")
    assert(line.length <= 1800)
    val j = parse(line)
    assert(j.get("metric").asText === "total")
    assert(j.get("unit").asText === "sec")
    assert(j.get("n").asInt === 3)
    assert(j.get("n_queries").asInt === 10)
    assert(j.get("queries").size === 10)
    assert(j.get("omitted") == null)
    assert(math.abs(j.get("value").asDouble - median.values.sum) < 0.01)
  }

  test("oversized catalogs fold the fastest queries but keep the slowest") {
    val median = (1 to 300)
      .map(i => f"x$i%03d_some_longer_query_name" -> (300 - i) * 0.01).toMap
    val line = Bench.renderLine(median, n = 3, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1800, s"line is ${line.length} chars")
    val j = parse(line)
    assert(j.get("n_queries").asInt === 300)
    val kept = j.get("queries").size
    assert(kept > 0 && kept < 300)
    assert(j.get("omitted").get("n_queries").asInt === 300 - kept)
    // the kept set is the slowest ones
    val keptNames = j.get("queries").fieldNames()
    val slowest = median.toSeq.sortBy(-_._2).take(kept).map(_._1).toSet
    import scala.jdk.CollectionConverters._
    assert(keptNames.asScala.toSet === slowest)
    // omitted seconds + kept seconds ≈ total
    val keptSec = slowest.toSeq.map(median).sum
    assert(math.abs(j.get("omitted").get("sec").asDouble
      + keptSec - median.values.sum) < 0.05)
  }

  test("canary, max_rdds, and total_min fields render as valid JSON") {
    val median = Map("q01" -> 1.5, "q02" -> 0.5)
    val line = Bench.renderLine(median, n = 3, sfDir = "/tmp",
      canaries = Seq((0.1, 0.2), (0.15, 0.25)), maxRdds = 2, minTotal = 1.8)
    val j = parse(line)
    assert(j.get("canary_sec").size === 2)
    assert(j.get("canary_sec").get(0).get(0).asDouble === 0.1)
    assert(j.get("max_rdds").asInt === 2)
    assert(math.abs(j.get("total_min").asDouble - 1.8) < 0.001)
    assert(math.abs(j.get("value").asDouble - 2.0) < 0.001)
  }

  test("recall, failed, and queries_min fields render as valid JSON") {
    val median = Map("x41_ann_lsh" -> 4.0, "x43_ann_ivf" -> 3.5, "q01" -> 0.2)
    val minima = Map("x41_ann_lsh" -> 3.2, "x43_ann_ivf" -> 3.1, "q01" -> 0.18)
    val line = Bench.renderLine(median, n = 3, sfDir = "/tmp",
      minima = minima,
      recall = Map("x41_ann_lsh" -> 0.973, "x43_ann_ivf" -> 0.88),
      failed = Seq("x99_boom"))
    val j = parse(line)
    assert(math.abs(j.get("recall").get("x41_ann_lsh").asDouble - 0.973) < 1e-9)
    assert(math.abs(j.get("recall").get("x43_ann_ivf").asDouble - 0.88) < 1e-9)
    assert(j.get("failed").size === 1)
    assert(j.get("failed").get(0).asText === "x99_boom")
    // queries_min covers the kept rows (all 3 here, under the 12 cap)
    assert(j.get("queries_min").size === 3)
    assert(math.abs(j.get("queries_min").get("x41_ann_lsh").asDouble - 3.2) < 1e-9)
  }

  test("canary_io and foreign_cpu_sec render beside canary_sec") {
    val median = Map("q01" -> 1.5, "q02" -> 0.5)
    val line = Bench.renderLine(median, n = 3, sfDir = "/tmp",
      canaries = Seq((0.1, 0.2)), canariesIo = Seq((0.05, 0.31)),
      foreignCpu = Seq(3.2, 812.6, 0.0))
    val j = parse(line)
    assert(j.get("canary_io").size === 1)
    assert(math.abs(j.get("canary_io").get(0).get(0).asDouble - 0.05) < 1e-9)
    assert(math.abs(j.get("canary_io").get(0).get(1).asDouble - 0.31) < 1e-9)
    assert(j.get("canary_sec").size === 1)
    assert(j.get("foreign_cpu_sec").size === 3)
    assert(math.abs(j.get("foreign_cpu_sec").get(1).asDouble - 812.6) < 1e-9)
    // a failed gauge reports -1 (no /proc on the platform, io probe hit
    // disk-full): the field is omitted, not junk
    val degraded = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      foreignCpu = Seq(3.2, -1.0), canariesIo = Seq((-1.0, 0.08))))
    assert(degraded.get("foreign_cpu_sec") == null)
    assert(degraded.get("canary_io") == null)
    // only the EXPLICIT -1.0 sentinel omits: a jiffy-granularity jitter
    // reading (the bench loop clamps these at 0, but the renderer must
    // not confuse one with a failure) keeps the field (ADVICE r15 #2)
    val jitter = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      foreignCpu = Seq(3.2, -0.02)))
    assert(jitter.get("foreign_cpu_sec").size === 2)
  }

  test("steal_sec renders beside foreign_cpu_sec and decomposes it") {
    val median = Map("q01" -> 1.5, "q02" -> 0.5)
    val j = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      foreignCpu = Seq(125.0, 23.0, 4.1), stealCpu = Seq(118.2, 3.0, 2.2)))
    assert(j.get("steal_sec").size === 3)
    assert(math.abs(j.get("steal_sec").get(0).asDouble - 118.2) < 1e-9)
    // same -1.0 omission rule as the other gauges (absent /proc field)
    val degraded = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      foreignCpu = Seq(3.2, 4.0), stealCpu = Seq(2.0, -1.0)))
    assert(degraded.get("steal_sec") == null)
    assert(degraded.get("foreign_cpu_sec").size === 2)
    // steal does NOT feed the contended verdict on its own — foreign
    // already includes it; the decomposition is diagnostic only
    assert(parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      foreignCpu = Seq(3.0), stealCpu = Seq(2.9)))
      .get("contended").get(0).asBoolean === false)
  }

  test("contended verdict derives per round from the calibrated triggers") {
    // triggers are pinned: a recalibration must be a deliberate edit
    // here AND in the Bench scaladoc, never a drive-by
    assert(Bench.cpuCanaryTrigger === 0.4)
    assert(Bench.ioCanaryTrigger === 0.6)
    assert(Bench.foreignCpuTrigger === 10.0)
    // replay of r16 sidecar shapes: rd1 all-quiet; rd2 CPU-flagged
    // (line 12's 0.622); rd3 io-flagged (line 13's 0.74); a 4th round
    // foreign-flagged (line 14's 43.2)
    val flags = Bench.contendedFlags(
      canaries = Seq((0.1, 0.36), (0.09, 0.622), (0.08, 0.39), (0.08, 0.33)),
      canariesIo = Seq((0.07, 0.51), (0.06, 0.16), (0.07, 0.74), (0.06, 0.2)),
      foreignCpu = Seq(8.5, 0.1, 1.0, 43.2))
    assert(flags === Seq(false, true, true, true))
    // boundary: the documented quiet-run extremes (CPU 0.4 exactly, io
    // cold blip 0.51, foreign 8.5 / 10.0 exactly) do NOT flag
    assert(Bench.contendedFlags(
      Seq((0.1, 0.4)), Seq((0.07, 0.51)), Seq(10.0)) === Seq(false))
    // a failed io probe (-1.0 min sentinel) contributes no verdict
    assert(Bench.contendedFlags(
      Seq((0.1, 0.2)), Seq((-1.0, 0.9)), Seq(1.0)) === Seq(false))
    // renderer: emitted beside the gauge arrays, one bool per round
    val median = Map("q01" -> 1.5, "q02" -> 0.5)
    val j = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      canaries = Seq((0.1, 0.2), (0.1, 0.55), (0.1, 0.3)),
      canariesIo = Seq((0.05, 0.31), (0.06, 0.2), (0.06, 0.1)),
      foreignCpu = Seq(3.2, 0.0, 14.8)))
    assert(j.get("contended").size === 3)
    assert(j.get("contended").get(0).asBoolean === false)
    assert(j.get("contended").get(1).asBoolean === true)  // CPU 0.55
    assert(j.get("contended").get(2).asBoolean === true)  // foreign 14.8
    // no gauges, no field
    val bare = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp"))
    assert(bare.get("contended") == null)
    // an omitted-from-the-line gauge array (any-round failure omits the
    // whole array) must not feed the verdict either — the flag stays
    // re-derivable from exactly what is ON the line
    val omitted = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      canaries = Seq((0.1, 0.2), (0.1, 0.2)),
      canariesIo = Seq((0.05, 0.31), (-1.0, 0.9)),
      foreignCpu = Seq(3.2, 0.0)))
    assert(omitted.get("canary_io") == null)
    assert(omitted.get("contended").get(1).asBoolean === false)
  }

  test("selfrun_floor renders the sidecar round/count/min (VERDICT r18 #2)") {
    val median = Map("q01" -> 1.5, "q02" -> 0.5)
    val j = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      minTotal = 175.8, selfrun = Some((18, 5, 133.548))))
    val sf = j.get("selfrun_floor")
    assert(sf != null, "selfrun_floor missing from line")
    assert(sf.get("r").asInt === 18)
    assert(sf.get("n").asInt === 5)
    // 1-decimal on purpose: the signal is gate-vs-round floor, not ms
    assert(math.abs(sf.get("min").asDouble - 133.5) < 1e-9)
    // round −1 (explicit sidecar path without a round number) omits "r"
    val anon = parse(Bench.renderLine(median, n = 3, sfDir = "/tmp",
      selfrun = Some((-1, 3, 99.9)))).get("selfrun_floor")
    assert(anon.get("r") == null)
    assert(anon.get("n").asInt === 3)
    // no sidecar, no field
    assert(parse(Bench.renderLine(median, n = 3, sfDir = "/tmp"))
      .get("selfrun_floor") == null)
  }

  test("selfrunFloor reads the NEWEST sidecar and min(total_min)") {
    val dir = java.nio.file.Files.createTempDirectory("selfrun-spec").toFile
    def write(name: String, lines: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
      try lines.foreach(w.println) finally w.close()
    }
    // no sidecar at all → None (field omitted, bench never crashes)
    assert(Bench.selfrunFloor(dir) === None)
    write("BENCH_r17_selfruns.jsonl", Seq(
      """{"metric":"total","value":200.0,"total_min":148.1}"""))
    write("BENCH_r18_selfruns.jsonl", Seq(
      """{"metric":"total","value":160.0,"total_min":136.012}""",
      """not json — a stray log line the parser must skip""",
      """{"metric":"total","value":155.0,"total_min":133.548}""",
      """{"metric":"total","value":170.0,"total_min":141.4}"""))
    // picks r18 (newest round), not r17; min over ITS parseable lines
    val Some((r, n, mn)) = Bench.selfrunFloor(dir)
    assert(r === 18)
    assert(n === 3)
    assert(math.abs(mn - 133.548) < 1e-9)
    // lines without total_min contribute nothing; all-without → None
    write("BENCH_r19_selfruns.jsonl", Seq("""{"metric":"total","value":1.0}"""))
    assert(Bench.selfrunFloor(dir) === None,
      "a newest sidecar with no total_min fields must yield None, " +
        "not fall back to an older round's floors")
    // a JSON-null or non-numeric total_min must be SKIPPED, not read as
    // 0.0 (Jackson's NullNode.asDouble is 0.0 — a hand-edited null would
    // otherwise fabricate a zero floor in the committed artifact)
    write("BENCH_r20_selfruns.jsonl", Seq(
      """{"metric":"total","total_min":null}""",
      """{"metric":"total","total_min":"n/a"}""",
      """{"metric":"total","total_min":140.5}"""))
    val Some((r20, n20, mn20)) = Bench.selfrunFloor(dir)
    assert((r20, n20) === ((20, 1)))
    assert(math.abs(mn20 - 140.5) < 1e-9)
  }

  test("baseline_subset sums exactly the round-1 catalog (VERDICT r14 #6)") {
    // the 34-name set must stay a subset of the live catalog — a rename
    // would silently shrink the subset and skew the vs-baseline claim
    assert(Bench.baselineQuerySet.size === 34)
    val live = SparkEntry.queries.keySet
    val missing = Bench.baselineQuerySet -- live
    assert(missing.isEmpty, s"baseline subset names absent from catalog: $missing")
    // renderer: subset totals are the subset's sums, not the catalog's
    val median = Bench.baselineQuerySet.toSeq.map(_ -> 1.0).toMap +
      ("x999_not_in_subset" -> 100.0)
    val minima = median.map { case (k, v) => k -> v * 0.9 }
    val line = Bench.renderLine(median, n = 3, sfDir = "/tmp", minima = minima)
    val j = parse(line)
    val bs = j.get("baseline_subset")
    assert(bs != null, "baseline_subset missing from line")
    assert(bs.get("n_queries").asInt === 34)
    assert(math.abs(bs.get("total").asDouble - 34.0) < 0.01)
    assert(math.abs(bs.get("total_min").asDouble - 34.0 * 0.9) < 0.01)
    assert(math.abs(j.get("value").asDouble - 134.0) < 0.01)
  }

  test("queries_min is capped at the 12 slowest kept rows and stays in budget") {
    val median = (1 to 300)
      .map(i => f"x$i%03d_some_longer_query_name" -> (300 - i) * 0.01).toMap
    val minima = median.map { case (k, v) => k -> v * 0.9 }
    val line = Bench.renderLine(median, n = 3, sfDir = "/root/testdata/sf0.1",
      minima = minima, recall = Map("x41_ann_lsh" -> 0.97),
      failed = Seq("x050_some_longer_query_name"))
    assert(line.length <= 1800, s"line is ${line.length} chars")
    val j = parse(line)
    assert(j.get("queries_min").size <= 12)
    // minima keys are a subset of the kept queries and are the slowest ones
    import scala.jdk.CollectionConverters._
    val keptNames = j.get("queries").fieldNames().asScala.toSet
    val minNames = j.get("queries_min").fieldNames().asScala.toSet
    assert(minNames.subsetOf(keptNames))
    val slowest12 = median.toSeq.sortBy(-_._2).take(12).map(_._1).toSet
    assert(minNames === slowest12)
  }

  test("a mass-failure run still renders a bounded, parseable line") {
    // a systemic regression (bad fixture dir) can fail the WHOLE catalog;
    // the uncapped name list alone used to exceed the budget no matter
    // how many query rows the shrink loop dropped
    val median = (1 to 150)
      .map(i => f"x$i%03d_some_longer_query_name" -> 0.001).toMap
    val line = Bench.renderLine(median, n = 3, sfDir = "/root/testdata/sf0.1",
      failed = median.keys.toSeq)
    assert(line.length <= 1800, s"line is ${line.length} chars")
    val j = parse(line)
    assert(j.get("failed_n").asInt === 150)
    assert(j.get("failed").size === 12)
    // the full count survives even though only 12 names are shown
    import scala.jdk.CollectionConverters._
    val shown = j.get("failed").elements().asScala.map(_.asText).toSeq
    assert(shown === shown.sorted)
  }

  test("recallNumbers yields bounded, non-vacuous recall for every witnessed entry") {
    // the artifact's load-bearing quality numbers: all witnessed entries
    // present, every value a true recall in [0, 1], and every entry
    // non-vacuously > 0 (a broken witness would read 0.0) — the planted
    // x51/x53 witnesses must read exactly 1.0 (closed-form checks)
    val spark = TestSession.spark
    val r = Bench.recallNumbers(spark, "/root/testdata/sf0.001")
    val expected = Set("x41_ann_lsh", "x43_ann_ivf", "x47_ann_ivfpq",
      "x43_ivf_clustered", "x47_ivfpq_clustered",
      "x32_minhash_pairs", "x33_simhash_pairs",
      "x51_audio_witness", "x53_planted_twin")
    assert(r("x51_audio_witness") === 1.0, "audio closed-form witness must pass")
    assert(r("x53_planted_twin") === 1.0, "re-encoded twin must be recalled")
    assert(r.keySet === expected, s"recall keys: ${r.keySet}")
    // the structured-corpus twins exist to contrast the near-uniform
    // driver corpus: the same entries must read HIGH when structure
    // exists (r12 #4 — 0.69 on the driver corpus is a corpus property)
    assert(r("x43_ivf_clustered") > 0.9, s"clustered ivf ${r("x43_ivf_clustered")}")
    assert(r("x47_ivfpq_clustered") > 0.9, s"clustered ivfpq ${r("x47_ivfpq_clustered")}")
    r.foreach { case (k, v) =>
      assert(v >= 0.0 && v <= 1.0, s"$k recall $v out of [0,1]")
      assert(v > 0.0, s"$k recall is vacuously zero — witness broken")
    }
  }

  test("clustered cache key folds the generator params (ADVICE r13 #1)") {
    // the tmpdir corpus cache is keyed by this tag: changing any clustered
    // generator param (seed/dims/k/sigma) MUST change it, or a stale
    // corpus from the prior generation is silently reused. Pinning the
    // literal makes a param change a deliberate spec edit.
    assert(graft.tools.ScaleGen.clusteredParamsTag === "s7d64k32g15")
  }

  test("production-shaped fixed part leaves shrink headroom (ADVICE r17 #4)") {
    // steal_sec/contended/recall/baseline_subset are FIXED (non-shrinkable)
    // segments: the shrink loop can only drop query rows, so once
    // render(Nil) exceeds the budget the harness parse breaks with no
    // in-repo warning. Pin a representative line — the LIVE catalog (117
    // names), the production round count n=3, every gauge array populated
    // at the worst widths on record (foreign 1701.3 core-sec, r17 sidecar
    // line 1), the full production recall key set — and assert both that
    // the real line keeps a useful number of query rows and that the
    // zero-rows fallback stays comfortably under budget. The margin is
    // the early warning: the NEXT fixed-part addition (another gauge,
    // n>3 — ~33 chars per 3-round array, ~55 chars per extra round) must
    // widen this test deliberately instead of discovering the ceiling in
    // a harness parse failure. Measured r20: the production-shaped fixed
    // part is 743 chars, so the 1000 bound (tightened from 1700 per
    // VERDICT r19 #3) still leaves ~5 gauge additions of slack while
    // firing long before the 1800 harness budget is at risk. NB the
    // LIVE line hugging ~1780/1800 is BY DESIGN — the shrink loop keeps
    // the max number of query rows that fit — and is not the headroom
    // signal; only this render(Nil) floor is.
    // fixture shared with the measurement twin ProfileLineLen (review
    // r20): the bound below is justified by the twin's printed number,
    // so both must render the same shape by construction
    import BenchLineFixture.{names, render}
    val line = render(1800)
    assert(line.length <= 1800, s"line is ${line.length} chars")
    val j = parse(line)
    assert(j.get("n_queries").asInt === names.size)
    assert(j.get("contended").size === 3)
    assert(j.get("steal_sec").size === 3)
    assert(j.get("queries").size >= 10,
      s"fixed parts crowd the query rows down to ${j.get("queries").size}")
    // the non-shrinkable floor: an impossible budget falls back to
    // render(Nil) — THIS is what must never cross 1800
    val fixed = render(0)
    assert(parse(fixed).get("queries").size === 0)
    assert(fixed.length <= 1000,
      s"fixed part is ${fixed.length} chars — within ${1800 - fixed.length} " +
        "of the harness budget; shrink a fixed segment before adding one")
  }

  test("degenerate budget still yields parseable JSON") {
    val median = (1 to 50).map(i => f"q$i%02d" -> 1.0).toMap
    val line = Bench.renderLine(median, n = 1, sfDir = "/tmp", budget = 10)
    val j = parse(line) // all queries folded; line exceeds the impossible
    assert(j.get("queries").size === 0) // budget but never corrupts
    assert(j.get("omitted").get("n_queries").asInt === 50)
  }
}
