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

  test("degenerate budget still yields parseable JSON") {
    val median = (1 to 50).map(i => f"q$i%02d" -> 1.0).toMap
    val line = Bench.renderLine(median, n = 1, sfDir = "/tmp", budget = 10)
    val j = parse(line) // all queries folded; line exceeds the impossible
    assert(j.get("queries").size === 0) // budget but never corrupts
    assert(j.get("omitted").get("n_queries").asInt === 50)
  }
}
