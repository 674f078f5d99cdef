package graft

import graft.ext.{Dedup, Fuzzy, Robust}

/** Round-6 cache-lifecycle contract: operators that borrow caches for
  * their own multi-consumed subtrees must unpersist them before
  * returning — a long-lived session (orchestrator, bench loop, user
  * notebook) calling them repeatedly must not accumulate CacheManager
  * entries (the round-5 +15% cross-round bench regression was exactly
  * this accumulation). The only persistent entry an operator may leave
  * is its own eagerly-materialized result (one localCheckpoint RDD,
  * released when the caller drops the frame).
  */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def docsFixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumps over the sleepy dog"),
    (4L, "completely different content about spark engines here"),
    (5L, "yet another unrelated document body with words")).toDF("doc_id", "text")

  private def custFixture = Seq(
    (1L, "Customer#000000001"), (2L, "Customer#000000002"),
    (3L, "Custmer#000000001"), (4L, "Customer#000000042"))
    .toDF("id", "name")

  test("fuzzyJoin leaves no borrowed caches behind (≤1 result checkpoint)") {
    val before = persistedIds
    val out = Fuzzy.fuzzyJoin(custFixture, "id", "name", custFixture, "id", "name",
      n = 3, threshold = 0.5, maxGramShare = 0.9)
    assert(out.count() > 0)
    val leaked = persistedIds -- before
    assert(leaked.size <= 1,
      s"fuzzyJoin left ${leaked.size} persistent RDDs (expected ≤1 result checkpoint)")
  }

  test("jaccardPairs leaves no borrowed caches behind") {
    val before = persistedIds
    val out = Dedup.jaccardPairs(docsFixture, "doc_id", "text", 2, 0.5, maxDocFreq = 100)
    assert(out.count() > 0)
    val leaked = persistedIds -- before
    assert(leaked.size <= 1,
      s"jaccardPairs left ${leaked.size} persistent RDDs (expected ≤1 result checkpoint)")
  }

  test("containmentPairs leaves no borrowed caches behind") {
    val before = persistedIds
    val out = Dedup.containmentPairs(docsFixture, "doc_id", "text", 2, 0.5)
    assert(out.count() > 0)
    val leaked = persistedIds -- before
    assert(leaked.size <= 1,
      s"containmentPairs left ${leaked.size} persistent RDDs (expected ≤1 result checkpoint)")
  }

  test("robustZ/madOutliers leave only their input checkpoint behind") {
    val scores = Seq(
      (1L, "a", 10.0), (2L, "a", 11.0), (3L, "a", 12.0), (4L, "a", 50.0),
      (5L, "b", 1.0), (6L, "b", 2.0), (7L, "b", 3.0))
      .toDF("doc_id", "source", "score")
    val before = persistedIds
    assert(Robust.robustZ(scores, "doc_id", "source", "score").count() == 7)
    assert(Robust.madOutliers(scores, "doc_id", "source", "score").count() == 7)
    val leaked = persistedIds -- before
    assert(leaked.size <= 2,
      s"robustZ+madOutliers left ${leaked.size} persistent RDDs " +
        "(expected ≤1 input checkpoint each)")
  }

  test("robustZ scans its upstream exactly once (x112's 3x-recompute fix)") {
    // The upstream projection increments an accumulator per row; if the
    // operator still fed its three passes (med, mad, final join) from the
    // caller's plan instead of the materialized slice, the count would be
    // 3x the input size.
    val acc = spark.sparkContext.longAccumulator("upstream-rows")
    val base = Seq(
      (1L, "a", 10.0), (2L, "a", 11.0), (3L, "a", 12.0),
      (4L, "b", 1.0), (5L, "b", 2.0)).toDF("doc_id", "source", "score")
    val expensive = base.as[(Long, String, Double)]
      .map { r => acc.add(1L); r }
      .toDF("doc_id", "source", "score")
    val out = Robust.robustZ(expensive, "doc_id", "source", "score")
    assert(out.count() == 5)
    assert(acc.value == 5L,
      s"upstream executed ${acc.value} row-visits for 5 rows — expected exactly one scan")
  }

  test("repeated fuzzyJoin calls do not accumulate persistent RDDs") {
    // Warm one call so any one-off session state (broadcast cleanup lag)
    // is excluded, then measure growth over 3 further calls with results
    // dropped: growth must stay bounded by the per-call checkpoint count,
    // not the per-call borrow count (6 borrows/call before the fix).
    Fuzzy.fuzzyJoin(custFixture, "id", "name", custFixture, "id", "name",
      n = 3, threshold = 0.5, maxGramShare = 0.9).count()
    val before = persistedIds
    (1 to 3).foreach { _ =>
      Fuzzy.fuzzyJoin(custFixture, "id", "name", custFixture, "id", "name",
        n = 3, threshold = 0.5, maxGramShare = 0.9).count()
    }
    val leaked = persistedIds -- before
    assert(leaked.size <= 3,
      s"3 fuzzyJoin calls grew persistent RDDs by ${leaked.size} (caches are leaking)")
  }
}
