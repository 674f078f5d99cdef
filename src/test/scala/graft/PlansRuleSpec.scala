package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** BandedRangeJoinRule: the SURVEY §7 tier-(c) custom-Catalyst showcase —
  * a logical rewrite must (1) change the physical plan from a cartesian
  * product to an equi-join and (2) preserve results exactly.
  */
class PlansRuleSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val a = part.select($"p_partkey".as("key_a"), $"p_retailprice".as("price_a"))
    val b = part.select($"p_partkey".as("key_b"), $"p_retailprice".as("price_b"))
    (a, b)
  }

  test("abs-band join rewrites to a bucketed equi-join (no cartesian product)") {
    GraftExtensions.install(spark)
    val (a, b) = fixture
    val joined = a.join(b, abs($"price_a" - $"price_b") <= 0.2 && $"key_a" < $"key_b")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      s"rule did not fire; plan:\n$physical")
    assert(physical.contains("SortMergeJoin") || physical.contains("ShuffledHashJoin")
      || physical.contains("BroadcastHashJoin"),
      s"expected an equi-join; plan:\n$physical")
  }

  test("rewritten band join returns exactly the naive cartesian results") {
    GraftExtensions.install(spark)
    val (a, b) = fixture
    val withRule = a.join(b, abs($"price_a" - $"price_b") <= 0.2 && $"key_a" < $"key_b")
      .select($"key_a", $"key_b").as[(Long, Long)].collect().toSet
    // a clean session without the experimental rule computes the oracle
    val clean = spark.newSession()
    assert(clean.experimental.extraOptimizations.isEmpty,
      "newSession unexpectedly inherited experimental rules; oracle invalid")
    val partC = clean.read.parquet("/root/testdata/sf0.001/part.parquet")
    val aC = partC.select(col("p_partkey").as("key_a"), col("p_retailprice").as("price_a"))
    val bC = partC.select(col("p_partkey").as("key_b"), col("p_retailprice").as("price_b"))
    val naive = aC.join(bC, abs(col("price_a") - col("price_b")) <= 0.2
        && col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withRule === naive)
    assert(withRule.nonEmpty)
  }

  test("rule uses exact integer bucketing for integral operands (no double drift)") {
    GraftExtensions.install(spark)
    // 2^62+257 vs 2^62+256: |diff| = 1 but rounded doubles sit 512 buckets
    // apart at width 1 — the double path's ±2 probe would drop the pair.
    val base = 1L << 62
    val a = Seq((1L, base + 257L), (2L, -5L)).toDF("key_a", "v_a")
    val b = Seq((4L, base + 256L), (5L, -6L), (6L, base)).toDF("key_b", "v_b")
    val joined = a.join(b, abs($"v_a" - $"v_b") <= 1L)
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), s"rule did not fire:\n$physical")
    val got = joined.select($"key_a", $"key_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 4L), (2L, 5L)))
  }

  test("SQL text queries also get the rewrite through the installed functions") {
    GraftExtensions.install(spark)
    val sig = spark.sql(
      "SELECT graft_simhash64('the quick brown fox') AS s").as[Long].head()
    val sig2 = Seq("the quick brown fox").toDF("t")
      .select(graft.functions.SimHash64.column($"t")).as[Long].head()
    assert(sig === sig2)
  }
}
