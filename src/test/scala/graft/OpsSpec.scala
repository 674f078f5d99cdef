package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Casts
import graft.ops.{Aggregates, Docs, Relational, Windows}

/** Operator-layer specs pinned to the reference's own mock fixtures
  * (FIXTURES.md §2).
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  /** The conditional-sum fixture (`pyspark_sum_function:9-21`): the `tax`
    * row must be excluded from total (comment at `:12`).
    */
  private def premiumFixture = Seq(
    ("P001", "basic", 1000L),
    ("P001", "rider", 500L),
    ("P001", "tax", 200L),
    ("P002", "basic", 2000L),
    ("P003", "rider", 300L)).toDF("policy_id", "premium_level", "amount")

  test("A3 conditional sum reproduces the reference fixture expectations") {
    val out = premiumFixture
      .groupBy($"policy_id")
      .agg(
        Aggregates.conditionalSum($"premium_level" === "basic", $"amount").as("basic"),
        Aggregates.conditionalSum($"premium_level" === "rider", $"amount").as("rider"),
        Aggregates.conditionalSum($"premium_level".isin("basic", "rider"), $"amount").as("total"))
      .orderBy($"policy_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      ("P001", 1000L, 500L, 1500L),
      ("P002", 2000L, 0L, 2000L),
      ("P003", 0L, 300L, 300L)))
  }

  test("A3 conditional sum ≡ A4 pivot sum (the reference's two spellings)") {
    val viaCond = premiumFixture
      .groupBy($"policy_id")
      .agg(
        Aggregates.conditionalSum($"premium_level" === "basic", $"amount").as("basic"),
        Aggregates.conditionalSum($"premium_level" === "rider", $"amount").as("rider"))
    val viaPivot = Aggregates
      .pivotSum(premiumFixture, Seq($"policy_id"), "premium_level",
        Seq("basic", "rider"), "amount")
      .withColumnRenamed("basic", "basic_p")
      .withColumnRenamed("rider", "rider_p")
    val joined = viaCond.join(viaPivot, "policy_id")
    assert(joined.where($"basic" =!= $"basic_p" || $"rider" =!= $"rider_p").count() === 0)
  }

  test("A4 pivot with inferred values ≡ explicit values when the list covers the data") {
    val explicit = Aggregates
      .pivotSum(premiumFixture, Seq($"policy_id"), "premium_level",
        Seq("basic", "rider", "tax"), "amount")
    val inferred = Aggregates
      .pivotSum(premiumFixture, Seq($"policy_id"), "premium_level", "amount")
    assert(inferred.columns.sorted === explicit.columns.sorted)
    val cols = explicit.columns.sorted.map(col)
    assert(inferred.select(cols: _*).orderBy($"policy_id").collect().toSeq ===
      explicit.select(cols: _*).orderBy($"policy_id").collect().toSeq)
  }

  test("J1 left_semi ≡ inner join + left-project + distinct when key unique") {
    val fact = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "v")
    val dim = Seq((1, "x"), (2, "y")).toDF("pk", "w")
    val semi = Relational.semiJoin(fact, dim, fact("k") === dim("pk"))
    val handRolled = fact.join(dim, fact("k") === dim("pk"), "inner")
      .select(fact("k"), fact("v")).distinct()
    assert(semi.collect().toSet === handRolled.collect().toSet)
    assert(semi.count() === 3)
  }

  test("P8 anti-join keeps only unmatched rows") {
    val fact = Seq((1, "a"), (2, "c"), (3, "d")).toDF("k", "v")
    val dim = Seq((1, "x")).toDF("pk", "w")
    val anti = Relational.antiJoin(fact, dim, fact("k") === dim("pk"))
    assert(anti.select("k").as[Int].collect().toSet === Set(2, 3))
  }

  test("P6 date window is half-open [start, end)") {
    val df = Seq("2026-01-01", "2026-01-15", "2026-02-01").toDF("d")
    val got = df.filter(Relational.dateWindow($"d", "2026-01-01", "2026-02-01"))
      .as[String].collect().toSet
    assert(got === Set("2026-01-01", "2026-01-15"))
  }

  test("W1-W3 sequencing is deterministic and business keys format correctly") {
    val df = Seq((10L, 2, "b"), (10L, 1, "a"), (20L, 1, "c")).toDF("grp", "ord", "v")
    val out = df
      .withColumn("seq", Windows.sequenceWithin(Seq($"grp"), Seq($"ord", $"v")))
      .withColumn("bk", Windows.businessKey("PMT_KAL_", $"grp", $"seq"))
      .withColumn("sub", Windows.subEntityId($"grp", $"seq"))
      .orderBy($"grp", $"seq")
      .select($"bk", $"sub").as[(String, String)].collect()
    assert(out === Seq(
      ("PMT_KAL_10_1", "10_1"), ("PMT_KAL_10_2", "10_2"), ("PMT_KAL_20_1", "20_1")))
  }

  test("A1 collectSortedStructs sorts by leading struct field") {
    val df = Seq((1, 3, "c"), (1, 1, "a"), (1, 2, "b")).toDF("g", "seq", "v")
    val arr = df.groupBy($"g")
      .agg(Aggregates.collectSortedStructs($"seq".as("seq"), $"v".as("v")).as("xs"))
      .select($"xs").as[Seq[(Int, String)]].collect().head
    assert(arr === Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("F8 decode table falls back to default (channel decode default '99')") {
    val df = Seq("1-URGENT", "UNKNOWN").toDF("p")
    val got = df.select(Docs.decode($"p", Seq("1-URGENT" -> "01"), "99"))
      .as[String].collect()
    assert(got === Seq("01", "99"))
  }

  test("ISO-offset timestamp is string concat, not tz math (reference :193)") {
    val df = Seq("2026-01-23", null).toDF("d")
    val got = df.select(Docs.isoOffsetMidnight($"d")).as[String].collect()
    assert(got === Seq("2026-01-23T00:00:00+07:00", null))
  }

  test("salted equi-join is row-identical to the plain join under skew") {
    // 90% of left rows share one hot key — the salting target case.
    val left = spark.range(1000).toDF("id")
      .withColumn("k", when($"id" % 10 === 0, $"id" % 3).otherwise(lit(7L)))
      .withColumn("v", $"id" * 2)
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c"), (7L, "hot")).toDF("rk", "w")
    val plain = left.join(right, $"k" === $"rk", "inner")
      .select($"id", $"k", $"v", $"rk", $"w")
    val salted = graft.ops.Relational.saltedEquiJoin(left, right, "k", "rk", 8)
      .select($"id", $"k", $"v", $"rk", $"w")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("custom WordShingles expression matches the HOF spelling exactly") {
    import graft.functions.GraftFunctions
    val df = Seq("The Quick  brown fox the quick brown", "a b", "x").toDF("text")
    val custom = df.select(
      GraftFunctions.wordShingles($"text", 2).as("sh")).as[Seq[String]].collect()
    val toks = split(trim(org.apache.spark.sql.functions.lower($"text")), "\\s+")
    val hof = df.select(
      when(size(toks) >= 2,
        array_distinct(transform(sequence(lit(1), size(toks) - lit(1)),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + lit(1))))))
        .otherwise(array().cast("array<string>")).as("sh"))
      .as[Seq[String]].collect()
    assert(custom.map(_.toSet) === hof.map(_.toSet))
    assert(custom.head.toSet === Set("the quick", "quick brown", "brown fox",
      "fox the"))
    // SQL registration path
    GraftFunctions.register(spark)
    val viaSql = df.selectExpr("graft_word_shingles(text, 2) AS sh")
      .as[Seq[String]].collect()
    assert(viaSql.map(_.toSet) === custom.map(_.toSet))
    // the other registered graft functions resolve and agree with the
    // Column-API spellings
    val sqlSig = df.selectExpr("graft_minhash_signature(text, 2, 8) AS mh",
      "graft_simhash64(text) AS sh64")
    val apiSig = df.select(
      graft.functions.MinHashSignature.column(col("text"), 2, 8).as("mh"),
      graft.functions.SimHash64.column(col("text")).as("sh64"))
    assert(sqlSig.collect().toSeq === apiSig.collect().toSeq)
  }

  test("TopKAggregator ≡ ranking-window top-k (ties included)") {
    import graft.functions.{ScoredItem, TopKAggregator}
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, 5.0, 10L, 1L), (1L, 5.0, 9L, 2L), (1L, 3.0, 8L, 3L), (1L, 1.0, 7L, 4L),
      (2L, 2.0, 6L, 5L)).toDF("g", "score", "a", "b")
    val viaAgg = df.as[(Long, Double, Long, Long)]
      .map { case (g, s, a, b) => (g, ScoredItem(s, a, b)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(TopKAggregator(2).toColumn.name("topk"))
      .flatMap { case (g, xs) => xs.zipWithIndex.map { case (x, i) => (g, i + 1, x.score, x.tieA) } }
      .collect().toSet
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"a", $"b")
    val viaWindow = df.withColumn("rn", row_number().over(w)).where($"rn" <= 2)
      .select($"g", $"rn", $"score", $"a")
      .as[(Long, Int, Double, Long)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("asofJoin attaches the latest prior right row per key (inclusive)") {
    import graft.ops.Temporal
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L, 1.0), (1L, 15L, 101L, 2.0), (2L, 99L, 102L, 3.0))
      .toDF("k", "t", "rid", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "t", Seq("rid", "v"), "rid")
      .select($"tag", $"asof_rid").as[(String, Option[Long])].collect().toMap
    assert(out("a") === Some(100L)) // equal timestamp included (<=)
    assert(out("b") === Some(101L)) // latest prior
    assert(out("c") === None) // nothing before t=5
    assert(out("d") === None) // right row is in the future
  }

  test("asofJoinForward attaches the earliest following right row (inclusive)") {
    import graft.ops.Temporal
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 100L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L, 1.0), (1L, 15L, 101L, 2.0), (2L, 99L, 102L, 3.0))
      .toDF("k", "t", "rid", "v")
    val out = Temporal.asofJoinForward(left, right, "k", "t", "t", Seq("rid", "v"), "rid")
      .select($"tag", $"asof_rid").as[(String, Option[Long])].collect().toMap
    assert(out("a") === Some(100L)) // equal timestamp included (>=)
    assert(out("b") === None) // nothing at or after t=20
    assert(out("c") === Some(100L)) // earliest following
    assert(out("d") === None) // right row is in the past
  }

  test("asofJoinNearest picks the closer side, ties to the earlier right row") {
    import graft.ops.Temporal
    val left = Seq((1L, 10L, "near-back"), (1L, 13L, "near-fwd"),
      (1L, 11L, "tie"), (1L, 100L, "only-back"), (2L, 5L, "no-right"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 8L, 100L), (1L, 14L, 101L)).toDF("k", "t", "rid")
    val out = Temporal.asofJoinNearest(left, right, "k", "t", "t", Seq("rid"), "rid")
      .select($"tag", $"asof_rid").as[(String, Option[Long])].collect().toMap
    assert(out("near-back") === Some(100L)) // |10-8|=2 < |14-10|=4
    assert(out("near-fwd") === Some(101L)) // |14-13|=1 < |13-8|=5
    assert(out("tie") === Some(100L)) // 3 = 3 -> earlier
    assert(out("only-back") === Some(101L)) // nothing after 100
    assert(out("no-right") === None)
  }

  test("idempotentEvents keeps the earliest per window, counts suppressed, tie-breaks by id") {
    import graft.ops.Temporal
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      // user 1, click: two retries inside the 300s window of the first
      (10L, ts("2024-01-01 00:00:01"), 1L, "click"),
      (11L, ts("2024-01-01 00:02:00"), 1L, "click"),
      (12L, ts("2024-01-01 00:04:59"), 1L, "click"),
      // same user+type in the NEXT window: legitimately kept
      (13L, ts("2024-01-01 00:05:01"), 1L, "click"),
      // identical ts as id 10 but higher id: suppressed by the id tie-break
      (14L, ts("2024-01-01 00:00:01"), 1L, "click"),
      // different type: untouched
      (20L, ts("2024-01-01 00:00:30"), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Temporal.idempotentEvents(df, "event_id", "ts", 300,
      "user_id", "event_type")
      .orderBy($"event_id")
      .select($"event_id", $"n_suppressed").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((10L, 3L), (13L, 0L), (20L, 0L)))
    intercept[IllegalArgumentException] {
      Temporal.idempotentEvents(df, "event_id", "ts", 300)
    }
  }

  test("bandedRangeJoin ≡ naive range predicate, without duplicates") {
    import graft.ops.Temporal
    val a = Seq((1L, 10.0), (2L, 15.0), (3L, 30.0)).toDF("ka", "va")
    val b = Seq((4L, 11.0), (5L, 19.9), (6L, 25.01)).toDF("kb", "vb")
    val banded = Temporal.bandedRangeJoin(a, b, "va", "vb", 5.0)
      .select($"ka", $"kb").as[(Long, Long)].collect().sorted.toSeq
    val naive = a.crossJoin(b).where(abs($"va" - $"vb") <= 5.0)
      .select($"ka", $"kb").as[(Long, Long)].collect().sorted.toSeq
    assert(banded === naive)
    assert(banded === banded.distinct, "each pair must appear exactly once")
  }

  test("bandedRangeJoin is exact for nano-epoch longs where double bucketing drifts") {
    import graft.ops.Temporal
    // 2^62 + 256 and 2^62 + 257 differ by 1 but their rounded doubles land
    // 512 buckets apart at width 1 (ulp(2^62) = 512) — a double-bucketed
    // ±2 probe silently drops the pair; exact long bucketing keeps it.
    val base = 1L << 62
    val a = Seq((1L, base + 257L), (2L, -1000L), (3L, 500L)).toDF("ka", "va")
    val b = Seq((4L, base + 256L), (5L, -1001L), (6L, 1500L), (7L, base - 2000L))
      .toDF("kb", "vb")
    val got = Temporal.bandedRangeJoin(a, b, "va", "vb", 1000.0)
      .select($"ka", $"kb").as[(Long, Long)].collect().sorted.toSeq
    // expected pairs: (1,4) |diff|=1; (2,5) |diff|=1 across the negative
    // floor-div branch; (3,6) |diff|=1000 at the band edge
    assert(got === Seq((1L, 4L), (2L, 5L), (3L, 6L)))
  }

  test("required-null sentinels preserve REQ semantics (reference :71-78)") {
    val df = Seq(("x", null: java.lang.Double), (null, Double.box(1.5)))
      .toDF("s", "m")
    val got = df.select(
      Casts.reqString($"s"), Casts.reqMoney($"m").cast(StringType)).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("x", "0.00"), ("", "1.50")))
  }
}
