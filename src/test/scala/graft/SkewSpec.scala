package graft

import org.apache.spark.sql.functions._

/** Skew posture pins (round 10, VERDICT r9 #1).
  *
  * The zipf rehearsal's plan audits found the engine leaves AQE's
  * skew-join splitter NOTHING to split: dims cross joins as broadcast
  * build sides (skew-immune) and the flagship's shuffle joins key on
  * orderkey, which customer-key skew does not skew. The one operator
  * that bent (x68's per-user window) is not a join, so AQE cannot help
  * it — that fix is the manual two-phase bucketing in
  * [[graft.streaming.Streams.sessionsBatch]]. This spec pins the
  * complementary claim: when a genuinely skewed shuffle join DOES reach
  * AQE under the engine's session settings, the splitter engages.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a genuinely skewed shuffle join under engine sessions") {
    val ss = spark.newSession()
    graft.core.Sessions.tune(ss)
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // thresholds scaled to spec-sized shuffles, same RATIO the defaults
    // (256 MB, 5x median) hold to a production cluster's partitions
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      (256 * 1024).toString)
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      (256 * 1024).toString)
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    import ss.implicits._
    // one key carries ~83% of the left side; right side small but NOT
    // broadcastable (threshold -1), so the join must shuffle on k
    val left = ss.range(600000)
      .select(when($"id" < 500000, 0L).otherwise($"id").as("k"), $"id".as("v"))
    val right = ss.range(1000).select($"id".as("k"), ($"id" * 2).as("w"))
    val joined = left.join(right, "k")
    // execute THIS queryExecution (df.write would clone a new one and
    // leave this plan isFinalPlan=false — AQE decisions invisible)
    val n = joined.queryExecution.toRdd.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"plan never finalized:\n${plan.take(500)}")
    assert(plan.contains("skew=true") || plan.contains("skewed"),
      s"AQE did not split the hot partition; final plan:\n${plan.take(3000)}")
    // hot key 0 matches one right row → 500k output; the uniform tail
    // (ids ≥ 500000) has no match among right keys [0, 1000)
    assert(n === 500000L)
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("skewLag ≡ single-window lag on real events, any bucket size") {
    import graft.core.{EventTime, Tables}
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(EventTime.epochUs(col("ts")), col("event_id"))
    val expected = ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .select(col("event_id"), col("prev_type"))
      .as[(Long, Option[String])].collect().toMap
    for (bucketUs <- Seq(24L * 3600000000L, 3600000000L, 123456789L)) {
      val got = graft.ops.Windows.skewLag(ev, "prev_type", col("event_type"),
          "user_id", EventTime.epochUs(col("ts")), col("event_id"), bucketUs)
        .select(col("event_id"), col("prev_type"))
        .as[(Long, Option[String])].collect().toMap
      assert(got === expected, s"bucketUs=$bucketUs diverged")
    }
  }

  test("skewRangeApply ≡ single-window range frame, incl. exact-boundary ghosts") {
    import graft.core.{EventTime, Tables}
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(EventTime.epochUs(col("ts")))
      .rangeBetween(-hourUs, 0L)
    val expected = ev
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("event_id"), col("n"), col("s"))
      .as[(Long, Long, Double)].collect().toSet
    // bucket = exactly the window length (tightest legal: maximal ghost
    // traffic, every frame straddles) and the 24h default
    for (bucketUs <- Seq(hourUs, 24L * hourUs)) {
      val got = graft.ops.Windows.skewRangeApply(ev, "user_id",
          EventTime.epochUs(col("ts")), hourUs, bucketUs) { spec =>
        Seq("n" -> count(lit(1)).over(spec),
          "s" -> sum(col("value").cast("decimal(18,2)")).over(spec).cast("double"))
      }
        .select(col("event_id"), col("n"), col("s"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got === expected, s"bucketUs=$bucketUs diverged")
    }
    // and the guard: a frame longer than the bucket must refuse
    val err = intercept[IllegalArgumentException] {
      graft.ops.Windows.skewRangeApply(ev, "user_id",
        EventTime.epochUs(col("ts")), hourUs, bucketUs = hourUs / 2)(_ => Nil)
    }
    assert(err.getMessage.contains("must be >= windowUs"))
  }

  test("skewTrailingCountSum ≡ declarative range frame on real events") {
    import graft.core.{EventTime, Tables}
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(EventTime.epochUs(col("ts")))
      .rangeBetween(-hourUs, 0L)
    val expected = ev
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("event_id"), col("n"), col("s"))
      .as[(Long, Long, Option[Double])].collect().toSet
    for (bucketUs <- Seq(hourUs, 24L * hourUs)) {
      val got = graft.ops.Windows.skewTrailingCountSum(ev, "user_id",
          EventTime.epochUs(col("ts")), col("value"), "n", "s", hourUs, bucketUs)
        .select(col("event_id"), col("n"), col("s"))
        .as[(Long, Long, Option[Double])].collect().toSet
      assert(got === expected, s"bucketUs=$bucketUs diverged")
    }
  }

  test("skewTrailingCountSum: ties, nulls, and boundary ghosts") {
    // adversarial shape the real data lacks: duplicate timestamps (a
    // RANGE frame includes ties AHEAD of the current row), null values
    // (count(*) counts them, sum skips; all-null frame → null sum), and
    // rows exactly windowUs apart straddling a bucket edge
    val hourUs = 3600000000L
    val base = 1704067200000000L
    val rows = Seq(
      (1L, 1L, base - 1000000L, Some(1.005)), // rounds to 1.01 (HALF_UP)
      (1L, 2L, base + 10L, Some(2.0)), // next bucket; prev row in frame via ghost
      (1L, 3L, base + 10L, None), // TIE with row 2, null value
      (1L, 4L, base + 10L, Some(3.0)), // second tie — all three mutual in-frame
      (1L, 5L, base + 10L + hourUs, Some(4.0)), // exactly windowUs later: ties 2-4 still in-frame
      (1L, 6L, base + 11L + hourUs, Some(5.0)), // 1µs past: ties 2-4 evicted
      (2L, 7L, base, None), // lone null: n=1, sum null
      (2L, 8L, base + 1L, None)) // two nulls in frame: n=2, sum null
    val ev = rows.toDF("user_id", "event_id", "ts_us", "value")
    val got = graft.ops.Windows.skewTrailingCountSum(ev, "user_id",
        col("ts_us"), col("value"), "n", "s", hourUs)
      .select(col("event_id"), col("n"), col("s"))
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((1L, Some(1.01))))
    assert(got(2L) === ((4L, Some(6.01)))) // rows 1-4: 1.01+2.0+3.0, null skipped
    assert(got(3L) === ((4L, Some(6.01)))) // tie sees identical frame
    assert(got(4L) === ((4L, Some(6.01))))
    assert(got(5L) === ((4L, Some(9.0)))) // rows 2-5 (row 1 evicted): 2+3+4
    assert(got(6L) === ((2L, Some(9.0)))) // rows 5-6: 4+5
    assert(got(7L) === ((1L, None)))
    assert(got(8L) === ((2L, None)))
  }

  test("skewLag: synthetic fixture with events exactly on bucket boundaries") {
    // rows AT a boundary belong to the later bucket; their lag must come
    // from the stitch, and multi-bucket holes must not break it. NULL
    // keys form their own lag partition (single-window semantics) and
    // must survive the stitch join (ADVICE r10: a plain equi-join
    // dropped them). NULL timestamps yield a NULL bucket, which must
    // also survive the stitch AND sort before every numeric bucket —
    // exactly where null timestamps sort in the single window (ADVICE
    // r11: the plain-bkt-column equi-join dropped them; the
    // struct(key, bucket) join matches null = null on both fields).
    val hourUs = 3600000000L
    val base = 1704067200000000L
    val rows = Seq(
      (Some(1L), 1L, Some(base - 1L), "a"), // last µs of bucket -1 — stitch = z2
      (Some(1L), 2L, Some(base), "b"), // first µs of bucket 0 — lag via stitch = a
      (Some(1L), 3L, Some(base + hourUs), "c"), // boundary again — stitch = b
      (Some(1L), 4L, Some(base + 10L * hourUs), "d"), // 9-bucket hole — stitch = c
      (Some(2L), 5L, Some(base), "x"), // other key: no predecessor
      (None, 6L, Some(base - 1L), "n1"), // null key, bucket -1
      (None, 7L, Some(base), "n2"), // null key crossing the boundary — stitch = n1
      (Some(1L), 8L, None, "z1"), // null ts: key 1's FIRST row globally
      (Some(1L), 9L, None, "z2"), // null-ts tie broken by event_id — prev = z1
      (Some(3L), 10L, None, "z3")) // lone null-ts key
    val ev = rows.toDF("user_id", "event_id", "ts_us", "et")
    val got = graft.ops.Windows.skewLag(ev, "prev", col("et"), "user_id",
        col("ts_us"), col("event_id"), hourUs)
      .select(col("event_id"), col("prev"))
      .as[(Long, Option[String])].collect().toMap
    val expected = Map(1L -> Some("z2"), 2L -> Some("a"), 3L -> Some("b"),
      4L -> Some("c"), 5L -> None, 6L -> None, 7L -> Some("n1"),
      8L -> None, 9L -> Some("z1"), 10L -> None)
    assert(got === expected)
    // and the hand-computed map IS the single-window semantics
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val single = ev.withColumn("prev", lag(col("et"), 1).over(w))
      .select(col("event_id"), col("prev"))
      .as[(Long, Option[String])].collect().toMap
    assert(single === expected)
  }

  test("kernel's BigDecimal mirror == the engine's double→DECIMAL(18,2) cast (version contract)") {
    // skewTrailingCountSum is the tree's only hand-rolled SQL semantics:
    // it accumulates BigDecimal.valueOf(v).setScale(2, HALF_UP), claimed
    // identical to Spark 4.1.2's non-ANSI Cast(Double→Decimal(18,2)).
    // Sweep adversarial values through the ENGINE's cast and fail loudly
    // if an upgrade ever diverges: representable-half ties (x.005 is
    // usually NOT exactly half in binary — valueOf sees the shortest
    // decimal form), true binary halves (k + 0.125 scaled), negatives,
    // large magnitudes near the 16-digit precision edge, and subnormals.
    val sweep: Seq[Double] =
      (-2000 to 2000).map(_ * 0.005) ++
        (-50 to 50).map(_ * 0.125) ++
        Seq(1.005, 2.675, 0.015, -1.005, -2.675,
          1234567890123.455, -1234567890123.455, 9.999999999999998E12,
          1e-12, -1e-12, 4.9E-324, 0.0, -0.0)
    val df = sweep.toDF("v")
      .select(col("v"), col("v").cast("decimal(18,2)").as("c"))
    val rows = df.collect()
    rows.foreach { r =>
      val v = r.getDouble(0)
      val engine = Option(r.getDecimal(1)).map(_.stripTrailingZeros)
      val mirror = Option(java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)).map(_.stripTrailingZeros)
      assert(engine.map(_.compareTo(mirror.get) == 0).getOrElse(mirror.isEmpty),
        s"cast divergence at v=$v: engine=$engine mirror=$mirror — " +
          "Spark's Double→Decimal cast changed; update Windows.skewTrailingCountSum")
    }
    assert(rows.length === sweep.length)
  }

  test("size-aware regime pick: small inputs single-window, large inputs skew-split") {
    // VERDICT r10 #6: the bucketed spellings cost ~0.7-0.8 s of fixed
    // stitch stages that sf0.1-class inputs never earn back. The pick is
    // plan-only (stats sizeInBytes), so assert on the OPTIMIZED PLAN: the
    // skew-split spelling carries a stitch Join, the single-window one
    // doesn't. No execution of the large fixture needed.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import graft.core.{EventTime, Tables}
    def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst { case j: Join => j }.nonEmpty
    val small = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val smallLag = graft.ops.Windows.lagAuto(small, "prev", col("event_type"),
      "user_id", EventTime.epochUs(col("ts")), col("event_id"))
    assert(!hasJoin(smallLag), "small input should take the single-window lag")
    assert(!hasJoin(graft.streaming.Streams.sessionsBatch(
      Tables.events(spark, sfDir), 30)),
      "small input should take the single-window sessionization")
    // range stats = 8 bytes/row: 12M rows reads as ~96 MB, over threshold
    val big = spark.range(12L * 1000 * 1000)
      .select(($"id" % 1000).as("user_id"), $"id".as("event_id"),
        ($"id" * 1000000L).as("ts_us"), lit("t").as("event_type"))
    val bigLag = graft.ops.Windows.lagAuto(big, "prev", col("event_type"),
      "user_id", col("ts_us"), col("event_id"))
    assert(hasJoin(bigLag), "large input should take the skew-split lag")
    // and the single-window value path agrees with skewLag on the fixture
    // regardless of which side of the threshold picked it (value pin)
    val fixture = Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (2L, 3L, 5L, "c"))
      .toDF("user_id", "event_id", "ts_us", "et")
    val viaAuto = graft.ops.Windows.lagAuto(fixture, "prev", col("et"),
        "user_id", col("ts_us"), col("event_id"))
      .select(col("event_id"), col("prev"))
      .as[(Long, Option[String])].collect().toMap
    val viaSplit = graft.ops.Windows.skewLag(fixture, "prev", col("et"),
        "user_id", col("ts_us"), col("event_id"))
      .select(col("event_id"), col("prev"))
      .as[(Long, Option[String])].collect().toMap
    assert(viaAuto === viaSplit)
  }

  test("skewLag stitch join adds no exchange on the event side (plan pin)") {
    // The null-safe struct key must not cost a shuffle of the
    // data-proportional side: the lag window partitions by
    // (struct(key), bucket) and the stitch join consumes that exchange
    // directly, so the join's PROBE subtree carries exactly ONE shuffle
    // (the window's). The summary side is volume-free; its exchanges
    // don't matter.
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import graft.core.{EventTime, Tables}
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val df = graft.ops.Windows.skewLag(ev, "prev_type", col("event_type"),
      "user_id", EventTime.epochUs(col("ts")), col("event_id"))
    df.queryExecution.toRdd.count()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
      p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => unwrap(q.plan)
        case other => other
      }
    val finalP = unwrap(df.queryExecution.executedPlan)
    val joins = finalP.collect { case j: ShuffledHashJoinExec => j }
    assert(joins.nonEmpty, s"expected a shuffled-hash stitch join:\n$finalP")
    val probeShuffles = joins.head.left.collect {
      case s: ShuffleQueryStageExec => s
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(probeShuffles.size === 1,
      s"stitch join re-shuffled the event side (${probeShuffles.size} shuffles):\n$finalP")
  }
}
