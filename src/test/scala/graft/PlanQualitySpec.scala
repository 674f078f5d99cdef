package graft

/** Sweeping plan-quality gate over the WHOLE query catalog: no entry may
  * plan a cartesian product or a broadcast nested-loop join — the two
  * shapes that are quadratic at scale. Catching a regression here is the
  * point: a refactor that silently turns an equi-join into a theta join
  * fails this spec before it fails a 100 TB run.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // BNLJ is acceptable ONLY when the broadcast build side is provably a
  // single row (the scalar-reference pattern: O(rows·1) streaming probe,
  // which no equi-join can express because a constant key folds away).
  // x44 joins a 1-row limited reference vector; x37 joins the corpus-size
  // global aggregate.
  // x93 joins the 1-row corpus vocabulary-size aggregate (same class as
  // x37's global aggregate — a scalar no equi-key can express).
  private val singleRowBroadcast =
    Set("x44_vector_ops", "x37_tfidf", "x93_bigram_rarity",
      "x53_media_neardup") // 1-row planted-twin witness broadcast

  test("no catalog query plans a cartesian product or nested-loop join") {
    // Streaming entries execute inside the builder (memory-sink table) —
    // their returned plan is the trivial scan, which passes vacuously;
    // their internal plans are window/agg shapes covered by StreamsSpec.
    // withPlanAudit: audit the FULL pipeline below orderedOnce's
    // materialization point, not the truncated post-checkpoint scan
    graft.ops.Relational.withPlanAudit {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      if (!singleRowBroadcast(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join")
    }
    }
  }

  test("runtime bloom-filter pruning injects on selective shuffle joins") {
    // The 100 TB selective-join lever: when a filtered dim shuffle-joins a
    // huge fact, Spark can build a bloom filter on the dim keys and
    // apply it to the fact scan side, cutting shuffle volume before the
    // join. Pin that our join shapes qualify for the injection (engine
    // thresholds are sized for clusters, so the spec scales them down —
    // production keeps the defaults).
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    import org.apache.spark.sql.functions.col
    val fact = ss.read.parquet(s"$dir/lineitem.parquet")
    val dim = ss.read.parquet(s"$dir/part.parquet").where(col("p_size") === 1)
    val plan = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(plan.contains("bloom_filter_agg") && plan.contains("might_contain"),
      "selective dim ⋈ fact should inject a runtime bloom filter on the fact side")
    // and the join result is unchanged by the rewrite
    val withBloom = fact.join(dim, fact("l_partkey") === dim("p_partkey")).count()
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val without = fact.join(dim, fact("l_partkey") === dim("p_partkey")).count()
    assert(withBloom === without)
  }

  test("expensive compiled expressions evaluate exactly once per row") {
    // A filter pushed below a projection re-evaluates the projected
    // expression per consumer (the round-1 minhash regression): pin that
    // each one-pass signature expression appears exactly once in its
    // query's physical plan.
    val expected = Seq(
      ("x76_repetition", "graft_repetition_stats"),
      ("x32_minhash_pairs", "graft_minhash_signature"),
      ("x33_simhash_pairs", "graft_simhash64"),
      ("x114_script_langid", "graft_script_counts"))
    expected.foreach { case (query, exprName) =>
      val plan = graft.ops.Relational.withPlanAudit {
        SparkEntry.queries(query)(spark, dir)
          .queryExecution.executedPlan.toString
      }
      val n = exprName.r.findAllIn(plan).length
      assert(n >= 1, s"$query: $exprName missing from plan")
      assert(n <= 2, // name can appear once per side of a self-join
        s"$query: $exprName appears $n times — re-evaluation regression:\n$plan")
    }
  }

  test("date-window predicates reach the parquet scan (PushedFilters)") {
    // The engine's raw-timestamp window convention exists so range
    // predicates hit parquet row-group stats — pin that they actually
    // arrive at the scan instead of evaluating post-read.
    val plan = graft.ops.Relational.withPlanAudit {
      SparkEntry.queries("q03_semi_join")(spark, dir)
        .queryExecution.executedPlan.toString
    }
    val scanLines = plan.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(scanLines.nonEmpty, s"no PushedFilters in plan:\n$plan")
    assert(scanLines.exists(l =>
      l.contains("GreaterThanOrEqual(o_orderdate") ||
        l.contains("GreaterThanOrEqual(l_shipdate")),
      s"date window not pushed to the scan:\n${scanLines.mkString("\n")}")
  }

  test("dynamic partition pruning fires on partitioned-fact ⋈ filtered-dim") {
    // The 100 TB pattern: a date/key-partitioned fact joined to a
    // filtered dimension must scan ONLY the partitions the dim selects —
    // DPP injects the dim's keys into the fact scan at runtime.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/fact"
    val spark2 = spark
    import spark2.implicits._
    spark.range(0L, 10000L).select(
      col("id"), (col("id") % 10).as("part_key"),
      (col("id") * 2).as("v"))
      .write.partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP requires a SELECTIVE predicate on the dim side that survives
    // optimization (a local relation constant-folds its filter away), a
    // file-based dim, and a cast-free partition-key equi-join.
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString + "/dim"
    Seq((3, "keep"), (7, "keep"), (8, "drop"), (9, "drop"))
      .toDF("dk", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("tag") === lit("keep"))
    val joined = fact.join(dim, col("part_key") === col("dk"))
      .agg(sum(col("v")).as("s"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected dynamic partition pruning in plan:\n$plan")
    // and the result is correct
    val expected = (0L until 10000L).filter(i => i % 10 == 3 || i % 10 == 7)
      .map(_ * 2).sum
    assert(joined.head().getLong(0) === expected)
  }

  test("the sanctioned nested-loop joins really have single-row build sides") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    graft.ops.Relational.withPlanAudit {
    singleRowBroadcast.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val nonEqui = df.queryExecution.optimizedPlan.collect {
        case j: Join if j.condition.isEmpty => j
      }
      assert(nonEqui.nonEmpty, s"$name: expected the scalar cross join")
      nonEqui.foreach { j =>
        // maxRows proves the bound statically: GlobalLimit 1 and global
        // (grouping-free) aggregates both report Some(1)
        val bounded = Seq(j.left, j.right).exists(_.maxRows.exists(_ <= 1L))
        assert(bounded, s"$name: condition-free join without a provably " +
          s"single-row side:\n$j")
      }
    }
    }
  }
}
