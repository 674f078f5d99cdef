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
  private val singleRowBroadcast = Set("x44_vector_ops", "x37_tfidf")

  test("no catalog query plans a cartesian product or nested-loop join") {
    // Streaming entries execute inside the builder (memory-sink table) —
    // their returned plan is the trivial scan, which passes vacuously;
    // their internal plans are window/agg shapes covered by StreamsSpec.
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      if (!singleRowBroadcast(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join")
    }
  }

  test("the sanctioned nested-loop joins really have single-row build sides") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
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
