package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints exchange/broadcast/codegen counts per
  * named catalog query (run via `runMain graft.tools.ExplainNew`).
  *
  * Two modes:
  *  - static (default): counts over the pre-execution physical plan —
  *    cheap, no data read beyond footer/schema work.
  *  - `--exec`: RUNS the query (noop sink) and audits the FINAL adaptive
  *    plan, which is the only place AQE's runtime decisions are visible —
  *    skew-join splits (`skew=true` on SMJ/SHJ nodes), runtime SMJ→BHJ
  *    demotions, coalesced exchanges. Use with `--skew-scaled` on
  *    rehearsal corpora: AQE's default skew trigger (partition > 256 MB
  *    AND > 5× median) can never fire on a 100×-rehearsal-sized shuffle
  *    whose partitions are tens of MB — the scaled thresholds (8 MB)
  *    are the same RATIO to the rehearsal's partition sizes that the
  *    defaults are to a 1000-executor cluster's, so "does AQE split the
  *    hot key" is answerable without 100 TB of disk.
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val rest = args.filterNot(_.startsWith("--"))
    val exec = flags.contains("--exec")
    val skewScaled = flags.contains("--skew-scaled")
    val builder = SparkSession.builder()
      .master(if (exec) "local[32]" else "local[4]")
      .config("spark.sql.shuffle.partitions", if (exec) "32" else "4")
      // the ENGINE's session settings (Sessions.local), not bare
      // defaults: a 10 MB default broadcast threshold would report
      // SMJ flips the engine's 64 MB sessions never see
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (skewScaled) {
      builder
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          (8 * 1024 * 1024).toString)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          (8 * 1024 * 1024).toString)
    }
    val spark = builder.getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.01"
    val names = if (rest.length > 1) rest.drop(1).toSeq
      else Seq("x91_mixture", "x95_mixture_epochs", "x92_shuffle",
        "x93_bigram_rarity", "x94_inverted_index", "x96_normalize")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      if (exec) df.write.format("noop").mode("overwrite").save()
      // after execution the AdaptiveSparkPlan stringifies its FINAL plan
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(plan).length +
        "Exchange rangepartitioning".r.findAllIn(plan).length +
        "Exchange SinglePartition".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      val skewed = "skew=true".r.findAllIn(plan).length
      val joins =
        "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
          .findAllIn(plan).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
      println(s"[explain] $n: exchanges=$ex broadcasts=$bc " +
        s"codegenSpans=$wsc skewedJoins=$skewed joins=$joins" +
        (if (exec) " (final adaptive plan)" else ""))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
