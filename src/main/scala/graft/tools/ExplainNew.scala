package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints exchange/broadcast/codegen counts per
  * named catalog query (run via `runMain graft.tools.ExplainNew`).
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // the ENGINE's session settings (Sessions.local), not bare
      // defaults: a 10 MB default broadcast threshold would report
      // SMJ flips the engine's 64 MB sessions never see
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("x91_mixture", "x95_mixture_epochs", "x92_shuffle",
        "x93_bigram_rarity", "x94_inverted_index", "x96_normalize")
    for (n <- names) {
      val plan = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(plan).length +
        "Exchange rangepartitioning".r.findAllIn(plan).length +
        "Exchange SinglePartition".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      val joins =
        "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
          .findAllIn(plan).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
      println(s"[explain] $n: exchanges=$ex broadcasts=$bc " +
        s"codegenSpans=$wsc joins=$joins")
    }
    spark.stop()
  }
}
