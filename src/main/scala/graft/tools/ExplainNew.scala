package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints exchange/broadcast/codegen counts per
  * named catalog query (run via `runMain graft.tools.ExplainNew`).
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
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
      println(s"[explain] $n: exchanges=$ex broadcasts=$bc codegenSpans=$wsc")
    }
    spark.stop()
  }
}
