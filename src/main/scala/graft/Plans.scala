package graft
import org.apache.spark.sql.SparkSession
/** Print physical plans for named queries: runMain graft.Plans q01_agg ...
  *
  * Two sections per query since r21:
  *  - EXECUTION PLAN: what `df.explain` shows on the shipping path. For
  *    queries routed through `Relational.orderedOnce` this truncates at a
  *    `Scan ExistingRDD` — the materialize-once point below the global sort
  *    (the child pipeline runs exactly once, then only its rows are sorted).
  *  - FULL PIPELINE (plan-audit mode): the same query explained inside
  *    `Relational.withPlanAudit`, which skips the checkpoint so every
  *    operator below the sort is visible (join strategies, pushed filters,
  *    exchange count). This is the plan the materialized segment executes.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64*1024*1024).toString)
      .config("spark.ui.enabled","false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.foreach { q =>
      println(s"===== $q =====")
      println("----- FULL PIPELINE (plan-audit mode: checkpoint skipped) -----")
      graft.ops.Relational.withPlanAudit {
        SparkEntry.queries(q)(spark, dir).explain("formatted")
      }
      println("----- EXECUTION PLAN (shipping path) -----")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
