package graft
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Sort

/** r21 optimization probe: quantify the cost of the final global orderBy
  * (range partitioning samples its child, then re-executes it — the
  * segment above the last hash exchange runs twice) by timing, for each
  * named query:
  *   A. the declared frame (with its top-level Sort);
  *   B. the frame with the top Sort stripped (the segment once, no sort);
  *   C. stripped + localCheckpoint(true) + the same orderBy re-applied
  *      (materialize once, sample+shuffle read the checkpoint).
  * Usage: Test/runMain graft.ProfileR21 q10_flagship_document q11_scalar_funcs
  */
object ProfileR21 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        time(s"$name declared run$i") { noop(fn(spark, dir)) }
      }
      (1 to 3).foreach { i =>
        val df = fn(spark, dir)
        df.queryExecution.logical match {
          case Sort(order, true, child, _) =>
            val stripped = org.apache.spark.sql.classic.GraftTestShim.ofRows(spark, child)
            time(s"$name stripped run$i") { noop(stripped) }
          case _ => println(s"[prof] $name top node is not a global Sort")
        }
      }
      def sortVariant(tag: String, i: Int)(
          rebuild: (DataFrame, Seq[org.apache.spark.sql.catalyst.expressions.SortOrder])
            => DataFrame): Unit = {
        val df = fn(spark, dir)
        df.queryExecution.analyzed match {
          case Sort(order, true, child, _) =>
            val base = org.apache.spark.sql.classic.GraftTestShim.ofRows(spark, child)
            time(s"$name $tag run$i") { noop(rebuild(base, order)) }
          case _ => println(s"[prof] $name top node not a global Sort; skip $tag")
        }
      }
      def reSort(df: DataFrame,
          order: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder]): DataFrame = {
        val cols = order.map(so => org.apache.spark.sql.classic.GraftTestShim.exprCol(so.child) match {
          case c =>
            (so.direction, so.nullOrdering) match {
              case (org.apache.spark.sql.catalyst.expressions.Ascending,
                    org.apache.spark.sql.catalyst.expressions.NullsFirst) => c.asc
              case (org.apache.spark.sql.catalyst.expressions.Ascending, _) => c.asc_nulls_last
              case (org.apache.spark.sql.catalyst.expressions.Descending,
                    org.apache.spark.sql.catalyst.expressions.NullsLast) => c.desc
              case _ => c.desc_nulls_first
            }
        })
        df.orderBy(cols: _*)
      }
      (1 to 3).foreach { i =>
        sortVariant("repart+sort", i) { (base, order) =>
          reSort(base.repartition(spark.sparkContext.defaultParallelism), order)
        }
      }
      (1 to 3).foreach { i =>
        sortVariant("ckpt+sort", i) { (base, order) =>
          reSort(base.localCheckpoint(true), order)
        }
      }
    }
    spark.stop()
  }
}
