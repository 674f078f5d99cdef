package graft
import org.apache.spark.sql.SparkSession
/** Print physical plans for named queries: runMain graft.Plans q01_agg ... */
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
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
