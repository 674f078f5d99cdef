package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the x104 fuzzy-join path (ProfileX32 precedent):
  * cold vs warm end-to-end runs at sf0.1. The round-5 profiling that
  * motivated prefix filtering + lazy caches lives in the Fuzzy scaladoc.
  */
object ProfileFuzzy {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val left = cust.select(col("c_custkey"), col("c_name"))
    val right = cust.select((col("c_custkey") + 10000000L).as("c_custkey"),
      concat(substring(col("c_name"), 1, 9), lit("x"),
        substring(col("c_name"), 11, 999)).as("c_name"))
    t("warmup")(left.count())
    def run(tag: String): Unit = {
      val out = graft.ext.Fuzzy.fuzzyJoin(left, "c_custkey", "c_name",
        right, "c_custkey", "c_name", n = 3, threshold = 0.8,
        maxGramShare = 0.2)
      t(tag)(out.orderBy(col("id_l"), col("id_r"))
        .write.mode("overwrite").parquet(s"/tmp/fz/$tag"))
    }
    run("cold"); run("warm1"); run("warm2")
    spark.stop()
  }
}
