package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 probe: decompose x104_fuzzy_join (floor ~4.6 s) into the fuzzyJoin
  * operator's sequential jobs: key-count, gram explode, freq build, pruned
  * sides, prefix windows, budget estimate, candidate join + verification.
  * Usage: Test/runMain graft.ProfileR21Fuzzy
  */
object ProfileR21Fuzzy {
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
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cust = graft.core.Tables.customer(spark, dir)
    val left = cust.select(col("c_custkey"), col("c_name"))
    val right = cust.select(
      (col("c_custkey") + lit(10000000L)).as("pid"),
      concat(substring(col("c_name"), 1, 9), lit("x"),
        substring(col("c_name"), 11, 1000)).as("pname"))
    (1 to 3).foreach { i =>
      time(s"keycount run$i") {
        left.select(lit(1).as("one")).unionAll(right.select(lit(1).as("one"))).count()
      }
      time(s"grams-noop run$i") {
        noop(left.select(col("c_custkey").as("id_l"),
          explode(graft.ext.Fuzzy.charGrams(col("c_name"), 3)).as("g")))
      }
      time(s"freq run$i") {
        val l0 = left.select(col("c_custkey").as("id_l"),
          explode(graft.ext.Fuzzy.charGrams(col("c_name"), 3)).as("g"))
        val r0 = right.select(col("pid").as("id_r"),
          explode(graft.ext.Fuzzy.charGrams(col("pname"), 3)).as("g"))
        noop(l0.select(col("g")).unionAll(r0.select(col("g")))
          .groupBy(col("g")).agg(count(lit(1)).as("df_g")))
      }
      time(s"fuzzy-full run$i") {
        noop(graft.ext.Fuzzy.fuzzyJoin(left, "c_custkey", "c_name",
          right, "pid", "pname", n = 3, threshold = 0.8, maxGramShare = 0.2))
      }
      time(s"x104-full run$i") {
        noop(graft.queries.ExtQueries.x104FuzzyJoin(spark, dir))
      }
    }
    spark.stop()
  }
}
