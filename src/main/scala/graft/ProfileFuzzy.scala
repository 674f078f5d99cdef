package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the x104 fuzzy-join path (ProfileX32 precedent). */
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
    t("warm")(left.count())
    // replicate fuzzyJoin internals with per-step timing
    import graft.ext.Fuzzy.charGrams
    val l0 = left.select(col("c_custkey").as("id_l"),
      explode(charGrams(col("c_name"), 3)).as("g"))
    val r0 = right.select(col("c_custkey").as("id_r"),
      explode(charGrams(col("c_name"), 3)).as("g"))
    t("count-both")(left.select(lit(1)).unionAll(right.select(lit(1))).count())
    val freq = l0.select(col("g")).unionAll(r0.select(col("g")))
      .groupBy(col("g")).agg(count(lit(1)).as("df_g")).cache()
    t("freq-fill")(freq.count())
    val keep = freq.where(col("df_g") <= 6000.0).select(col("g"))
    val lp = l0.join(broadcast(keep), "g").cache()
    val rp = r0.join(broadcast(keep), "g").cache()
    t("lp-fill")(lp.count()); t("rp-fill")(rp.count())
    val sizesL = lp.groupBy(col("id_l")).agg(count(lit(1)).as("n_l"))
    val sizesR = rp.groupBy(col("id_r")).agg(count(lit(1)).as("n_r"))
    def prefixed(grams: org.apache.spark.sql.DataFrame, idCol: String,
        sizes: org.apache.spark.sql.DataFrame, sizeCol: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("df_g"), col("g"))
      grams.join(broadcast(freq), "g")
        .join(sizes, idCol)
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <=
          col(sizeCol) - ceil(col(sizeCol) * lit(0.8) - lit(1e-9)) + 1)
        .select(col("g"), col(idCol), col(sizeCol))
    }
    val prefL = prefixed(lp, "id_l", sizesL, "n_l").cache()
    val prefR = prefixed(rp, "id_r", sizesR, "n_r").cache()
    t("prefL-fill")(prefL.count()); t("prefR-fill")(prefR.count())
    t("est")(prefL.groupBy("g").agg(count(lit(1)).as("dl"))
      .join(prefR.groupBy("g").agg(count(lit(1)).as("dr")), "g")
      .agg(sum(col("dl") * col("dr"))).head)
    val out = t("build")(graft.ext.Fuzzy.fuzzyJoin(left, "c_custkey", "c_name",
      right, "c_custkey", "c_name", n = 3, threshold = 0.8, maxGramShare = 0.2))
    t("run1")(out.orderBy(col("id_l"), col("id_r"))
      .write.mode("overwrite").parquet("/tmp/fz/out"))
    t("run2")(out.orderBy(col("id_l"), col("id_r"))
      .write.mode("overwrite").parquet("/tmp/fz/out2"))
    spark.stop()
  }
}
