package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** r22 probe: fine-grained decomposition of fuzzyJoin's inner stages on
  * the x104 frames — prefix window pass per side, budget estimate,
  * candidate join, verification — so the optimization targets the stage
  * that costs. Usage: Test/runMain graft.ProfileR22Fuzzy
  */
object ProfileR22Fuzzy {
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
    }
    def clear(): Unit = {
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
    val threshold = 0.8
    if (args.contains("plans")) {
      // the operator's internal localCheckpoint hides its pipeline from
      // graft.Plans; these are the before (r21: exploded verification
      // joins + two-groupBy estimate) and after (r22: gram arrays on the
      // prefix rows) inner plans, reconstructed with the operator's own
      // spellings (uncached/uncheckpointed so the full tree is visible)
      def grams(df: DataFrame, id: String, key: String, as: String) =
        df.select(col(id).as(as),
          explode(graft.ext.Fuzzy.charGrams(col(key), 3)).as("g"))
      val l0 = grams(left, "c_custkey", "c_name", "id_l")
      val r0 = grams(right, "pid", "pname", "id_r")
      val cap = lit(0.2 * 2 * 15000)
      val freq = l0.select(col("g")).unionAll(r0.select(col("g")))
        .groupBy(col("g")).agg(count(lit(1)).as("df_g"))
      val keep = freq.where(col("df_g").cast(DoubleType) <= cap).select(col("g"))
      val lp = l0.join(broadcast(keep), "g")
      val rp = r0.join(broadcast(keep), "g")
      def prefixed(gr: DataFrame, idCol: String, sizeCol: String,
          setCol: Option[String]): DataFrame = {
        val wPart = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
        val wOrd = wPart.orderBy(col("df_g"), col("g"))
        val base = gr.join(broadcast(freq), "g")
          .withColumn(sizeCol, count(lit(1)).over(wPart))
        val withSet = setCol.fold(base)(s =>
          base.withColumn(s, collect_list(col("g")).over(wPart)))
        withSet.withColumn("__rk", row_number().over(wOrd))
          .where(col("__rk") <=
            col(sizeCol) - ceil(col(sizeCol) * lit(threshold) - lit(1e-9)) + 1)
          .drop("__rk", "df_g")
      }
      println("===== x104 inner pipeline BEFORE (r21: exploded verification joins) =====")
      locally {
        val prefL = prefixed(lp, "id_l", "n_l", None)
        val prefR = prefixed(rp, "id_r", "n_r", None)
        val cand = prefL.join(prefR, Seq("g"))
          .where(col("n_l").cast(DoubleType) >= lit(threshold) * col("n_r") - lit(1e-9) &&
            col("n_r").cast(DoubleType) >= lit(threshold) * col("n_l") - lit(1e-9))
          .select(col("id_l"), col("id_r"), col("n_l"), col("n_r")).distinct()
        cand.join(lp, Seq("id_l"))
          .join(rp, Seq("g", "id_r"))
          .groupBy(col("id_l"), col("id_r"), col("n_l"), col("n_r"))
          .agg(count(lit(1)).as("n_common"))
          .withColumn("jaccard", col("n_common").cast(DoubleType)
            / (col("n_l") + col("n_r") - col("n_common")).cast(DoubleType))
          .where(col("jaccard") >= lit(threshold))
          .explain("formatted")
      }
      println("===== x104 inner pipeline AFTER (r22: gram arrays on prefix rows) =====")
      locally {
        val prefL = prefixed(lp, "id_l", "n_l", Some("gs_l"))
        val prefR = prefixed(rp, "id_r", "n_r", Some("gs_r"))
        prefL.join(prefR, Seq("g"))
          .where(col("n_l").cast(DoubleType) >= lit(threshold) * col("n_r") - lit(1e-9) &&
            col("n_r").cast(DoubleType) >= lit(threshold) * col("n_l") - lit(1e-9))
          .select(col("id_l"), col("id_r"), col("n_l"), col("n_r"),
            col("gs_l"), col("gs_r"))
          .distinct()
          .withColumn("n_common",
            size(array_intersect(col("gs_l"), col("gs_r"))).cast("long"))
          .withColumn("jaccard", col("n_common").cast(DoubleType)
            / (col("n_l") + col("n_r") - col("n_common")).cast(DoubleType))
          .where(col("jaccard") >= lit(threshold))
          .select(col("id_l"), col("id_r"), col("n_common"),
            col("n_l"), col("n_r"), col("jaccard"))
          .explain("formatted")
      }
      spark.stop()
      return
    }
    (1 to 3).foreach { i =>
      val l0 = left.select(col("c_custkey").as("id_l"),
        explode(graft.ext.Fuzzy.charGrams(col("c_name"), 3)).as("g"))
      val r0 = right.select(col("pid").as("id_r"),
        explode(graft.ext.Fuzzy.charGrams(col("pname"), 3)).as("g"))
      val total = left.count().toDouble + right.count().toDouble
      val cap = lit(0.2 * total)
      val freq = l0.select(col("g")).unionAll(r0.select(col("g")))
        .groupBy(col("g")).agg(count(lit(1)).as("df_g")).cache()
      val keep = freq.where(col("df_g").cast(DoubleType) <= cap).select(col("g"))
      val lp = l0.join(broadcast(keep), "g").cache()
      val rp = r0.join(broadcast(keep), "g").cache()
      def prefixed(grams: DataFrame, idCol: String, sizeCol: String): DataFrame = {
        val wPart = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
        val wOrd = wPart.orderBy(col("df_g"), col("g"))
        grams.join(broadcast(freq), "g")
          .withColumn(sizeCol, count(lit(1)).over(wPart))
          .withColumn("__rk", row_number().over(wOrd))
          .where(col("__rk") <=
            col(sizeCol) - ceil(col(sizeCol) * lit(threshold) - lit(1e-9)) + 1)
          .select(col("g"), col(idCol), col(sizeCol))
      }
      time(s"fill-lp-rp run$i") { noop(lp); noop(rp) }
      val prefL = prefixed(lp, "id_l", "n_l").cache()
      val prefR = prefixed(rp, "id_r", "n_r").cache()
      time(s"prefix-windows run$i") { noop(prefL); noop(prefR) }
      time(s"est run$i") {
        val fl = prefL.groupBy("g").agg(count(lit(1)).as("dl"))
        val fr = prefR.groupBy("g").agg(count(lit(1)).as("dr"))
        val est = fl.join(fr, "g")
          .agg(sum(col("dl").cast(DoubleType) * col("dr").cast(DoubleType)))
          .head().getAs[Any](0)
        println(s"[prof]   est=$est prefL=${prefL.count()} prefR=${prefR.count()} " +
          s"lp=${lp.count()} rp=${rp.count()}")
      }
      val cand = prefL.join(prefR, Seq("g"))
        .where(col("n_l").cast(DoubleType) >= lit(threshold) * col("n_r") - lit(1e-9) &&
          col("n_r").cast(DoubleType) >= lit(threshold) * col("n_l") - lit(1e-9))
        .select(col("id_l"), col("id_r"), col("n_l"), col("n_r")).distinct().cache()
      time(s"cand-join run$i") { noop(cand); println(s"[prof]   cand=${cand.count()}") }
      time(s"verify run$i") {
        noop(cand.join(lp, Seq("id_l"))
          .join(rp, Seq("g", "id_r"))
          .groupBy(col("id_l"), col("id_r"), col("n_l"), col("n_r"))
          .agg(count(lit(1)).as("n_common"))
          .withColumn("jaccard",
            col("n_common").cast(DoubleType)
              / (col("n_l") + col("n_r") - col("n_common")).cast(DoubleType))
          .where(col("jaccard") >= lit(threshold)))
      }
      clear()
    }
    spark.stop()
  }
}
