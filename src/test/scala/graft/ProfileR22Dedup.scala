package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r22 probe (VERDICT r21 "prove or revert the b37078f window rewrites"):
  * time the three spellings of "carry per-doc shingle-set sizes into the
  * pair aggregation" on EQUAL footing — no budget-estimate job, no final
  * checkpoint, noop sink — so the comparison isolates exactly the sizes
  * plumbing:
  *   A window   (r21 ship): n_sh = count over (partition by id) on the
  *              exploded shingle frame — exchange(id) + FULL SORT of the
  *              largest frame in the operator;
  *   B post-agg (pre-r21): groupBy(id).count sizes joined onto the PAIR
  *              table after the pair aggregation (2 joins; at corpus
  *              scale the O(docs) sizes outgrow broadcast and re-shuffle
  *              the pair table twice);
  *   C pre-join (candidate): the same groupBy(id).count sizes joined
  *              onto the SHINGLE frame before the pair join, carried
  *              through the pair groupBy keys like A — partial-agg
  *              exchange of O(docs) rows, no full sort; AQE picks
  *              broadcast locally and SMJ at scale.
  * Usage: Test/runMain graft.ProfileR22Dedup
  */
object ProfileR22Dedup {
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
    val docs = graft.core.Tables.documents(spark, dir)
    def finish(raw: DataFrame): DataFrame = raw
      .withColumn("jaccard", col("n_common").cast("double")
        / (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .where(col("jaccard") >= lit(0.3))
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
        col("n_b"), col("jaccard"))

    def spellA(sh: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val sized = sh.withColumn("n_sh", count(lit(1)).over(w))
      val a = sized.select(col("doc_id").as("id_a"), col("shingle"), col("n_sh").as("n_a"))
      val b = sized.select(col("doc_id").as("id_b"), col("shingle"), col("n_sh").as("n_b"))
      finish(a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("n_common")))
    }
    def spellB(sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
      val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
      val inter = a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
      finish(inter
        .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b")))
    }
    def spellC(sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val sized = sh.join(sizes, Seq("doc_id"))
      val a = sized.select(col("doc_id").as("id_a"), col("shingle"), col("n_sh").as("n_a"))
      val b = sized.select(col("doc_id").as("id_b"), col("shingle"), col("n_sh").as("n_b"))
      finish(a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("n_common")))
    }

    if (args.contains("plans")) {
      // inner-pipeline plans (the operator's own localCheckpoint hides
      // these from graft.Plans): the evidence files for plans/r22
      Seq("A-window" -> (spellA _), "B-postagg" -> (spellB _)).foreach {
        case (tag, f) =>
          println(s"===== spelling $tag =====")
          val sh = graft.ext.Dedup.shingles(docs, "doc_id", "text", 3)
          f(sh).explain("formatted")
      }
      spark.stop()
      return
    }
    (1 to 3).foreach { i =>
      Seq("A-window" -> (spellA _), "B-postagg" -> (spellB _),
        "C-prejoin" -> (spellC _)).foreach { case (tag, f) =>
        time(s"$tag run$i") {
          val sh = graft.ext.Dedup.shingles(docs, "doc_id", "text", 3).cache()
          try noop(f(sh)) finally sh.unpersist(false)
        }
      }
    }
    // row parity across spellings (order-insensitive): checksum agreement
    val sh = graft.ext.Dedup.shingles(docs, "doc_id", "text", 3).cache()
    try {
      def sig(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)),
          sum(xxhash64(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
            col("n_b"), col("jaccard").cast("string"))
            .cast("decimal(38,0)"))).head()
        (r.getLong(0), r.getDecimal(1).longValue())
      }
      println(s"[prof] parity A=${sig(spellA(sh))} B=${sig(spellB(sh))} C=${sig(spellC(sh))}")
    } finally sh.unpersist(false)
    spark.stop()
  }
}
