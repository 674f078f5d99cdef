package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
object ProfileX32 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, dir)
    val sigs = t("signatures (expression path)"){
      val s = docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          graft.functions.MinHashSignature.column(col("text"), 3, 64).as("mh"))
        .where(col("mh").isNotNull).cache()
      s.count(); s }
    val banded = t("bands"){ val b = Dedup.lshBands(sigs,"doc_id",16,4).cache(); b.count(); b }
    val cand = t("candidates"){
      val c = banded.as("x").join(banded.as("y"),
        col("x.band")===col("y.band") && col("x.band_hash")===col("y.band_hash") && col("x.doc_id")<col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct().cache()
      println("[prof] n_candidates: " + c.count()); c }
    t("full minhashPairs (uncached plan)"){ Dedup.minhashPairs(docs,"doc_id","text",3,0.3).count() }
    t("aggregate path signatures (MinHashMins udaf)"){
      Dedup.minhashSignatures(Dedup.shingles(docs,"doc_id","text",3),"doc_id",64).count() }
    spark.stop()
  }
}
