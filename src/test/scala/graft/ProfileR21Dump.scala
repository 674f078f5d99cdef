package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** r21: dump each named query's ORDERED output (row sequence, as strings)
  * to <outdir>/<name>.txt — order-sensitive witness for the sort-path
  * rewrites (tools/parity.py sorts rows, so it cannot see order drift).
  * Usage: Test/runMain graft.ProfileR21Dump /tmp/dump sf_dir q10...
  */
object ProfileR21Dump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val dir = args(1)
    val names = args.drop(2)
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val rows = SparkEntry.queries(name)(spark, dir).collect().map(_.toString)
      Files.write(Paths.get(outDir, s"$name.txt"),
        String.join("\n", rows: _*).getBytes("UTF-8"))
      println(s"[dump] $name ${rows.length} rows")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
