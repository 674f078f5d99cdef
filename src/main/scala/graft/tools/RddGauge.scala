package graft.tools

/** Diagnostic for Bench's `max_rdds` residue gauge: run every catalog
  * entry on a small SF and report the persistent-RDD count observed
  * right after each returns (before cleanup), worst first — makes a
  * max_rdds movement in the bench artifact attributable to a specific
  * operator instead of a guess. Not part of the shipped surface.
  */
object RddGauge {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local(8)
    val counts = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[gauge] $name FAILED ${e.getMessage}") }
      val n = spark.sparkContext.getPersistentRDDs.size
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> n
    }
    counts.sortBy(-_._2).take(12).foreach { case (n, c) =>
      println(f"[gauge] $c%2d $n")
    }
    spark.stop()
  }
}
