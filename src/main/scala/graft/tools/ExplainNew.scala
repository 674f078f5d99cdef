package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints exchange/broadcast/codegen counts per
  * named catalog query (run via `runMain graft.tools.ExplainNew`).
  *
  * Two modes:
  *  - static (default): counts over the pre-execution physical plan —
  *    cheap, no data read beyond footer/schema work.
  *  - `--exec`: RUNS the query (noop sink) and audits the FINAL adaptive
  *    plan, which is the only place AQE's runtime decisions are visible —
  *    skew-join splits (`skew=true` on SMJ/SHJ nodes), runtime SMJ→BHJ
  *    demotions, coalesced exchanges. Use with `--skew-scaled` on
  *    rehearsal corpora: AQE's default skew trigger (partition > 256 MB
  *    AND > 5× median) can never fire on a 100×-rehearsal-sized shuffle
  *    whose partitions are tens of MB — the scaled thresholds (8 MB)
  *    are the same RATIO to the rehearsal's partition sizes that the
  *    defaults are to a 1000-executor cluster's, so "does AQE split the
  *    hot key" is answerable without 100 TB of disk.
  *
  * `--no-broadcast` disables auto-broadcast (threshold -1): at true
  * scale a dim table outgrows broadcast range and the hot-key join
  * becomes a shuffle join — this flag audits THAT regime at rehearsal
  * size, where broadcasts would otherwise neutralize the skew before
  * AQE's splitter ever sees it.
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val rest = args.filterNot(_.startsWith("--"))
    val exec = flags.contains("--exec")
    val skewScaled = flags.contains("--skew-scaled")
    val noBroadcast = flags.contains("--no-broadcast")
    val builder = SparkSession.builder()
      .master(if (exec) "local[32]" else "local[4]")
      .config("spark.sql.shuffle.partitions", if (exec) "32" else "4")
      // the ENGINE's session settings (Sessions.local), not bare
      // defaults: a 10 MB default broadcast threshold would report
      // SMJ flips the engine's 64 MB sessions never see
      .config("spark.sql.autoBroadcastJoinThreshold",
        if (noBroadcast) "-1" else (64 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (skewScaled) {
      builder
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          (8 * 1024 * 1024).toString)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          (8 * 1024 * 1024).toString)
        // without force, AQE declines any split that would ADD a shuffle —
        // q10's hot-key join feeds a same-key aggregate, so the decline is
        // the CORRECT production answer; force exists here to witness the
        // splitter itself engaging on the hot partition
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    }
    val spark = builder.getOrCreate()
    graft.core.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.01"
    val names = if (rest.length > 1) rest.drop(1).toSeq
      else Seq("x91_mixture", "x95_mixture_epochs", "x92_shuffle",
        "x93_bigram_rarity", "x94_inverted_index", "x96_normalize")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // execute df's OWN QueryExecution: `df.write` clones a new one, so
      // the audited plan would stay isFinalPlan=false and every AQE
      // decision (skew splits, SMJ→BHJ demotions) would be invisible —
      // exactly the pre-execution plan static mode already shows
      if (exec) df.queryExecution.toRdd.count()
      // after execution the AdaptiveSparkPlan stringifies BOTH sections
      // ("== Final Plan ==" then "== Initial Plan =="); count only the
      // final one or every node is double-counted
      val raw = df.queryExecution.executedPlan.toString
      val plan = {
        val f = raw.indexOf("== Final Plan ==")
        val i = raw.indexOf("== Initial Plan ==")
        if (f >= 0 && i > f) raw.substring(f, i) else raw
      }
      val ex = "Exchange hashpartitioning".r.findAllIn(plan).length +
        "Exchange rangepartitioning".r.findAllIn(plan).length +
        "Exchange SinglePartition".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      // static plans print WholeStageCodegen nodes; finalized adaptive
      // sections print codegen as `*(n)` star prefixes — count distinct
      // span ids there
      val wsc = math.max("WholeStageCodegen".r.findAllIn(plan).length,
        "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size)
      // two spellings: joins print `skew=true`, AQE's reader nodes print
      // `AQEShuffleRead skewed`
      val skewed = "skew=true".r.findAllIn(plan).length +
        "AQEShuffleRead skewed".r.findAllIn(plan).length
      if (flags.contains("--dump"))
        plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("AQEShuffleRead")
            || l.contains("Exchange"))
          .foreach(l => println(s"[plan] ${l.trim.take(200)}"))
      val joins =
        "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
          .findAllIn(plan).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
      println(s"[explain] $n: exchanges=$ex broadcasts=$bc " +
        s"codegenSpans=$wsc skewedJoins=$skewed joins=$joins" +
        (if (exec) " (final adaptive plan)" else ""))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
