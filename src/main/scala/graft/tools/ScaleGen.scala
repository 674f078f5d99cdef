package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1-equivalent synthetic data for the 10× scale
  * rehearsal (VERDICT r8 #1): the driver's sf0.1 tables are ~5k
  * documents / 2k embeddings / 100k events / 15k customers, and every
  * scale claim in the tree is extrapolated from there. This main
  * regenerates the four tables the heavy operator families read —
  * same schemas, same column domains, same statistical shape (word-salad
  * text over the same ~30-word vocabulary, near-uniform 64-dim float
  * embeddings, 30-day event stream, `Customer#%09d` names) — at
  * `factor`× the rows, so `ScaleRehearsal` can run the operators
  * unmodified on a corpus 10× past anything the bench has seen.
  *
  * Everything is generated DISTRIBUTED and SEEDED: `spark.range` +
  * `xxhash64`-derived columns, no driver loops, no RNG state — the same
  * (outDir, factor) always produces byte-identical tables, so rehearsal
  * timings are comparable across rounds.
  *
  * Dedup structure is planted, not hoped for: id % 50 == 1 rows are
  * near-dup copies of id−1 (same word stream + one appended token —
  * high shingle Jaccard), id % 97 == 3 rows are EXACT copies of id−1,
  * so x38's exact tier, LSH band tier, and component closure all engage
  * at every factor, with expected survivor counts ≈ n·(1 − 1/50 − 1/97).
  *
  * The `zipf` variant (VERDICT r9 #1) is the SKEWED twin of the same
  * corpus — same schemas, same row counts, heavy-tailed distributions:
  * event_type "click" ~30% of events, user 0 ~10% of events with a
  * Zipf(1) user tail, customer 0 ~10% of orders with a Zipf(1) customer
  * tail, and a Zipf token distribution over the document vocabulary
  * (head word ~25% of tokens). Everything measured on the uniform twin
  * is a no-skew cost curve; at 100 TB the first thing that kills a plan
  * is a hot key — the skew rehearsal compares floors at the SAME factor
  * across the two twins.
  *
  * Usage: `runMain graft.tools.ScaleGen <outDir> [factor=10] [tables-csv]
  * [variant: uniform|zipf] [dimDir]`
  */
object ScaleGen {

  private val Vocab = Seq(
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "vector", "query",
    "agg", "table", "key", "filter", "customer", "stream", "window",
    "join", "the", "a", "index", "shuffle", "merge", "cache")
  private val Langs = Seq("en", "zh", "fr", "es", "de")
  private val EventTypes = Seq("click", "view", "purchase", "signup", "error")
  private val Segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** Seeded uniform in [0, m): integer, engine-exact. */
  private def h(seed: String, cols: Column*): Column =
    xxhash64(lit(seed) +: cols: _*)
  private def hmod(seed: String, m: Long, cols: Column*): Column =
    pmod(h(seed, cols: _*), lit(m))

  private def pick(choices: Seq[String], seed: String, ids: Column*): Column =
    element_at(array(choices.map(lit): _*),
      (hmod(seed, choices.size.toLong, ids: _*) + lit(1)).cast("int"))

  /** Zipf(α≈1) key in [0, n): inverse-CDF of p(x) ∝ 1/x over [1, n]
    * (x = exp(U·ln n)), seeded-hash-driven so the skew twin is as
    * deterministic as the uniform one. Rank 1 carries ln(2)/ln(n) of the
    * mass (~6% at n = 150k) with a true heavy tail behind it — the
    * "every key is a little hot" half of production skew; pin an
    * explicit head on top for the "one key is VERY hot" half.
    */
  private def zipfKey(seed: String, n: Long, ids: Column*): Column = {
    val u = hmod(seed, 1000000L, ids: _*).cast("double") / lit(1000000.0)
    least(floor(exp(u * lit(math.log(n.toDouble)))) - lit(1), lit(n - 1))
      .cast("long")
  }

  /** Quantized-CDF lookup (1024 cells) for a Zipfian pick over `choices`
    * with p(rank r) ∝ 1/(r+1): head word ~25% of tokens over the 30-word
    * vocab — the head-heavy token distribution that skews df-join keys.
    */
  private def zipfLookup(choices: Seq[String]): Array[String] = {
    val w = choices.indices.map(r => 1.0 / (r + 1))
    val total = w.sum
    val cdf = w.scanLeft(0.0)(_ + _).tail.map(_ / total)
    Array.tabulate(1024) { q =>
      val u = (q + 0.5) / 1024.0
      choices(cdf.indexWhere(u < _) match { case -1 => choices.size - 1; case i => i })
    }
  }

  def documents(spark: SparkSession, factor: Int, zipf: Boolean = false): DataFrame = {
    val n = 5000L * factor
    val vocabCol =
      if (zipf) array(zipfLookup(Vocab).toSeq.map(lit): _*)
      else array(Vocab.map(lit): _*)
    val vocabCells = if (zipf) 1024L else Vocab.size.toLong
    val id = col("id")
    // Planted dup structure: copies draw their word stream from id-1's seed.
    val isExact = id % 97 === 3 && id > 0
    val isNear = id % 50 === 1 && id > 0 && !isExact
    val seedId = when(isExact || isNear, id - 1).otherwise(id)
    val nWords = (hmod("nw", 80L, seedId) + lit(10)).cast("int")
    val words = transform(sequence(lit(0), nWords - lit(1)),
      i => element_at(vocabCol,
        (hmod("w", vocabCells, seedId, i) + lit(1)).cast("int")))
    val baseText = concat_ws(" ", words)
    spark.range(n)
      .repartition(32)
      .select(
        id.as("doc_id"),
        when(isNear, concat(baseText, lit(" drift"))).otherwise(baseText)
          .as("text"),
        pick(Langs, "lang", id).as("lang"),
        concat(lit("src"), hmod("src", 20L, id)).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def embeddings(spark: SparkSession, factor: Int): DataFrame = {
    val n = 2000L * factor
    val dim = 64
    spark.range(n)
      .repartition(32)
      .select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => ((hmod("e", 2000001L, col("id"), j) - lit(1000000L))
            / lit(1000000.0) * lit(0.2)).cast("float"))
          .as("embedding"),
        hmod("lab", 10L, col("id")).cast("int").as("label"))
  }

  /** Clustered companion corpus (32 Gaussians on the unit sphere, the
    * shape IVF exploits — [[graft.ClusteredEmbeddings]]'s structure at
    * rehearsal scale): the near-uniform `embeddings` table answers
    * "does cost scale" but its recall ≈ probed fraction by
    * construction; recall-at-scale questions need structure. Generated
    * DISTRIBUTED with a per-row deterministic RNG (seeded by vec_id),
    * centers derived once driver-side from the fixed seed — same
    * (factor) always yields byte-identical vectors.
    */
  // generator params hoisted so clusteredParamsTag can't drift from the
  // generation they describe (ADVICE r13 #1: tmpdir caches keyed only by
  // factor silently reused a stale corpus after a generator change)
  private[tools] val ClusteredSeed = 7L
  private[tools] val ClusteredDims = 64
  private[tools] val ClusteredK = 32
  private[tools] val ClusteredSigma = 0.15

  /** Cache-key tag derived from the clustered generator's parameters:
    * any change to seed/dims/k/sigma changes the tag, so a cache dir
    * named with it can never serve a corpus from an older generation.
    */
  val clusteredParamsTag: String =
    s"s${ClusteredSeed}d${ClusteredDims}k${ClusteredK}g${math.round(ClusteredSigma * 100)}"

  def embeddingsClustered(spark: SparkSession, factor: Int): DataFrame = {
    import spark.implicits._
    val n = 2000L * factor
    val d = ClusteredDims
    val k = ClusteredK
    val sigma = ClusteredSigma
    def normalize(v: Array[Float]): Array[Float] = {
      var s = 0.0
      v.foreach(x => s += x.toDouble * x)
      val inv = (1.0 / math.sqrt(s)).toFloat
      v.map(_ * inv)
    }
    val rnd = new scala.util.Random(ClusteredSeed)
    val centers = Array.fill(k)(normalize(Array.fill(d)(rnd.nextGaussian().toFloat)))
    val bc = spark.sparkContext.broadcast(centers)
    spark.range(n)
      .repartition(32)
      .as[Long]
      .map { id =>
        val r = new scala.util.Random(id * 2654435761L + ClusteredSeed)
        val c = bc.value((id % k).toInt)
        val v = normalize(Array.tabulate(d)(j =>
          c(j) + (sigma * r.nextGaussian()).toFloat))
        (id, v, (id % k).toInt)
      }
      .toDF("vec_id", "embedding", "label")
  }

  def events(spark: SparkSession, factor: Int, zipf: Boolean = false): DataFrame = {
    val n = 100000L * factor
    // Same 30-day span as the driver tables at every factor: "10× data" is
    // 10× rows per window (denser traffic), not a longer history — the
    // shape that stresses per-window state, not the window count.
    val baseUs = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val spanUs = 30L * 24 * 3600 * 1000000L
    val id = col("id")
    spark.range(n)
      .repartition(32)
      .select(
        id.as("event_id"),
        timestamp_micros(lit(baseUs) + (id * lit(spanUs / n))
          + hmod("jit", spanUs / n, id)).as("ts"),
        // Zipf twin (VERDICT r9 #1): user 0 pinned to ~10% of all events
        // (sessionize's per-key window skew), the tail Zipf(1); hot
        // event_type "click" carrying ~30% (the x61/x110 grain skew).
        (if (zipf)
           when(hmod("hotu", 100L, id) < 10, lit(0L))
             .otherwise(zipfKey("uz", 1500L * factor, id))
         else hmod("u", 1500L * factor, id)).as("user_id"),
        (if (zipf)
           when(hmod("hote", 100L, id) < 30, lit("click"))
             .otherwise(pick(EventTypes.filterNot(_ == "click"), "etz", id))
         else pick(EventTypes, "et", id)).as("event_type"),
        (hmod("v", 20000L, id).cast("double") / lit(100.0)).as("value"),
        format_string("{\"k\": %d}", hmod("k", 100L, id)).as("props"))
  }

  def orders(spark: SparkSession, factor: Int, zipf: Boolean = false): DataFrame = {
    val n = 150000L * factor
    val id = col("id")
    spark.range(n)
      .repartition(32)
      .select(
        id.as("o_orderkey"),
        // Zipf twin: customer 0 pinned to ~10% of all orders (the hot
        // policyholder shape over the flagship's customer-grained keys),
        // Zipf(1) tail behind it.
        (if (zipf)
           when(hmod("hotc", 100L, id) < 10, lit(0L))
             .otherwise(zipfKey("cz", 15000L * factor, id))
         else hmod("oc", 15000L * factor, id)).as("o_custkey"),
        pick(Seq("O", "F", "P"), "os", id).as("o_orderstatus"),
        round(lit(1000.0) + hmod("op", 49900000L, id).cast("double") / lit(100.0), 2)
          .as("o_totalprice"),
        date_add(to_date(lit("1995-01-01")), hmod("od", 2400L, id).cast("int"))
          .cast("timestamp").as("o_orderdate"),
        pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
          "opr", id).as("o_orderpriority"))
  }

  /** ~4 lines per order (1-7, the driver's shape); (l_orderkey,
    * l_linenumber) unique — the flagship's sub-entity numbering needs
    * (l_linenumber, l_partkey, l_suppkey) to totally order within an
    * order, which distinct line numbers guarantee alone.
    */
  def lineitem(spark: SparkSession, factor: Int): DataFrame = {
    val nOrders = 150000L * factor
    val ord = col("o")
    val ln = col("ln")
    spark.range(nOrders)
      .repartition(32)
      .select(col("id").as("o"),
        explode(sequence(lit(1), (hmod("nl", 7L, col("id")) + lit(1)).cast("int")))
          .as("ln"))
      .select(
        ord.as("l_orderkey"),
        hmod("pk", 20000L * factor, ord, ln).as("l_partkey"),
        hmod("sk", 1000L * factor, ord, ln).as("l_suppkey"),
        ln.cast("int").as("l_linenumber"),
        (hmod("q", 50L, ord, ln) + lit(1)).cast("double").as("l_quantity"),
        round(lit(900.0) + hmod("ep", 10000000L, ord, ln).cast("double") / lit(100.0), 2)
          .as("l_extendedprice"),
        (hmod("d", 11L, ord, ln).cast("double") / lit(100.0)).as("l_discount"),
        (hmod("t", 9L, ord, ln).cast("double") / lit(100.0)).as("l_tax"),
        pick(Seq("N", "A", "R"), "rf", ord, ln).as("l_returnflag"),
        pick(Seq("O", "F"), "ls", ord, ln).as("l_linestatus"),
        date_add(to_date(lit("1995-01-02")), hmod("sd", 2490L, ord, ln).cast("int"))
          .cast("timestamp").as("l_shipdate"))
  }

  def customer(spark: SparkSession, factor: Int): DataFrame = {
    val n = 15000L * factor
    val id = col("id")
    spark.range(n)
      .repartition(32)
      .select(
        id.as("c_custkey"),
        format_string("Customer#%09d", id).as("c_name"),
        hmod("nat", 25L, id).cast("int").as("c_nationkey"),
        round(hmod("bal", 1000000L, id).cast("double") / lit(100.0), 2)
          .as("c_acctbal"),
        pick(Segments, "seg", id).as("c_mktsegment"))
  }

  def generate(spark: SparkSession, outDir: String, factor: Int,
      only: Set[String] = Set.empty, zipf: Boolean = false,
      dimDir: String = "/root/testdata/sf0.1"): Unit = {
    val tables = Seq(
      "documents" -> documents(spark, factor, zipf),
      "embeddings" -> embeddings(spark, factor),
      "embeddings_clustered" -> embeddingsClustered(spark, factor),
      "events" -> events(spark, factor, zipf),
      "customer" -> customer(spark, factor),
      "orders" -> orders(spark, factor, zipf),
      "lineitem" -> lineitem(spark, factor),
      // fixed dimensions: identical content at every factor (TPC-H keeps
      // nation/region constant too) — copied from `dimDir` (defaults to
      // the driver's sf0.1; parameterized so the tool is relocatable)
      "nation" -> spark.read.parquet(s"$dimDir/nation.parquet"),
      "region" -> spark.read.parquet(s"$dimDir/region.parquet"))
    // `only` trims the set for deep decades: the 1000× relational star
    // (~25 GB lineitem) serves no rehearsed op the 100× didn't already
    tables.filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, df) =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scalegen] $name%-10s factor=$factor wrote in $secs%.1f s")
    }
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      sys.error("usage: ScaleGen <outDir> [factor=10] [tables-csv] " +
        "[variant: uniform|zipf] [dimDir=/root/testdata/sf0.1]"))
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set.empty[String])
    val zipf = args.lift(3) match {
      case Some("zipf")              => true
      case Some("uniform") | None    => false
      case Some(other) => sys.error(s"unknown variant '$other' (uniform|zipf)")
    }
    val dimDir = args.lift(4).getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local()
    // Match the driver testdata's TIMESTAMP(MICROS) encoding — Spark's
    // legacy INT96 default has no logical annotation, which would push
    // every EventTime/SchemaContract footer check onto the distributed
    // scan fallback and make the rehearsal time the guard, not the op.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    generate(spark, outDir, factor, only, zipf, dimDir)
    spark.stop()
  }
}
