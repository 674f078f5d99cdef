package graft

import java.security.MessageDigest

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{LmScore, Mixture, Shuffling}

/** Specs for the training-corpus preparation operators: domain-mixture
  * resampling, deterministic epoch shuffle, bigram-LM rarity scoring,
  * and the inverted index.
  */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  // 3 sources with very different sizes: A 200 docs x 10 tokens = 2000,
  // B 50 x 10 = 500, C 20 x 10 = 200 tokens.
  private def corpus = {
    val rows =
      (1 to 200).map(i => (i.toLong, "A", Seq.fill(10)(s"a$i").mkString(" "))) ++
      (201 to 250).map(i => (i.toLong, "B", Seq.fill(10)(s"b$i").mkString(" "))) ++
      (251 to 270).map(i => (i.toLong, "C", Seq.fill(10)(s"c$i").mkString(" ")))
    rows.toDF("doc_id", "source", "text")
      .withColumn("n_toks", lit(10L))
  }

  test("mixture resample hits per-source token targets within hash tolerance") {
    // equal weights over unequal sources, budget 900 => target 300 each;
    // C has only 200 tokens => clamps to keep-all.
    val kept = Mixture.resample(corpus, "doc_id", "source", "n_toks",
        weights = Map("A" -> 1L, "B" -> 1L, "C" -> 1L), budgetTokens = 900L)
      .groupBy($"source").agg(sum($"n_toks").as("kept"))
      .as[(String, Long)].collect().toMap
    assert(kept("C") === 200L, "over-allocated source must clamp to keep-all")
    // A: rate 300/2000=0.15 of 200 docs; B: rate 300/500=0.6 of 50 docs.
    // md5 buckets are uniform; allow generous small-sample tolerance.
    assert(kept("A") >= 150 && kept("A") <= 450, s"A kept ${kept("A")}")
    assert(kept("B") >= 150 && kept("B") <= 450, s"B kept ${kept("B")}")
  }

  test("mixture resample is deterministic and weight-0 sources drop entirely") {
    def run() = Mixture.resample(corpus, "doc_id", "source", "n_toks",
        weights = Map("A" -> 1L, "B" -> 1L), defaultWeight = 0L,
        budgetTokens = 500L)
      .select($"doc_id").as[Long].collect().toSet
    val first = run()
    assert(run() === first, "same weights+budget+salt must keep the same docs")
    assert(first.nonEmpty)
    assert(!first.exists(_ > 250), "weight-0 source C must contribute nothing")
  }

  test("mixture predicates survive trillion-token budgets (decimal, no Long overflow)") {
    // 65536 * budget * weight blows past Long.MaxValue here; the
    // DECIMAL(38,0) spelling must neither throw (ANSI) nor wrap
    // (non-ANSI, which would silently keep nothing)
    val huge = Long.MaxValue / 2
    val kept = Mixture.resample(corpus, "doc_id", "source", "n_toks",
      weights = Map("A" -> 60L, "B" -> 40L), defaultWeight = 1L,
      budgetTokens = huge).count()
    assert(kept === 270L, "over-covering budget must clamp to keep-all")
    // weights proportional to source size (20:5:2 = 2000:500:200) at 3x
    // the corpus budget => every source's target is exactly 3 epochs,
    // remainder 0 => no partial epoch anywhere
    val epochs = Mixture.resampleEpochs(corpus, "doc_id", "source", "n_toks",
      weights = Map("A" -> 20L, "B" -> 5L, "C" -> 2L), budgetTokens = 8100L)
      .groupBy($"source").agg(countDistinct($"epoch").as("e"))
      .as[(String, Long)].collect().toMap
    assert(epochs === Map("A" -> 3L, "B" -> 3L, "C" -> 3L),
      s"size-proportional weights at 3x budget must give exactly 3 epochs each, got $epochs")
  }

  test("mixture resample keeps everything when the budget covers the corpus") {
    val kept = Mixture.resample(corpus, "doc_id", "source", "n_toks",
        weights = Map.empty, defaultWeight = 1L, budgetTokens = 1000000L)
      .count()
    assert(kept === 270L)
  }

  test("mixture epochs repeat small high-weight sources, degenerate to resample when downsampling") {
    // W = 3; C: 200 tokens, weight 1, budget 1800 => target 600 = 3
    // full epochs exactly (rem 0); A: target 600 of 2000 => 0 full
    // epochs + partial keep, identical to resample's keep-set.
    val out = Mixture.resampleEpochs(corpus, "doc_id", "source", "n_toks",
        weights = Map("A" -> 1L, "B" -> 1L, "C" -> 1L), budgetTokens = 1800L)
      .select($"doc_id", $"source", $"epoch").as[(Long, String, Long)].collect()
    val cEpochs = out.filter(_._2 == "C").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(cEpochs.values.forall(_ === Seq(0L, 1L, 2L)),
      "every C doc must appear in exactly 3 full epochs")
    val aKept = out.filter(_._2 == "A").map(_._1).toSet
    val aResample = Mixture.resample(corpus, "doc_id", "source", "n_toks",
        weights = Map("A" -> 1L, "B" -> 1L, "C" -> 1L), budgetTokens = 1800L)
      .where($"source" === "A").select($"doc_id").as[Long].collect().toSet
    assert(aKept === aResample,
      "epoch 0 partial selection must equal resample's downsampling keep-set")
    assert(out.filter(_._2 == "A").forall(_._3 === 0L))
    // delivered tokens ~ budget: C exact 600, A+B hash-approximate
    val delivered = out.length * 10
    assert(delivered >= 1200 && delivered <= 2400, s"delivered $delivered")
  }

  test("permute is a 1..n permutation matching the naive global spelling") {
    val out = Shuffling.permute(corpus, "doc_id", seed = "epoch0", nShards = 8)
      .select($"doc_id", $"position", $"shard")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._2).sorted.toSeq === (1L to 270L))
    assert(out.forall { case (_, p, s) => s === (p - 1) % 8 })
    // ground truth: the single-partition window Spark would naively plan
    val naive = corpus
      .withColumn("position", row_number().over(
        Window.orderBy(md5(concat(lit("epoch0:"), $"doc_id".cast("string"))),
          $"doc_id")).cast("long"))
      .select($"doc_id", $"position").as[(Long, Long)].collect().toMap
    assert(out.map { case (d, p, _) => d -> p }.toMap === naive)
  }

  test("permute position is invariant to hexChars (bucket width = parallelism only)") {
    // The global order key is the full (hash, id) pair; the hex-prefix
    // bucket only chunks that total order for parallelism — so ANY
    // bucket width must yield bit-identical positions.
    val byWidth = Seq(1, 2, 4).map { w =>
      Shuffling.permute(corpus, "doc_id", seed = "epoch0", hexChars = w)
        .select($"doc_id", $"position").as[(Long, Long)].collect().toMap
    }
    assert(byWidth.tail.forall(_ === byWidth.head),
      "position must not depend on the level-1 bucket width")
  }

  test("permute order changes with the seed but stays a permutation") {
    def order(seed: String) =
      Shuffling.permute(corpus, "doc_id", seed = seed)
        .orderBy($"position").select($"doc_id").as[Long].collect().toSeq
    val e0 = order("epoch0")
    val e1 = order("epoch1")
    assert(e0.sorted === e1.sorted)
    assert(e0 !== e1, "different seeds must give different epoch orders")
  }

  test("bigram rarity matches the hand-computed tiny corpus") {
    // corpus: c12(a,b)=4 c12(b,a)=2 c12(x,y)=1; c1: a=4 b=2 x=1.
    // V=5 (a,b,x,y,solo — the one-token doc still counts toward vocab).
    // R=2: rare iff 2*(c12+1) < c1+V -> (b,a): 6<7 and (x,y): 4<6.
    val df = Seq(
      (1L, "a b a b"), (2L, "a b a b"), (3L, "x y"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = LmScore.bigramRarity(df, "doc_id", "text", rarityFactor = 2L)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_bigrams", $"n_rare", $"rarity")
      .as[(Long, Long, Long, Double)].collect()
    assert(out === Seq(
      (1L, 3L, 1L, 1.0 / 3), (2L, 3L, 1L, 1.0 / 3), (3L, 1L, 1L, 1.0)))
    // doc 4 has one token -> no transitions -> dropped, not scored 0
  }

  test("random projection matches the md5 sign matrix by hand and is linear") {
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sign(i: Int, j: Int): Long = if (md5hex(s"$i:$j").head <= '7') 1L else -1L
    val df = Seq(
      (1L, Array(1.0f, -1.0f)),
      (2L, Array(-1.0f, 1.0f)),  // negation of 1
      (3L, Array(1.0f, -1.0f))) // identical to 1
      .toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.randomProjection(df, "vec_id", "embedding", outDims = 4)
      .orderBy($"vec_id")
      .select($"vec_id", $"y0", $"y1", $"y2", $"y3")
      .as[(Long, Long, Long, Long, Long)].collect()
    // q = [floor(1024.5), floor(-1024+0.5)] = [1024, -1024]
    val expected = (0 until 4).map(j => sign(0, j) * 1024L + sign(1, j) * -1024L)
    assert(Seq(out(0)._2, out(0)._3, out(0)._4, out(0)._5) === expected)
    assert(Seq(out(1)._2, out(1)._3, out(1)._4, out(1)._5) === expected.map(-_),
      "projection must be linear: negated input -> negated output")
    assert(out(2).productIterator.drop(1).toSeq === out(0).productIterator.drop(1).toSeq,
      "identical vectors must project identically")
  }

  test("semDedup prunes the planted ε-ball, keeps negations/zeros, earliest witness wins") {
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sign(i: Int, j: Int): Long = if (md5hex(s"$i:$j").head <= '7') 1L else -1L
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),    // keeper (lowest id in its ball)
      (2L, Array(1.0f, 0.0f)),    // identical -> removed, witness 1
      (3L, Array(0.99f, 0.1f)),   // cos≈0.995 with 1 -> removed, witness 1 (not 2)
      (4L, Array(-1.0f, 0.0f)),   // negation: complementary bucket -> kept
      (5L, Array(0.0f, 0.0f)))    // zero vector: undefined cosine -> kept
      .toDF("vec_id", "embedding")
    val out = graft.ext.Similarity
      .semDedup(df, "vec_id", "embedding", bits = 4, tauNum = 2, tauDen = 5)
      .orderBy($"vec_id")
      .select($"vec_id", $"bucket", $"witness", $"removed")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.filter(_._4).map(_._1).toSeq === Seq(2L, 3L),
      "exactly the planted ε-ball members with an earlier neighbor are removed")
    assert(out.filter(_._4).flatMap(_._3).toSet === Set(1L),
      "the EARLIEST in-bucket neighbor is the witness (1, never 2)")
    // Bucket arithmetic by hand: q(id1)=(1024,0), y_j = s(0,j)*1024, so
    // bit_j = [s(0,j)==1]; id4 is the negation -> complementary bucket.
    val expectBucket1 =
      (0 until 4).map(j => if (sign(0, j) == 1L) 1L << j else 0L).sum
    assert(out(0)._2 === expectBucket1)
    assert(out(3)._2 === (~expectBucket1 & 15L),
      "negated vector lands in the complementary SRP bucket")
    // id3 shares id1's bucket: |1014| > |102| so s(0,j) decides every bit.
    assert(out(2)._2 === expectBucket1)
    assert(out(4)._3.isEmpty && !out(4)._4, "zero-norm vectors are never pruned")
    intercept[IllegalArgumentException] {
      graft.ext.Similarity.semDedup(df, "vec_id", "embedding", tauNum = 1, tauDen = 32)
    }
  }

  test("semDedup ≡ brute-force reference on random vectors (buckets, pruning, witnesses)") {
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sign(i: Int, j: Int): Long = if (md5hex(s"$i:$j").head <= '7') 1L else -1L
    val (bits, dim, tauNum, tauDen) = (3, 8, 1, 2)
    for (seed <- Seq(11, 22)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (1L to 40L).map(id =>
        (id, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      def q(v: Array[Float]): Array[Long] =
        v.map(x => math.floor(x.toDouble * 1024 + 0.5).toLong)
      def bucket(v: Array[Float]): Long = {
        val qv = q(v)
        (0 until bits).map { j =>
          val y = qv.indices.map(i => sign(i, j) * qv(i)).sum
          if (y >= 0) 1L << j else 0L
        }.sum
      }
      def cosOk(a: Array[Float], b: Array[Float]): Boolean = {
        val (qa, qb) = (q(a), q(b))
        val dot = qa.indices.map(i => qa(i) * qb(i)).sum
        val na2 = qa.map(x => x * x).sum; val nb2 = qb.map(x => x * x).sum
        na2 > 0 && nb2 > 0 && dot > 0 &&
          dot * dot * tauDen * tauDen >= tauNum.toLong * tauNum * na2 * nb2
      }
      val expected = vecs.map { case (id, v) =>
        val witness = vecs
          .filter { case (i2, v2) =>
            i2 < id && bucket(v2) == bucket(v) && cosOk(v2, v) }
          .map(_._1).sorted.headOption
        (id, bucket(v), witness, witness.isDefined)
      }
      val got = graft.ext.Similarity
        .semDedup(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
          bits = bits, tauNum = tauNum, tauDen = tauDen)
        .orderBy($"vec_id")
        .as[(Long, Long, Option[Long], Boolean)].collect().toSeq
      assert(got === expected, s"seed=$seed")
      assert(got.exists(_._4), s"seed=$seed: pruning must be witnessed")
    }
  }

  test("content-defined chunks partition every token and re-align after a prefix edit") {
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val body = Seq.fill(400)(words(rnd.nextInt(words.size))).mkString(" ")
    val df = Seq(
      (1L, body),
      (2L, "inserted preamble sentence goes here " + body))
      .toDF("doc_id", "text")
    val out = graft.ext.Chunking
      .contentDefinedChunks(df, "doc_id", "text", modulus = 16)
      .select($"doc_id", $"chunk_idx", $"tok_start", $"n_tokens", $"chunk_md5")
      .as[(Long, Long, Long, Long, String)].collect()
    // chunks tile each document exactly: contiguous starts, counts sum to n
    for (doc <- Seq(1L, 2L)) {
      val cs = out.filter(_._1 == doc).sortBy(_._2)
      val n = if (doc == 1L) 400 else 405
      assert(cs.map(_._4).sum === n.toLong)
      assert(cs.head._3 === 0L)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4); case _ => ()
      }
    }
    // the CDC property: after the insertion-perturbed prefix, boundaries
    // re-align, so almost all of doc 1's chunk digests reappear in doc 2
    val d1 = out.filter(_._1 == 1L).map(_._5).toSet
    val d2 = out.filter(_._1 == 2L).map(_._5).toSet
    assert(d1.size >= 10, s"fixture too short: only ${d1.size} chunks")
    val missing = d1 -- d2
    assert(missing.size <= 2,
      s"expected re-alignment; ${missing.size} of ${d1.size} chunks lost")
  }

  test("k-per-stratum sample is deterministic, sized min(k, group), rank-contiguous") {
    val out = graft.ext.Sampling.kPerStratum(
        corpus.select($"doc_id", $"source"), "doc_id", "source", k = 30)
      .select($"source", $"doc_id", $"sample_rank")
      .as[(String, Long, Long)].collect()
    val bySrc = out.groupBy(_._1)
    assert(bySrc("A").length === 30)
    assert(bySrc("B").length === 30)
    assert(bySrc("C").length === 20, "undersized group keeps every row")
    assert(bySrc("C").map(_._3).sorted.toSeq === (1L to 20L))
    val again = graft.ext.Sampling.kPerStratum(
        corpus.select($"doc_id", $"source"), "doc_id", "source", k = 30)
      .select($"doc_id").as[Long].collect().toSet
    assert(again === out.map(_._2).toSet)
  }

  test("prefix filtering loses NOTHING: fuzzyJoin ≡ brute-force jaccard on random corpora") {
    // The PPJoin prefix filter + length filter are candidate PRUNING only;
    // this pins the theorem (and the IEEE ceil-slack) against an
    // independent in-memory reference across random key sets and
    // thresholds, including threshold values where t·n lands on exact
    // integers (the boundary the 1e-9 slack exists for).
    def grams(s: String, n: Int): Set[String] = {
      val t = s.toLowerCase.trim
      if (t.length >= n) t.sliding(n).toSet else Set(t)
    }
    val alphabet = "abcde "
    for ((seed, threshold) <- Seq((1, 0.5), (2, 0.75), (3, 1.0 / 3), (4, 0.6))) {
      val rnd = new scala.util.Random(seed)
      def randKey() = Seq.fill(3 + rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val ls = (1L to 25L).map(i => (i, randKey()))
      val rs = (101L to 125L).map(i => (i, randKey()))
      val expected = (for {
        (il, kl) <- ls; (ir, kr) <- rs
        gl = grams(kl, 3); gr = grams(kr, 3)
        common = (gl & gr).size
        j = common.toDouble / (gl.size + gr.size - common)
        if common > 0 && j >= threshold
      } yield (il, ir, j)).toSet
      val got = graft.ext.Fuzzy.fuzzyJoin(
        ls.toDF("id", "k"), "id", "k", rs.toDF("id", "k"), "id", "k",
        n = 3, threshold = threshold)
        .select($"id_l", $"id_r", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(got === expected, s"seed=$seed threshold=$threshold")
    }
  }

  test("fuzzy join matches typo'd keys, prunes stop-grams as the gram space, guards blowups") {
    val left = Seq((1L, "acme corp"), (2L, "globex inc"), (3L, "zzz"))
      .toDF("id", "name")
    val right = Seq((10L, "acme corp."), (20L, "g1obex inc"), (30L, "unrelated"))
      .toDF("id", "name")
    val out = graft.ext.Fuzzy.fuzzyJoin(left, "id", "name", right, "id", "name",
        n = 3, threshold = 0.5)
      .select($"id_l", $"id_r", $"n_common", $"n_l", $"n_r", $"jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // "acme corp" (7 grams) vs "acme corp." (8 grams): 7 shared
    assert(out((1L, 10L))._6 === 7.0 / 8)
    // "globex inc" vs "g1obex inc": 8 vs 8 grams, 6 shared (the two
    // grams covering the swapped char differ) -> 6/10
    assert(out((2L, 20L))._6 === 6.0 / 10)
    assert(!out.contains((3L, 30L)), "dissimilar keys must not pair")
    // pruning defines the gram space: cap 1 kills the shared grams of an
    // identical-key pair -> no match survives
    val pruned = graft.ext.Fuzzy.fuzzyJoin(
      Seq((1L, "same same"), (2L, "same same")).toDF("id", "name"), "id", "name",
      Seq((9L, "same same")).toDF("id", "name"), "id", "name",
      n = 3, threshold = 0.1, maxGramFreq = 1L).count()
    assert(pruned === 0L)
    // candidate budget guard refuses a blowup instead of launching it
    val boom = intercept[IllegalArgumentException] {
      graft.ext.Fuzzy.fuzzyJoin(left, "id", "name", right, "id", "name",
        n = 3, threshold = 0.5, maxCandidatePairs = 1L).count()
    }
    assert(boom.getMessage.contains("candidate pairs"))
  }

  test("source overlap: identical sources have jaccard 1, containment shows swallowed source") {
    val df = Seq(
      (1L, "web", "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "mirror", "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "web", "an entirely different second web document goes right here"),
      (4L, "books", "unrelated text about ships and harbors and long voyages"))
      .toDF("doc_id", "source", "text")
    val out = graft.ext.Dedup.sourceOverlap(df, "source", "text", n = 3)
      .select($"src_a", $"src_b", $"n_common", $"jaccard", $"overlap_coef")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // mirror ⊂ web: full containment, jaccard < 1 (web has an extra doc)
    val m = out(("mirror", "web"))
    assert(m._5 === 1.0, "mirror is fully contained in web")
    assert(m._4 < 1.0 && m._4 > 0.0)
    assert(m._3 === 8L) // 10 tokens -> 8 distinct 3-gram shingles
    assert(!out.contains(("books", "mirror")) && !out.contains(("books", "web")),
      "disjoint sources must produce no pair row")
  }

  test("NFC normalize composes decomposed marks, passes NFC text through, is null-safe") {
    val df = Seq(
      (1L, "é"),          // decomposed -> U+00E9
      (2L, "é"),           // already NFC -> unchanged
      (3L, "Ångström"), // mixed marks -> Å...ö
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
        graft.functions.NfcNormalize.column($"text").as("n"))
      .orderBy($"doc_id").as[(Long, String)].collect()
    assert(out(0)._2 === "é")
    assert(out(1)._2 === "é")
    assert(out(2)._2 === "Ångström")
    assert(out(3)._2 === "plain ascii")
    assert(out(4)._2 === null)
  }

  test("inverted index postings digest and counts are exact") {
    val df = Seq(
      (1L, "spark spark scala"), (2L, "spark flink"), (3L, "scala"))
      .toDF("doc_id", "text")
    val out = TestHelpers.invertedRows(spark, df)
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out("spark") === (2L, 3L, md5hex("1,2")))
    assert(out("scala") === (2L, 2L, md5hex("1,3")))
    assert(out("flink") === (1L, 1L, md5hex("2")))
  }
}

private object TestHelpers {
  def invertedRows(
      spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long, String)] = {
    import spark.implicits._
    graft.ext.TextAnalysis.invertedIndex(df, "doc_id", "text")
      .select($"token", $"doc_freq", $"total_tf", $"postings_md5")
      .as[(String, Long, Long, String)].collect()
      .map { case (t, d, tf, m) => t -> ((d, tf, m)) }.toMap
  }
}
