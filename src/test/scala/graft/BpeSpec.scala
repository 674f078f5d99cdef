package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** BPE training pinned against an in-memory reference implementation
  * (the no-oracle precedent: when DuckDB can't express the semantics,
  * a second independent implementation does the double-entry).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: same tie-break (max count, then lexicographic) and
    * greedy left-to-right merge as the operator, written independently
    * over plain Scala collections.
    */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until k) {
      val counts = vocab.toSeq
        .flatMap { case (syms, c) => syms.zip(syms.tail).map(p => p -> c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        def mergeWord(syms: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }
        vocab = vocab.toSeq.map { case (s, c) => (mergeWord(s), c) }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  private val classicCounts =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def classicDf = {
    val text = classicCounts.toSeq.sortBy(_._1)
      .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("learned merges equal the reference implementation on the classic corpus") {
    val got = Bpe.learn(classicDf, "text", numMerges = 8, minPairCount = 1L)
      .map(m => (m.left, m.right, m.pairCount))
    val want = refBpe(classicCounts, 8)
    assert(got === want)
    // sanity on the well-known head of the merge list: 'es' from
    // newest(6) + widest(3)
    assert(got.head === (("e", "s", 9L)))
    assert(got(1) === (("es", "t", 9L)))
  }

  test("batched rounds reproduce the sequential reference exactly (classic corpus)") {
    // maxMergesPerRound > 1 engages the disjoint-batch selection; the
    // result must be bit-identical to the 1-merge/round sequential
    // semantics (proof in Bpe.learn's scaladoc, pinned here).
    val want = refBpe(classicCounts, 8)
    Seq(2, 4, 8, 64).foreach { batch =>
      val got = Bpe.learn(classicDf, "text", numMerges = 8, minPairCount = 1L,
        maxMergesPerRound = batch)
        .map(m => (m.left, m.right, m.pairCount))
      assert(got === want, s"batch=$batch diverged from sequential")
    }
  }

  test("batched rounds reproduce sequential merges on an adversarial tied corpus") {
    // Equal head counts + chained symbols (the batch-cut paths): merges
    // must still match the sequential reference exactly.
    val words = Map("abab" -> 4L, "abcd" -> 4L, "cdcd" -> 4L, "xyxy" -> 3L,
      "pq" -> 4L, "pqr" -> 2L)
    val text = words.toSeq.sortBy(_._1)
      .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val want = refBpe(words, 10)
    Seq(1, 2, 3, 64).foreach { batch =>
      val got = Bpe.learn(df, "text", numMerges = 10, minPairCount = 1L,
        maxMergesPerRound = batch)
        .map(m => (m.left, m.right, m.pairCount))
      assert(got === want, s"batch=$batch diverged from sequential on ties")
    }
  }

  test("batched rounds match sequential on random corpora (property check)") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 4).foreach { trial =>
      val alphabet = "abcde"
      val words = (1 to 12).map { _ =>
        val len = 2 + rnd.nextInt(5)
        val w = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        w -> (1L + rnd.nextInt(6))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val text = words.toSeq.sortBy(_._1)
        .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val want = refBpe(words, 12)
      val got = Bpe.learn(df, "text", numMerges = 12, minPairCount = 1L,
        maxMergesPerRound = 64)
        .map(m => (m.left, m.right, m.pairCount))
      assert(got === want, s"trial $trial: batched diverged on corpus $words")
    }
  }

  test("batched rounds match sequential on collision-prone corpora (two-letter)") {
    // Produced-symbol collisions (ADVICE r6): on a 2-letter alphabet with
    // long repetitive words, different merge paths readily produce the
    // same symbol string in different rounds ((ab,c)/(a,bc)-style) —
    // exactly the case where batch accretion could diverge from
    // sequential BPE. The batch walk must cut at collisions and stay
    // bit-identical to the independent sequential reference.
    val rnd = new scala.util.Random(7L)
    (1 to 4).foreach { trial =>
      val alphabet = "ab"
      val words = (1 to 10).map { _ =>
        val len = 3 + rnd.nextInt(6)
        val w = (1 to len).map(_ => alphabet(rnd.nextInt(2))).mkString
        w -> (1L + rnd.nextInt(8))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val text = words.toSeq.sortBy(_._1)
        .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val want = refBpe(words, 16)
      val got = Bpe.learn(df, "text", numMerges = 16, minPairCount = 1L,
        maxMergesPerRound = 64)
        .map(m => (m.left, m.right, m.pairCount))
      assert(got === want,
        s"trial $trial: batched diverged on collision-prone corpus $words")
    }
  }

  test("greedy merge is left-to-right on overlapping repeats") {
    val df = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    // first merge must be (a,a); "aaa" -> [aa, a], "aaaa" -> [aa, aa]
    val merges = Bpe.learn(df, "text", numMerges = 1, minPairCount = 1L)
    assert(merges.map(m => (m.left, m.right)) === Seq(("a", "a")))
    // pair count: "aaa" has 2 adjacent (a,a), "aaaa" has 3
    assert(merges.head.pairCount === 5L)
    val counts = Bpe.subwordCounts(df, "doc_id", "text", merges)
      .select($"subword_count", $"word_count").as[(Long, Long)].collect()
    assert(counts === Array((4L, 2L))) // [aa,a] + [aa,aa]
  }

  test("subword counts shrink monotonically as merges apply and floor at word count") {
    val df = classicDf
    val m0 = Bpe.subwordCounts(df, "doc_id", "text", Seq.empty)
      .select($"subword_count").as[Long].head()
    val merges = Bpe.learn(df, "text", numMerges = 8, minPairCount = 1L)
    val m8 = Bpe.subwordCounts(df, "doc_id", "text", merges)
      .select($"subword_count").as[Long].head()
    val words = classicCounts.values.sum
    val chars = classicCounts.map { case (w, c) => w.length * c }.sum
    assert(m0 === chars, "no merges -> one symbol per character")
    assert(m8 < m0 && m8 >= words)
  }
}
