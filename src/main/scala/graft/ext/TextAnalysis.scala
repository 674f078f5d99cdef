package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting. North-star extension layer (SURVEY §7.9) — not present
  * in the reference; capabilities follow standard LLM-corpus curation
  * practice.
  *
  * Every operator is a pure Catalyst expression tree (no UDFs): columnar,
  * whole-stage-codegen'd, trivially parallel — per-row work with no
  * shuffle, so it scales linearly with input splits at 100 TB.
  *
  * Oracle-compatibility notes: only IEEE-exact arithmetic (+,*,/, min/max,
  * sqrt) — no transcendentals, whose libm results differ across engines;
  * expression trees are mirrored exactly in the DuckDB oracle SQL.
  */
object TextAnalysis {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish sub-token pattern: runs of letters, runs of digits, or single
    * non-alphanumeric marks (a simplified byte-pair-style pre-tokenizer).
    */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic and SQL-portable by construction.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "las", "y", "que", "como"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  private def inListLambda(values: Seq[String]): Column => Column =
    t => t.isin(values.map(v => v: Any): _*)

  /** Total stopword occurrences for one language (duplicates counted). */
  def stopwordHits(toks: Column, lang: String): Column = {
    val list = Stopwords.toMap.apply(lang)
    size(filter(toks, inListLambda(list)))
  }

  /** Language-ID: argmax of per-language stopword hit counts with a fixed
    * precedence order (en > de > es > fr > zh on ties) so the result is
    * total-order deterministic.
    */
  def langId(toks: Column): Column = {
    val scores = Stopwords.map { case (lang, _) => lang -> stopwordHits(toks, lang) }
    val langs = scores.map(_._1)
    // lang L wins if its score >= every later language's score and is
    // strictly > every earlier one's (first-max-wins).
    langs.zipWithIndex.foldRight(lit(langs.last)) { case ((lang, i), elseCol) =>
      val s = scores(i)._2
      val beatsLater = scores.drop(i + 1).map(s >= _._2).reduceOption(_ && _).getOrElse(lit(true))
      if (i == langs.size - 1) elseCol
      else when(beatsLater, lit(lang)).otherwise(elseCol)
    }
  }

  /** All per-language stopword hit counts in ONE compiled tokenize pass
    * (graft.functions.TokenListCounts): Array[Int] in [[Stopwords]] order.
    * The fast path for corpus-scale language ID — the declarative
    * [[stopwordHits]]/[[langId]] spellings re-tokenize per reference.
    */
  def stopwordScores(text: Column): Column =
    graft.functions.TokenListCounts.column(text, Stopwords.map(_._2))

  /** Language-ID from already-computed per-language score columns (same
    * first-max-wins precedence as [[langId]], but over cheap column
    * references instead of duplicated filter trees).
    */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val langs = scores.map(_._1)
    langs.zipWithIndex.foldRight(lit(langs.last)) { case ((lang, i), elseCol) =>
      val s = scores(i)._2
      val beatsLater = scores.drop(i + 1).map(s >= _._2).reduceOption(_ && _).getOrElse(lit(true))
      if (i == langs.size - 1) elseCol
      else when(beatsLater, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality-score feature columns + a [0,1] composite. IEEE-exact ops only. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_words", size(toks))
      .withColumn("n_chars_ws", length(col(textCol)))
      .withColumn("avg_word_len",
        length(regexp_replace(col(textCol), "\\s", "")).cast(DoubleType)
          / col("n_words").cast(DoubleType))
      .withColumn("punct_ratio",
        (length(col(textCol)) - length(regexp_replace(col(textCol), "[^a-zA-Z0-9\\s]", "")))
          .cast(DoubleType) / length(col(textCol)).cast(DoubleType))
      .withColumn("stopword_ratio",
        stopwordHits(toks, "en").cast(DoubleType) / col("n_words").cast(DoubleType))
      .withColumn("quality_score",
        greatest(lit(0.0), least(lit(1.0),
          lit(0.25) * least(col("avg_word_len") / lit(5.0), lit(1.0))
            + lit(0.25) * (lit(1.0) - col("punct_ratio"))
            + lit(0.25) * least(col("n_words").cast(DoubleType) / lit(200.0), lit(1.0))
            + lit(0.25) * least(col("stopword_ratio") * lit(5.0), lit(1.0)))))
  }

  /** PII/noise scrubbing for training corpora: URLs, e-mail addresses, and
    * long digit runs replaced with typed placeholder tokens. Regexes stay
    * in the RE2-compatible subset so the DuckDB oracle matches.
    */
  def scrub(text: Column): Column = {
    val noUrl = regexp_replace(text, "https?://[^\\s]+", "<URL>")
    val noEmail = regexp_replace(noUrl, "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "[0-9]{6,}", "<NUM>")
  }

  /** Canonical text normalization used by fingerprinting and exact dedup:
    * lowercase, collapse whitespace runs, trim.
    */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** Rolling polynomial fingerprint over the token stream, in modular
    * arithmetic (mod 1e9+7) so the fold never overflows — BIGINT overflow
    * wraps in Spark but errors in other engines, so staying under 2^63
    * keeps the value portable.
    */
  def fingerprintRolling(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (h, t) =>
        (h * lit(31L) + ascii(substring(t, 1, 1)).cast(LongType) * lit(131L)
          + length(t).cast(LongType)) % lit(1000000007L))

  /** TF-IDF over a document column: per-(doc, token) term frequency,
    * per-token document frequency, and two idf weightings —
    *  - `tfidf`: the RATIONAL form tf·N/df (integer-derived, one double
    *    division — bit-exact across engines, so it is the oracle-checked
    *    score; same per-token ranking as the log form);
    *  - `tfidf_log`: the classic tf·ln(N/df) (transcendental, engine-
    *    local; spec-checked, excluded from oracle hashing per the
    *    no-libm rule above).
    *
    * Scale shape: doc-frequency derives from the tf aggregate itself
    * (tf rows are distinct (doc, token), so counting rows per token IS
    * the document frequency) — one shuffle for tf, one for df, one
    * key-aligned join; the corpus size joins in as a broadcast scalar.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("token"), col("tf"), col("doc_freq"),
        ((col("tf") * col("n_docs")).cast(DoubleType) / col("doc_freq"))
          .as("tfidf"),
        (col("tf").cast(DoubleType)
          * log(col("n_docs").cast(DoubleType) / col("doc_freq")))
          .as("tfidf_log"))
  }

  /** Inverted index over the corpus: one row per token with its document
    * frequency, total term frequency, and the posting list (ascending
    * distinct doc ids) rendered canonically — joined with "," and
    * md5-digested, because a posting list at corpus scale is an
    * arbitrarily wide array and the digest is what an equality check /
    * cross-engine compare needs (same convention as the flagship
    * query's array digests).
    *
    * Scale shape: one shuffle to distinct (token, doc) + count tf
    * (map-side combinable), one to collect per-token postings. The
    * collect_list is bounded by per-token document frequency; for
    * stop-token-like heads at extreme scale, cap upstream with
    * [[Dedup]]-style maxDocFreq pruning before indexing.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the posting list sorts (and digests) NUMERICALLY — a silent long
    // cast would null string ids and collapse the index into one group
    require(df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"invertedIndex needs a numeric id column, got " +
        df.schema(idCol).dataType.catalogString)
    val tok = df.select(col(idCol).cast("long").as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("token"))
      .agg(
        count(lit(1)).as("doc_freq"),
        sum(col("tf")).as("total_tf"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(col("doc_id"))),
            d => d.cast("string")))).as("postings_md5"))
  }

  /** Unicode-script character classes for the script/charset language-ID
    * heuristic: (label, regex character class). Contiguous BMP ranges
    * only, so `length - length(regexp_replace(text, class, ''))` counts
    * identically in any regex engine (the cross-engine-exact contract).
    * Order is the argmax tie-break priority.
    */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "greek" -> "[\\u0370-\\u03FF]",
    "arabic" -> "[\\u0600-\\u06FF]",
    "cjk" -> "[\\u4E00-\\u9FFF]",
    "hangul" -> "[\\uAC00-\\uD7AF]",
    "thai" -> "[\\u0E00-\\u0E7F]")

  /** Character count of one script class — `length(text) minus length
    * with the class stripped`: one regexp_replace per class, no explode.
    */
  def scriptCount(text: Column, clazz: String): Column =
    (length(text) - length(regexp_replace(text, clazz, ""))).cast("long")

  /** Argmax script label over pre-extracted count columns (ties break to
    * the earlier [[ScriptClasses]] entry via the when-chain order);
    * "none" when no scripted character occurs at all. Counts are passed
    * as columns so the expensive regex extraction is evaluated once in a
    * lower select, never duplicated into the comparison tree.
    */
  def scriptPred(counts: Seq[(String, Column)]): Column = {
    val total = counts.map(_._2).reduce(_ + _)
    val chain = counts.foldLeft(when(total === 0, lit("none"))) {
      case (acc, (label, c)) =>
        acc.when(counts.filter(_._1 != label).map(x => c >= x._2)
          .reduce(_ && _), lit(label))
    }
    chain.otherwise(lit("other"))
  }

  /** Collapse consecutive repeated tokens — the classic within-document
    * repetition REMOVAL step (x76 only scores): "batch batch batch" →
    * "batch". Returns the kept-token array; pair with `array_join` for
    * the cleaned text and `size` diffs for removal stats. Pure HOF
    * projection (filter + element_at), no explode, no shuffle —
    * per-document work at any corpus size.
    */
  def collapseTokenRuns(toks: Column): Column =
    filter(toks, (t, i) => (i === 0) || !(t <=> get(toks, i - 1)))

  /** Host of a URL: the authority between `scheme://` and the first
    * `/ : ? #`. Empty string when the value does not parse as a URL.
    */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)

  /** Registered domain heuristic: the last two dot-labels of the host
    * ("cdn.src0-mirror.com" → "src0-mirror.com"). A production deploy
    * swaps this for a public-suffix-list lookup (multi-label suffixes
    * like co.uk need the table); the filtering JOIN shape is identical.
    */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
}
