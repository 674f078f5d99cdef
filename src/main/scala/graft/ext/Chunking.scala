package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data sequence shaping: sliding-window document chunking and
  * GPT-style sequence packing — the two operators between a curated
  * corpus and a token-budgeted training run.
  *
  * Both are pure DataFrame compositions (zero UDFs, codegen-friendly):
  * chunking is a per-row generator (no shuffle at all); packing needs a
  * global token offset per document, computed as a two-level prefix sum
  * — per-bucket window cumsum (distributed) plus a bucket-offset cumsum
  * over the tiny bucket-total frame (broadcast back) — so no stage ever
  * windows over a single global partition of the full corpus.
  */
object Chunking {

  /** Sliding token windows over each document: window `window` tokens,
    * stride `stride` (overlapping when stride < window). Output one row
    * per (doc, chunk): (idCol, chunk_idx, chunk_text, n_tokens). Chunks
    * start at token offsets 0, stride, 2·stride, … and stop once a chunk
    * reaches the document's end — a window that would only repeat tokens
    * the previous window already covered is NOT emitted (the
    * return-overflowing-tokens convention), so chunk count is
    * 1 + ceil(max(0, n − window) / stride) and every token appears in at
    * least one chunk. Blank documents produce no chunks. Tokenization is
    * the engine-wide whitespace spelling `split(trim(text), "\s+")`.
    *
    * Scale shape: narrow projection + generator — no shuffle, no state;
    * output order is pinned only if the caller sorts. The last-start
    * arithmetic stays on non-negative integers (clamp before divide), so
    * floor- vs truncate-division engines agree.
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    // stride > window would leave tokens between windows in NO chunk,
    // breaking the every-token-covered guarantee documented above
    require(stride <= window,
      s"stride ($stride) must be <= window ($window) so chunks cover every token")
    val lastStart = floor(
      (greatest(lit(0), col("__n") - lit(window)) + lit(stride - 1))
        / lit(stride)) * lit(stride)
    df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__n"))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), lastStart, lit(stride))))
      .select(col(idCol),
        col("pos").cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("col") + 1, lit(window)))
          .as("chunk_text"),
        least(lit(window), col("__n") - col("col")).cast("long").as("n_tokens"))
  }

  /** Content-defined chunking: chunk boundaries fall where a rolling
    * hash of the last `gear` tokens hits 0 mod `modulus` — so boundaries
    * are a function of LOCAL content, not absolute offsets. That is the
    * property fixed-stride chunking lacks: insert one sentence at the
    * top of a document and every fixed-stride chunk after it changes,
    * but content-defined boundaries re-align immediately, so chunk-level
    * dedup still matches everything downstream of the edit (the
    * rsync/LBFS/FastCDC trick, applied at token granularity).
    *
    * Definitions (all integer arithmetic, engine-portable):
    *   h_i = ascii(first char of token i) · 131 + len(token i)
    *   H_i = (h_{i-2}·131² + h_{i-1}·131 + h_i) mod 1000000007 (i >= 2)
    *   boundary AFTER token i  iff  H_i mod `modulus` == 0
    *   chunk_idx of token i = count of boundaries strictly before i
    *
    * Expected chunk length ~ `modulus` tokens. Output one row per
    * (doc, chunk): (idCol, chunk_idx, tok_start, n_tokens, chunk_md5)
    * where chunk_md5 digests the space-joined tokens (chunks are
    * arbitrary-width → digest convention, like posting lists).
    *
    * Scale shape: tokenize + posexplode is a generator projection; the
    * rolling hash and boundary prefix-count are windows partitioned by
    * document (ONE shuffle on idCol); the per-chunk rollup re-aggregates
    * on (idCol, chunk_idx) whose partitioning prefix-aligns with the
    * window's, so AQE/EnsureRequirements can reuse the exchange.
    */
  def contentDefinedChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      modulus: Int = 64): DataFrame = {
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    val P = 131L
    val M = 1000000007L
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__i"))
    val tok = df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), posexplode(split(trim(col(textCol)), "\\s+")))
      .select(col(idCol), col("pos").cast("long").as("__i"), col("col").as("__w"))
      .withColumn("__h",
        ascii(col("__w")).cast("long") * lit(P) + length(col("__w")).cast("long"))
    val rolled = tok
      .withColumn("__H",
        (lag(col("__h"), 2).over(byDoc) * lit(P * P)
          + lag(col("__h"), 1).over(byDoc) * lit(P)
          + col("__h")) % lit(M))
      .withColumn("__b",
        when(col("__H").isNotNull && col("__H") % lit(modulus.toLong) === 0L, 1L)
          .otherwise(0L))
      .withColumn("__chunk",
        coalesce(sum(col("__b")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    rolled
      .groupBy(col(idCol), col("__chunk").as("chunk_idx"))
      .agg(
        min(col("__i")).as("tok_start"),
        count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("__i"), col("__w")))),
            s => s.getField("__w")))).as("chunk_md5"))
  }

  /** GPT-style packing manifest: documents are concatenated in `idCol`
    * order into one global token stream, which is cut into fixed
    * `budget`-token training sequences; a document whose span crosses a
    * cut lands in BOTH sequences (that is the packing-with-straddle
    * model — nothing is padded or dropped). Returns one row per
    * (document, sequence) intersection:
    *
    *   (idCol, seq_idx, doc_tok_start, doc_tok_end, seq_tok_start)
    *
    * where [doc_tok_start, doc_tok_end) is the within-document token
    * range placed in sequence seq_idx, starting at offset seq_tok_start
    * inside that sequence. Every sequence except the last is exactly
    * full by construction.
    *
    * `df` must carry a positive token length in `lenCol`; rows with
    * len <= 0 are ignored. Global offsets come from a two-level prefix
    * sum bucketed by `floor(id / bucketSize)`: level 1 windows within a
    * bucket (distributed across the cluster), level 2 windows over one
    * row per bucket (tiny — safe at any corpus size), broadcast back.
    */
  def packManifest(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long,
      bucketSize: Long = 4096L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    // the global concatenation order AND the bucket arithmetic both live
    // on the numeric id — a non-numeric id would silently cast to null
    // and collapse every row into one garbage bucket
    require(df.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packManifest needs a numeric id column, got " +
        df.schema(idCol).dataType.catalogString)
    val lens = df
      .select(col(idCol).cast("long").as("__id"),
        col(lenCol).cast("long").as("__len"))
      .where(col("__len") > 0)
      .withColumn("__bucket", floor(col("__id") / lit(bucketSize)))
    val wLocal = Window.partitionBy(col("__bucket")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = lens
      .withColumn("__local_off", coalesce(sum(col("__len")).over(wLocal), lit(0L)))
    val bucketTotals = lens.groupBy(col("__bucket"))
      .agg(sum(col("__len")).as("__btot"))
    // single-partition window over ONE ROW PER BUCKET — O(corpus/bucketSize)
    val wBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffs = bucketTotals
      .withColumn("__boff", coalesce(sum(col("__btot")).over(wBuckets), lit(0L)))
      .select(col("__bucket"), col("__boff"))
    local
      .join(broadcast(bucketOffs), Seq("__bucket"))
      .withColumn("__start", col("__boff") + col("__local_off"))
      .withColumn("__end", col("__start") + col("__len"))
      .select(col("__id"), col("__start"), col("__end"),
        explode(sequence(
          floor(col("__start") / lit(budget)).cast("long"),
          floor((col("__end") - 1) / lit(budget)).cast("long"))).as("seq_idx"))
      .select(
        col("__id").as(idCol),
        col("seq_idx"),
        (greatest(col("__start"), col("seq_idx") * lit(budget)) - col("__start"))
          .as("doc_tok_start"),
        (least(col("__end"), (col("seq_idx") + 1) * lit(budget)) - col("__start"))
          .as("doc_tok_end"),
        (greatest(col("__start"), col("seq_idx") * lit(budget))
          - col("seq_idx") * lit(budget)).as("seq_tok_start"))
  }

  /** Length-bucketed dynamic batching manifest — the `group_by_length`
    * batching of variable-length training (HF Trainer / fairseq): bucket
    * documents by token-length band, then cut each bucket (in id order)
    * into batches of ~`maxTokensPerBatch`, so same-batch sequences have
    * similar length and the pad-to-max waste stays small. Output is one
    * row PER BATCH: (bucket, batch, n_docs, batch_tokens, max_len,
    * padding) where padding = n_docs·max_len − batch_tokens, the exact
    * wasted-token bill the bucketing exists to minimize.
    *
    * Batch capacity is the streaming-pack convention: a document whose
    * cumulative START offset crosses a budget boundary opens the next
    * batch, so a batch can overrun by at most one document (documents
    * longer than the budget overflow alone — [[chunk]] first if that
    * matters). All arithmetic is integer (div floors identically on
    * both engines), so the manifest oracle-hashes.
    *
    * Scale shape: one window per length-bucket (parallel across
    * buckets, each partition-local after ONE hash exchange) + a
    * map-side-combinable groupBy. A skew-heavy bucket at 100 TB takes
    * the [[packManifest]] two-level prefix-sum treatment — same
    * arithmetic, salted inner level.
    */
  def lengthBatches(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bucketWidth: Int = 16,
      maxTokensPerBatch: Int = 256): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxTokensPerBatch >= 1,
      s"maxTokensPerBatch must be >= 1, got $maxTokensPerBatch")
    val base = df
      // blank docs are dropped explicitly: the whitespace tokenizer
      // renders "" as one empty token on every engine, so a size filter
      // alone would batch them as 1-token sequences
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"(n_tokens - 1) div $bucketWidth"))
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("batch", expr(s"__start div $maxTokensPerBatch"))
      .groupBy(col("bucket"), col("batch"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("batch_tokens"),
        max(col("n_tokens")).as("max_len"))
      .withColumn("padding",
        col("n_docs") * col("max_len") - col("batch_tokens"))
  }
}
