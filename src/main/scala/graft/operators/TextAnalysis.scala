package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines over a `text` column:
  * tokenization, token counting (whitespace + BPE-ish regex), quality
  * scoring, n-gram language ID, document fingerprinting, and tf-idf.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split/filter/transform/aggregate higher-order functions) — no UDFs, so
  * the whole stage stays inside WholeStageCodegen and scales linearly with
  * input: per-document work only, no shuffle except the tf-idf aggregates
  * (which do map-side partial aggregation on (doc, term) / (term) keys).
  */
object TextAnalysis {

  /** Whitespace tokenization of lowercased, trimmed text. */
  def tokensCol(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** BPE-ish subword segmentation: letter runs, digit runs, single other
    * glyphs — the standard pre-tokenizer shape (e.g. GPT-2's regex family),
    * reduced to character classes so the count is engine-portable. Counted
    * by the single-pass [[graft.functions.TextScan.BpeTokenCount]] scanner
    * (equivalent to `size(regexp_extract_all(lower(text), BpePattern))`,
    * asserted in `TextScanSpec` — no regex engine, no match-list
    * allocation).
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokenCountCol(text: Column): Column =
    graft.functions.TextScan.bpeTokenCount(text)

  /** `size(tokensCol(text))` as a single scan (no array allocation). */
  def wsTokenCountCol(text: Column): Column =
    graft.functions.TextScan.wsTokenCount(text)

  /** Per-language marker stopwords for the n-gram-heuristic language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ein", "ist", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "los", "las", "y", "que", "de", "un"),
    "fr" -> Seq("le", "la", "les", "et", "que", "des", "un", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "that", "it",
      "on", "for", "with", "as", "at", "by")

  /** Count of tokens that appear in `markers` (with multiplicity) — the
    * native [[graft.functions.ArraySetOps.CountInSet]] codegen expression:
    * one hash probe per token. The `size(filter(toks, k-way OR))` HOF
    * formulation it replaces is CodegenFallback and re-ran an interpreted
    * OR chain per element (dominated q21/q22's runtime).
    */
  def scoreCol(tokens: Column, markers: Seq[String]): Column =
    graft.functions.ArraySetOps.countInSet(tokens, markers)

  /** Heuristic language ID: argmax of per-language marker-token counts,
    * ties broken by language-code order (deterministic — required by the
    * hash-compare oracle).
    */
  def langIdCol(tokens: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> scoreCol(tokens, ms) }
    // lang L wins if its score is >= every later language's score and
    // strictly > none before it beat it — expressed as a first-match CASE
    // chain in declared (alphabetical) order.
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), elseCol) =>
        val rest = scores.drop(i + 1).map(_._2)
        when(rest.map(s >= _).reduce(_ && _), lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality-scoring features: char/token counts, average token length,
    * punctuation ratio, stopword ratio, alpha ratio. All exact-integer
    * divisions of counts → bit-identical doubles across engines.
    */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // materialize the token array once — each feature below references it,
    // and interpreted HOFs would otherwise re-run the tokenizing split()
    // per reference (no CSE across expressions)
    // the token ARRAY is built once for the set-membership stopword count;
    // every pure COUNT is a TextScan single-pass scanner instead of a
    // regex match-list or an interpreted aggregate-HOF fold (equivalence
    // asserted in TextScanSpec)
    import graft.functions.TextScan
    val withToks = df.withColumn("__toks", tokensCol(t))
    val toks = col("__toks")
    val nChars = length(t).cast("long")
    val nTokens = size(toks).cast("long")
    val nPunct = TextScan.asciiSetCount(t, ".,;:!?'\"()[]{}-").cast("long")
    val nStop = scoreCol(toks, EnglishStopwords).cast("long")
    val nAlpha = TextScan.asciiSetCount(t, "abcdefghijklmnopqrstuvwxyz").cast("long")
    withToks.withColumn("n_chars_m", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len",
        (TextScan.wsCharCount(t).cast("double") / greatest(nTokens, lit(1L))))
      .withColumn("punct_ratio", nPunct.cast("double") / greatest(nChars, lit(1L)))
      .withColumn("stopword_ratio", nStop.cast("double") / greatest(nTokens, lit(1L)))
      .withColumn("alpha_ratio", nAlpha.cast("double") / greatest(nChars, lit(1L)))
      .drop("__toks")
  }

  /** Document fingerprints: a portable content hash (md5 hex — identical
    * in every engine); `fp_rolling`, the order-sensitive 61-bit rolling
    * polynomial over md5-hashed tokens
    * ([[graft.functions.TextHashes.RollingFpMd5]] — native codegen, and
    * portable: DuckDB replays the identical fold with 128-bit integers);
    * and `fp_ordered` (md5 of the space-joined token stream), the
    * string-level order-sensitive variant.
    */
  /** The order-sensitive portable fingerprint alone (md5 of the
    * space-joined token stream) — for callers that need just a dedup key
    * and shouldn't pay [[fingerprint]]'s full three-hash family.
    */
  def fpOrderedCol(text: Column): Column =
    md5(concat_ws(" ", tokensCol(text)).cast("binary"))

  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("fp_md5", md5(t.cast("binary")))
      .withColumn("fp_rolling",
        graft.functions.TextHashes.rollingFpMd5(tokensCol(t)))
      .withColumn("fp_ordered", fpOrderedCol(t))
  }

  /** PII redaction over free text: emails, dashed/dotted phone numbers
    * and SSN-shaped ids replaced with type tags. Patterns stick to the
    * regex subset with identical semantics in Java regex and RE2
    * (character classes, counted repetition, word boundaries), so the
    * oracle can replay them (DuckDB needs the 'g' flag for replace-all).
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  def redactPiiCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        SsnPattern, "<SSN>"),
      PhonePattern, "<PHONE>")

  /** Text normalization for training corpora: strip control characters,
    * collapse whitespace runs to single spaces, trim, lowercase — all
    * dialect-portable regex/string builtins.
    */
  def normalizeTextCol(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " ")))

  /** Token-budget truncation: keep the first `maxTokens` whitespace
    * tokens, rejoined with single spaces (the cheap pre-tokenizer cap
    * applied before expensive BPE tokenization at scale).
    */
  def truncateTokensCol(text: Column, maxTokens: Int): Column =
    concat_ws(" ", slice(tokensCol(text), 1, maxTokens))

  /** Intra-document repetition features (Gopher/C4-style quality
    * signals): for n ∈ {1, 2, 3}, the total n-gram count, the distinct
    * n-gram count, and the duplicate fraction
    * `(total − distinct) / total` — high values flag boilerplate and
    * degenerate repetition that near-dup dedup (cross-document) never
    * sees. Per-row, zero shuffle: distinct counts come from the
    * [[graft.functions.TextHashes.HashedShingles]] codegen expression
    * (already distinct per doc; 64-bit hashes give the same counts as
    * string n-grams w.h.p. — the q16 oracle precedent), totals are plain
    * arithmetic on the token count. Ratios divide exact integers in
    * double → bit-identical across engines.
    */
  def repetitionFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withToks = df.withColumn("__toks", tokensCol(col(textCol)))
    val toks = col("__toks")
    Seq(1, 2, 3).foldLeft(withToks) { (acc, n) =>
      val total = greatest(size(toks) - (n - 1), lit(0)).cast("long")
      val dist = size(graft.functions.TextHashes.hashedShingles(toks, n)).cast("long")
      acc.withColumn(s"total_${n}gram", total)
        .withColumn(s"distinct_${n}gram", dist)
        .withColumn(s"dup_${n}gram_ratio",
          (col(s"total_${n}gram") - col(s"distinct_${n}gram")).cast("double") /
            greatest(col(s"total_${n}gram"), lit(1L)))
    }.drop("__toks")
  }

  /** Character-weighted repetition concentration (the Gopher rules the
    * count-based [[repetitionFeatures]] ratios don't express): per doc,
    * the most frequent word bigram with the fraction of bigram
    * characters its occurrences cover, and the fraction of trigram
    * characters inside trigrams occurring ≥ 2 times. Character
    * weighting matters because one long repeated phrase can dominate a
    * document while barely moving count ratios.
    *
    * Shape: one explode pass → ONE map-side-combinable (doc, n, gram)
    * count agg (both n values tagged in the same Generate, so the
    * corpus is scanned once) → doc-keyed aggs/join on the distinct-gram
    * frame. No windows, no data-cardinality broadcasts.
    *
    * Ties on the top bigram break to the lexicographically smallest
    * gram (deterministic, oracle-replayable). Docs with < 2 words have
    * no bigram and drop out; docs with exactly 2 words emit a null
    * trigram fraction.
    */
  def repetitionCharSignals(df: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val base = df.select(col(idCol),
      filter(tokensCol(col(textCol)), t => t =!= "").as("__w"))
    def grams(n: Int): Column =
      when(size(col("__w")) >= n,
        transform(sequence(lit(1), size(col("__w")) - (n - 1)),
          k => concat_ws(" ", slice(col("__w"), k, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val counts = base.select(col(idCol),
        explode(concat(
          transform(grams(2), g => struct(lit(2).as("n"), g.as("g"))),
          transform(grams(3), g => struct(lit(3).as("n"), g.as("g"))))).as("ng"))
      .select(col(idCol), col("ng.n").as("n"), col("ng.g").as("g"))
      .groupBy(col(idCol), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy(col(idCol)).agg(
      max(when(col("n") === 2, col("c"))).as("maxc2"),
      sum(when(col("n") === 2, col("c") * length(col("g")))).as("den2"),
      sum(when(col("n") === 3, col("c") * length(col("g")))).as("den3"),
      sum(when(col("n") === 3 && col("c") >= 2,
        col("c") * length(col("g")))).as("num3"))
    val top = counts.filter(col("n") === 2)
      .join(perDoc.select(col(idCol), col("maxc2")), idCol)
      .filter(col("c") === col("maxc2"))
      .groupBy(col(idCol)).agg(min(col("g")).as("top_bigram"))
    perDoc.join(top, Seq(idCol))
      .select(col(idCol), col("top_bigram"),
        col("maxc2").as("top_bigram_count"),
        round(col("maxc2").cast("double") *
            length(col("top_bigram")).cast("double") /
          col("den2").cast("double"), 6).as("top_bigram_char_frac"),
        round(coalesce(col("num3"), lit(0L)).cast("double") /
          col("den3").cast("double"), 6).as("dup_trigram_char_frac"))
  }

  /** Term frequencies per (doc, term) — the relational backbone for
    * tf-idf and n-gram Jaccard. Map-side combine applies on the
    * (doc_id, term) groupBy; at 100 TB this is the standard
    * explode→partial-agg→shuffle-once shape.
    */
  def docTerms(df: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    df.select(col(idCol), explode(tokensCol(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** Document chunking: split each doc into `chunkTokens`-token windows
    * overlapping by `overlapTokens` — the context-window preparation
    * step of both pretraining and retrieval pipelines. Pure per-row
    * generate (explode of computed chunk starts + array slices): no
    * shuffle, output rows = Σ chunks. Chunk starts advance by
    * `chunkTokens − overlapTokens`; the last window may be short, and a
    * start is emitted only while it can contribute tokens beyond the
    * previous chunk's overlap (`start ≤ max(|toks| − overlap, 1)`), so
    * no trailing chunk is fully contained in its predecessor. Documents
    * shorter than one chunk yield exactly one chunk.
    */
  def chunkDocuments(df: DataFrame, chunkTokens: Int, overlapTokens: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = tokensCol(col(textCol))
    val nChunks =
      (floor((greatest(size(toks) - overlapTokens, lit(1)) - 1) / stride) + 1)
        .cast("int")
    val chunk = slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens))
    // null-text docs yield NO chunks (consistent with docTerms); without
    // the guard, null-skipping greatest() would fabricate one phantom
    // chunk whose text renders "" here but NULL in a SQL mirror
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"), nChunks.as("__n"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__n") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", chunk).as("chunk_text"),
        size(chunk).cast("long").as("n_chunk_tokens"))
  }

  /** Okapi BM25 scoring of every document against a fixed bag of query
    * terms — the lexical-retrieval side of corpus search (the dense side
    * is [[Similarity]]). Returns the `topK` docs by score.
    *
    * Relational plan: doc-term frequencies are filtered to the query
    * terms BEFORE aggregation (the `isin` predicate pushes below the
    * tf groupBy, so the shuffle carries query-term rows only); per-term
    * document frequencies and the global (N, Σdl) row are broadcast
    * back. Scoring arithmetic is all exact-integer inputs in double
    * with ONE fixed expression tree: per-doc term scores land in k
    * conditional aggregates (each sums exactly one non-null value) and
    * the final score adds those k columns in sorted-term order — no
    * float sum in shuffle-arrival order anywhere, so results are
    * deterministic and engine-portable (q27's idf convention:
    * ln((N+1)/(df+1))). Doc length is the whitespace token count.
    */
  def bm25Search(docs: DataFrame, queryTerms: Seq[String],
                 idCol: String = "doc_id", textCol: String = "text",
                 k1: Double = 1.2, b: Double = 0.75,
                 topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search needs at least one query term")
    val terms = queryTerms.distinct.sorted
    val lens = docs.select(col(idCol),
      wsTokenCountCol(col(textCol)).cast("long").as("dl"))
    val dt = docTerms(docs, idCol, textCol).filter(col("term").isin(terms: _*))
    bm25Core(dt, lens, terms, idCol, k1, b, topK)
  }

  /** The shared BM25 tail: per-term document frequencies and the
    * global (N, Σdl) row derive from the supplied frames, scoring uses
    * ONE fixed expression tree (see [[bm25Search]]'s determinism
    * notes). `dt` must already be restricted to the query terms.
    */
  private def bm25Core(dt: DataFrame, lens: DataFrame, terms: Seq[String],
                       idCol: String, k1: Double, b: Double,
                       topK: Int): DataFrame = {
    val global = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfs = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = dt
      .join(lens, idCol)
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(global))
      .withColumn("idf",
        log((col("n_docs") + 1).cast("double") / (col("df") + 1)))
      .withColumn("s", col("idf") * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("dl") * col("n_docs") / col("sum_dl"))))
    val perTerm = terms.map(t =>
      coalesce(max(when(col("term") === t, col("s"))), lit(0.0))
        .as(s"__s_$t"))
    scored.groupBy(col(idCol))
      .agg(perTerm.head, perTerm.tail :+ count(lit(1)).as("n_matched"): _*)
      .withColumn("bm25",
        round(terms.map(t => col(s"__s_$t")).reduceLeft(_ + _), 6))
      .select(col(idCol), col("bm25"), col("n_matched"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** BATCHED BM25 retrieval from the persisted index — the shape a
    * retrieval-eval or RAG harness actually runs: a FRAME of queries
    * (not one driver-literal term list) scored in one pass. Query
    * terms explode to (query, term, bucket) rows; the postings scan
    * meets the batch's DISTINCT (bucket, term) keys through a plain
    * equi-join — the partition column is in the join key, so runtime
    * (dynamic) partition pruning bounds the scan by the batch's bucket
    * set, and the driver never needs literal terms. Document
    * frequencies and global stats derive from the index frames exactly
    * as [[bm25FromIndex]] derives them.
    *
    * Per-(query, doc) scores use [[bm25Search]]'s expression tree per
    * term, DECIMAL(28,12)-quantized before the order-free sum (the
    * dynamic-term replacement for the single-query path's fixed
    * per-term column sum — a query frame has no driver-known term
    * order), then a bounded per-query top-k
    * ([[graft.functions.TopKAgg]] — map-side k-bounded, no global
    * window). Output: (queryIdCol, idCol, rank, bm25, n_matched); a
    * query with no indexed term emits no rows (visible, not padded).
    */
  def bm25BatchFromIndex(spark: org.apache.spark.sql.SparkSession,
                         dir: String, queries: DataFrame,
                         queryIdCol: String = "query_id",
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         k1: Double = 1.2, b: Double = 0.75,
                         topK: Int = 10, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, invertedFrames)
    val lens = spark.read.parquet(s"$dir/lens")
    val bucket = pmod(conv(substring(md5(col("term").cast("binary")), 1, 13),
      16, 10).cast("long"), lit(nBuckets.toLong))
    val qt = queries.select(col(queryIdCol).as("__qid"),
        explode(array_distinct(tokensCol(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .withColumn("pbucket", bucket)
    // postings restricted to the batch's terms — df computed on THIS
    // frame is the term's full document frequency (the term filter
    // restricts terms, never docs); cached: it feeds dfs + scoring
    val matched = TrackedCaches.track(
      spark.read.parquet(s"$dir/postings")
        .join(qt.select(col("pbucket"), col("term")).distinct(),
          Seq("pbucket", "term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfs = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val global = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val scored = matched.join(qt, Seq("pbucket", "term"))
      .join(lens, idCol)
      .join(dfs, "term")
      .crossJoin(global) // one-row aggregate — AQE broadcasts unhinted
      .withColumn("s",
        log((col("n_docs") + 1).cast("double") / (col("df") + 1)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl") * col("n_docs") / col("sum_dl"))))
    val perDoc = scored.groupBy(col("__qid"), col(idCol))
      .agg(sum(col("s").cast("decimal(28,12)")).as("__ssum"),
        count(lit(1)).as("n_matched"))
      .withColumn("__sv", col("__ssum").cast("double"))
    val top = perDoc.groupBy(col("__qid"))
      .agg(graft.functions.TopKAgg.topK(col("__sv"), col(idCol), topK)
        .as("nn"))
      .select(col("__qid"), posexplode(col("nn")))
      .select(col("__qid"), col("col.id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"))
    top.join(perDoc.select(col("__qid"), col(idCol), col("__sv"),
        col("n_matched")), Seq("__qid", idCol))
      .select(col("__qid").as(queryIdCol), col(idCol), col("rank"),
        round(col("__sv"), 6).as("bm25"), col("n_matched"))
  }

  /** Persist the lexical-retrieval index: `dir/postings` = the full
    * (doc, term, tf) frame PARTITIONED by a 52-bit-md5 term bucket —
    * so a query's scan prunes to its terms' bucket DIRECTORIES and
    * never touches the corpus — plus `dir/lens` (doc lengths) and the
    * stats a query needs. Bucketing by hash (not raw term) bounds the
    * directory count at `nBuckets` regardless of vocabulary size; the
    * residual in-bucket rows are filtered by the pushed term
    * predicate. The md5 family is the repo's portable idiom
    * ([[graft.operators.Encoding.hashFeatures]]).
    */
  /** The inverted index's swap-managed generation frames (rebuilds
    * publish both as one generation; appends add files only). */
  private val invertedFrames = Seq("lens", "postings")

  def writeInvertedIndex(docs: DataFrame, dir: String,
                         idCol: String = "doc_id",
                         textCol: String = "text",
                         nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    IndexSwap.clean(fs, dir, invertedFrames)
    val lens = docs.select(col(idCol),
      wsTokenCountCol(col(textCol)).cast("long").as("dl"))
    lens.write.mode("overwrite").parquet(IndexSwap.stagedPath(dir, "lens"))
    val bucket = pmod(conv(substring(md5(col("term").cast("binary")), 1, 13),
      16, 10).cast("long"), lit(nBuckets.toLong))
    // tokenize+explode is the heavy per-row stage of the build; a
    // single-file corpus otherwise tokenizes on ONE core (guide §2.5 —
    // FrameOps.parallelized is an identity at production scan widths)
    docTerms(FrameOps.parallelized(docs), idCol, textCol)
      .withColumn("pbucket", bucket)
      .write.mode("overwrite").partitionBy("pbucket")
      .parquet(IndexSwap.stagedPath(dir, "postings"))
    // a rebuild over a live index publishes one generation — a crash
    // can no longer pair new lens (doc lengths) with old postings,
    // which would skew every BM25 length normalization
    IndexSwap.swapAll(fs, dir, invertedFrames)
  }

  /** Incremental index maintenance — the retrieval sibling of
    * [[graft.operators.Dedup.appendMinhashIndex]], and STRICTLY
    * simpler because every index frame is per-doc-derivable: the
    * batch's postings append as NEW FILES under their existing bucket
    * partition directories (nothing is rewritten — partitioned
    * append-mode write), doc lengths append likewise, and document
    * frequencies / global stats are derived at QUERY time from the
    * frames, so `index(A) + append(B) ≡ build(A ∪ B)` exactly, with
    * no cap bookkeeping. Ids already indexed drop out of the batch
    * PER FRAME (`dedupeBatch`, default on): the lens append anti-joins
    * the lens frame, the postings append anti-joins the postings
    * frame's distinct doc ids — so a failure replay never doubles tf
    * rows or doc lengths (BM25 inflation), AND a crash BETWEEN the two
    * appends self-heals (the replay fills exactly the missing frame; a
    * single shared dedupe key would either skip the missing frame
    * forever or duplicate the landed one, depending on write order).
    * Each frame's anti-join reads only that frame — no cross-frame
    * lazy-plan self-invalidation. `nBuckets` must match the build.
    */
  def appendInvertedIndex(docs: DataFrame, dir: String,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          nBuckets: Int = 64,
                          dedupeBatch: Boolean = true): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = docs.sparkSession
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, invertedFrames)
    val freshLens =
      if (!dedupeBatch) docs
      else docs.join(spark.read.parquet(s"$dir/lens").select(col(idCol)),
        Seq(idCol), "left_anti")
    freshLens.select(col(idCol),
        wsTokenCountCol(col(textCol)).cast("long").as("dl"))
      .write.mode("append").parquet(s"$dir/lens")
    // parallelize the BATCH side BEFORE the anti-join, not the joined
    // frame (whose inputFiles includes the index dir, defeating the
    // downstream un-starve check — the appendMinhashIndex lesson):
    // single-file batches otherwise tokenize on one core (guide §2.5)
    val freshPost =
      if (!dedupeBatch) FrameOps.parallelized(docs)
      else FrameOps.parallelized(docs)
        .join(spark.read.parquet(s"$dir/postings")
          .select(col(idCol)).distinct(),
        Seq(idCol), "left_anti")
    val bucket = pmod(conv(substring(md5(col("term").cast("binary")), 1, 13),
      16, 10).cast("long"), lit(nBuckets.toLong))
    docTerms(freshPost, idCol, textCol)
      .withColumn("pbucket", bucket)
      .write.mode("append").partitionBy("pbucket")
      .parquet(s"$dir/postings")
  }

  /** [[bm25Search]] answered FROM the persisted index — byte-identical
    * scores with ZERO corpus scan: the postings read prunes to the
    * query terms' bucket partitions (driver-side md5 of each term —
    * the same 52-bit family the writer used), document frequencies
    * and the global stats derive from the index frames exactly as the
    * from-scratch path derives them from the corpus. `nBuckets` must
    * match the build.
    */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                    queryTerms: Seq[String], idCol: String = "doc_id",
                    k1: Double = 1.2, b: Double = 0.75, topK: Int = 10,
                    nBuckets: Int = 64): DataFrame = {
    require(queryTerms.nonEmpty, "bm25FromIndex needs at least one query term")
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, invertedFrames)
    val terms = queryTerms.distinct.sorted
    val buckets = terms.map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.substring(0, 13)
      java.lang.Long.parseLong(hex, 16) % nBuckets
    }.distinct
    val dt = spark.read.parquet(s"$dir/postings")
      .filter(col("pbucket").isin(buckets: _*) &&
        col("term").isin(terms: _*))
      .select(col(idCol), col("term"), col("tf"))
    bm25Core(dt, spark.read.parquet(s"$dir/lens"), terms, idCol, k1, b,
      topK)
  }

  /** Per-document average unigram surprisal in nats — the classic
    * cheap LM-based quality score (high = unusual token distribution:
    * gibberish, boilerplate codes, wrong language; low = stereotyped
    * text): train add-one-smoothed unigram probabilities ON the corpus
    * itself (`p(t) = (c_t + 1) / (C + V)`), then score each doc
    * `Σ tf·(−ln p) / Σ tf`. Two aggregation shuffles (term counts, doc
    * rollup) + one term-keyed join — at 100 TB the model side is one row
    * per vocab term and the join is a plain equi-join; no driver state.
    *
    * Oracle exactness: each per-(doc, term) contribution is cast to
    * DECIMAL(28,12) BEFORE the per-doc sum, so the sum is exact and
    * order-independent on both engines (the shared double-sum rule); the
    * ln inputs are ratios of exact integers, so both engines evaluate
    * ln on identical doubles.
    */
  def lmSurprisal(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val dt = docTerms(docs, idCol, textCol)
    // The model side (one row per vocab term) is referenced twice — by the
    // smoothing totals and by the scoring join. Persisted (and registered
    // with the release hook) so the corpus is tokenized exactly twice —
    // once to train, once to score — instead of three times; the cache is
    // vocab-sized, orders of magnitude below the corpus.
    val counts = TrackedCaches.track(
      dt.groupBy(col("term")).agg(sum(col("tf")).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = counts.agg(sum(col("c")).as("ctot"),
      count(lit(1)).as("vocab"))
    val model = counts.crossJoin(broadcast(totals))
      .withColumn("neg_lnp",
        -log((col("c") + 1).cast("double") / (col("ctot") + col("vocab"))))
      .select(col("term"), col("neg_lnp"))
    dt.join(model, "term")
      .withColumn("contrib",
        (col("tf").cast("double") * col("neg_lnp")).cast("decimal(28,12)"))
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("nll"), sum(col("tf")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        round(col("nll").cast("double") / col("n_tokens"), 6)
          .as("avg_surprisal"))
  }

  /** Cross-corpus novelty: average unigram surprisal of `targetDocs`
    * under a model trained on `refDocs` — the out-of-distribution /
    * contamination-drift monitor ("how unlike the curated reference is
    * this source?"), where [[lmSurprisal]] scores a corpus against
    * itself. Same add-one smoothing with the REFERENCE vocabulary:
    * a target term unseen in the reference scores `−ln(1/(C+V))` (the
    * c = 0 smoothed mass), and `oov_frac` reports the unseen-token
    * share directly — the two signals separate "rare words" from
    * "different vocabulary".
    *
    * Plan: reference reduces once to a vocab-sized count frame
    * (persisted); targets join it term-keyed (LEFT — OOV terms
    * survive); per-(doc, term) contributions are DECIMAL(28,12)-
    * quantized before the order-free per-doc sum.
    * Output: idCol, n_tokens, avg_surprisal, oov_frac (6 dp).
    */
  def lmCrossSurprisal(refDocs: DataFrame, targetDocs: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val counts = TrackedCaches.track(
      docTerms(refDocs, idCol, textCol)
        .groupBy(col("term")).agg(sum(col("tf")).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = counts.agg(sum(col("c")).as("ctot"),
      count(lit(1)).as("vocab"))
    docTerms(targetDocs, idCol, textCol)
      .join(counts, Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("neg_lnp",
        -log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("ctot") + col("vocab"))))
      .withColumn("contrib",
        (col("tf").cast("double") * col("neg_lnp")).cast("decimal(28,12)"))
      .withColumn("oov_tf", when(col("c").isNull, col("tf")).otherwise(lit(0L)))
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("nll"), sum(col("tf")).as("n_tokens"),
        sum(col("oov_tf")).as("oov"))
      .select(col(idCol), col("n_tokens"),
        round(col("nll").cast("double") / col("n_tokens"), 6)
          .as("avg_surprisal"),
        round(col("oov").cast("double") / col("n_tokens"), 6).as("oov_frac"))
  }

  /** Corpus bigram language model, reported as the top-`topPerContext`
    * next tokens per context token with exact conditional probabilities
    * `p(w2|w1) = c(w1,w2) / c(w1,·)` — the order-1 companion to
    * [[lmSurprisal]] (order-0) and the text-side analogue of
    * `ProductAnalytics.transitions`. Contexts rarer than
    * `minContextCount` are dropped (their estimates are noise).
    *
    * Plan: one generate pass emits bigram pairs (explode of an index
    * sequence + two 1-based `element_at`s against the materialized token
    * array — no doc-keyed shuffle, no self-join on position), one
    * map-side-combined count shuffle on (w1, w2), then context totals
    * and ranks as two windows sharing the single w1-keyed exchange. All
    * frames after the count are vocab²-bounded — at 100 TB the corpus is
    * touched exactly once.
    */
  def bigramModel(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", minContextCount: Long = 50L,
                  topPerContext: Int = 3): DataFrame = {
    require(topPerContext >= 1, s"topPerContext must be >= 1, got $topPerContext")
    val pairs = df
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(tokensCol(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      // sequence(1, size-1) needs the size >= 2 guard above: Spark's
      // sequence(1, 0) yields the DESCENDING [1, 0], not an empty array
      .select(col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"))
      .select(element_at(col("__toks"), col("__i")).as("w1"),
        element_at(col("__toks"), col("__i") + 1).as("w2"))
    val wAll = Window.partitionBy(col("w1"))
    val wRank = Window.partitionBy(col("w1"))
      .orderBy(col("n").desc, col("w2"))
    pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      .withColumn("c1", sum(col("n")).over(wAll))
      .filter(col("c1") >= minContextCount)
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= topPerContext)
      .select(col("w1"), col("w2"), col("n"), col("c1"), col("rank"),
        round(col("n").cast("double") / col("c1"), 6).as("p"))
  }

  /** Interpolated Kneser-Ney bigram model (Kneser & Ney 1995; Chen &
    * Goodman 1999 — THE n-gram smoothing), the modeling upgrade over
    * [[bigramModel]]'s raw conditionals: absolute discount `d` off every
    * seen bigram, redistributed via the CONTINUATION probability — how
    * many distinct contexts a word follows, not how often it occurs
    * ("francisco" is frequent but follows only "san"; continuation
    * weighting stops it leaking into fresh contexts):
    *
    *   p_kn(w2|w1) = max(c12 − d, 0)/c1 + (d·N1+(w1,·)/c1) · N1+(·,w2)/T
    *
    * with `N1+(w1,·)` distinct successors of w1, `N1+(·,w2)` distinct
    * predecessors of w2, `T` total bigram types. Every factor is an
    * exact integer count; the formula is a fixed double tree (6 dp) —
    * engine-replayable. Plan: one (w1, w2) count shuffle; successor/
    * context stats as windows on the w1 exchange; predecessor counts as
    * one w2-keyed agg of the TYPE frame joined back; T broadcasts as a
    * one-row aggregate. All frames after the count are vocab²-bounded.
    */
  def knBigram(df: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", discount: Double = 0.75,
               minContextCount: Long = 50L,
               topPerContext: Int = 3): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    require(topPerContext >= 1, s"topPerContext must be >= 1, got $topPerContext")
    val pairs = df
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(tokensCol(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"))
      .select(element_at(col("__toks"), col("__i")).as("w1"),
        element_at(col("__toks"), col("__i") + 1).as("w2"))
    val counts = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val wAll = Window.partitionBy(col("w1"))
    val withCtx = counts
      .withColumn("c1", sum(col("c12")).over(wAll))
      .withColumn("n1p_fwd", count(lit(1)).over(wAll)) // distinct successors
    val pred = counts.groupBy(col("w2")).agg(count(lit(1)).as("n1p_back"))
    val tBig = counts.agg(count(lit(1)).as("t_types"))
    val d = lit(discount)
    val pKn = greatest(col("c12").cast("double") - d, lit(0d)) /
      col("c1").cast("double") +
      (d * col("n1p_fwd").cast("double") / col("c1").cast("double")) *
        (col("n1p_back").cast("double") / col("t_types").cast("double"))
    val wRank = Window.partitionBy(col("w1"))
      .orderBy(col("c12").desc, col("w2"))
    withCtx
      .filter(col("c1") >= minContextCount)
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= topPerContext)
      .join(pred, "w2")
      .crossJoin(broadcast(tBig))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1p_fwd"), col("n1p_back"), col("rank"),
        round(pKn, 6).as("p_kn"))
  }

  /** Per-document boilerplate share: the fraction of a doc's DISTINCT
    * `n`-gram shingles that are corpus-common (document frequency ≥
    * `minDf`) — the cross-document complement of [[repetitionFeatures]]
    * (intra-doc): template headers/footers/navigation chrome score high.
    * Shingles join as 64-bit hashes (cheap long keys, identical counts
    * w.h.p. — the q16 equivalence); ratios are exact integer ratios.
    * One df-count shuffle + one hash-keyed join; linear in corpus size.
    */
  def boilerplateShare(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", shingleSize: Int = 3,
                       minDf: Long = 5L): DataFrame = {
    // The shingle set feeds both the df count and the per-doc rollup —
    // persist the COMPACT one-row-per-doc array frame (tracked for
    // release) so the corpus is tokenized once; the explode is a cheap
    // per-row generate against the cache.
    val arrays = TrackedCaches.track(
      docs.filter(trim(col(textCol)) =!= "")
        .select(col(idCol),
          Dedup.hashedShinglesFromTokens(tokensCol(col(textCol)), shingleSize)
            .as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sh = arrays.select(col(idCol), explode(col("sh")).as("h"))
    // arrays are distinct per doc, so count(1) per hash = document freq
    val dfs = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    sh.join(dfs, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boilerplate_ratio",
        round(col("n_boiler").cast("double") / col("n_shingles"), 6))
  }

  /** Per-document keyword extraction: the `k` highest tf-idf terms of
    * each doc (idf = ln((N+1)/(df+1)), the [[termStats]] convention) —
    * the metadata-enrichment step behind tagging, routing and sparse
    * retrieval. One (doc, term) aggregation + one term-keyed df join;
    * the top-k window partitions by doc_id — millions of small groups,
    * full parallelism. Ties break by term for determinism.
    */
  def topKeywords(df: DataFrame, k: Int, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dt = docTerms(df, idCol, textCol)
    val n = df.select(countDistinct(col(idCol)).as("n_docs"))
    val dfreq = dt.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("term"))
    dt.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("__score", col("tf") *
        log((col("n_docs") + 1).cast("double") / (col("doc_freq") + 1)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"),
        round(col("__score"), 6).as("score"))
  }

  /** Corpus-level tf-idf statistics per term: total tf, document
    * frequency, idf = ln((N+1)/(df+1)), summed tf-idf weight.
    */
  def termStats(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val dt = docTerms(df, idCol, textCol)
    val n = df.select(countDistinct(col(idCol)).as("n_docs"))
    dt.groupBy(col("term"))
      .agg(sum(col("tf")).as("total_tf"), count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(n))
      .withColumn("idf", log((col("n_docs") + 1).cast("double") / (col("doc_freq") + 1)))
      .withColumn("sum_tfidf", round(col("total_tf") * col("idf"), 6))
      .drop("n_docs")
  }

  /** Cluster topic labeling via class-based TF-IDF (the BERTopic
    * weighting, Grootendorst 2022 §2.3): treat each embedding-space
    * cluster as ONE pseudo-document and surface its `m` most
    * DISTINCTIVE terms — what a corpus owner reads to learn what a
    * 100 TB partition is actually about. W(t,c) = tf(t,c) · ln(1 + A /
    * f(t)) with tf(t,c) = term count inside cluster c, f(t) = corpus-
    * wide count, A = mean tokens per cluster; unlike [[topKeywords]]
    * (per-document tf-idf) the idf-like factor dampens terms common
    * ACROSS clusters, so cluster labels separate even when every doc
    * shares a core vocabulary.
    *
    * `assign` maps `idCol` → `clusterCol` (e.g. [[KMeans.assign]]
    * renamed to the doc key). Shape at scale: docTerms' single
    * explode→partial-agg shuffle, then everything downstream lives on
    * the (cluster, term) frame — bounded by k × vocabulary (Heaps), not
    * the corpus. The top-m window partitions by cluster over that
    * vocab-bounded frame (the [[topKeywords]]/goodTuring boundedness
    * class); A arrives as a broadcast one-row frame. Exact-integer
    * divisions in double → engine-replayable scores.
    */
  def clusterTerms(docs: DataFrame, assign: DataFrame, m: Int,
                   idCol: String = "doc_id", textCol: String = "text",
                   clusterCol: String = "cluster"): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val tfc = docTerms(docs, idCol, textCol)
      .join(assign.select(col(idCol), col(clusterCol)), Seq(idCol))
      .groupBy(col(clusterCol), col("term"))
      .agg(sum(col("tf")).as("tf_c"))
    val ft = tfc.groupBy(col("term")).agg(sum(col("tf_c")).as("f_t"))
    val a = tfc.agg((sum(col("tf_c")).cast("double") /
      countDistinct(col(clusterCol)).cast("double")).as("__a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol))
      .orderBy(col("__score").desc, col("term"))
    tfc.join(ft, "term")
      .crossJoin(broadcast(a))
      .withColumn("__score", col("tf_c").cast("double") *
        log(lit(1.0) + col("__a") / col("f_t").cast("double")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= m)
      .select(col(clusterCol), col("rank"), col("term"),
        (round(col("__score"), 6) + lit(0.0)).as("score"),
        col("tf_c"), col("f_t"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, §A1.1): the
    * word- and line-level repetition/format signals the original filter
    * thresholds, plus the combined `keep` verdict. Complements
    * [[qualityFeatures]] (char-level ratios) with the WORD-level battery:
    *
    *   - `n_words`, `mean_word_len` — word count and mean word length
    *     (50 ≤ words, 3 ≤ mean ≤ 10 in the paper's defaults);
    *   - `frac_alpha_words` — fraction of words containing ≥1 letter
    *     (> 0.8 to keep);
    *   - `symbol_ratio` — (`#` + `...` occurrences) / words (< 0.1);
    *   - `bullet_ratio` / `ellipsis_ratio` — fraction of non-empty lines
    *     starting with a bullet (`- `, `* `) / ending in `...`
    *     (≤ 0.9 / ≤ 0.3).
    *
    * ASCII bullet/ellipsis forms only (the corpus is ASCII; the paper's
    * unicode variants add byte-vs-codepoint ambiguity with no coverage
    * gain here). Every ratio is an exact small-integer division →
    * bit-identical doubles across engines; per-document work only (split/
    * filter/aggregate HOFs inside WholeStageCodegen), zero shuffle — at
    * 100 TB this is a pure map stage that fuses into whatever scan feeds
    * it.
    */
  def gopherRules(df: DataFrame, textCol: String = "text",
                  minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val toks = filter(tokensCol(t), w => w =!= "")
    val lines = filter(transform(split(t, "\n", -1), l => trim(l)), l => l =!= "")
    val nWords = size(col("__toks")).cast("long")
    val nLines = size(col("__lines")).cast("long")
    val sumLen = aggregate(col("__toks"), lit(0L), (acc, w) => acc + length(w))
    val alphaWords = size(filter(col("__toks"), w => w.rlike("[a-z]"))).cast("long")
    val hashCnt = (length(t) - length(replace(t, lit("#"), lit("")))).cast("long")
    // '...' occurrences: replace() removes whole non-overlapping matches,
    // so the length delta is always a multiple of 3
    val ellCnt = ((length(t) - length(replace(t, lit("..."), lit("")))) / 3)
      .cast("long")
    val bulletLines = size(filter(col("__lines"),
      l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val ellLines = size(filter(col("__lines"), l => l.endsWith("..."))).cast("long")
    df.withColumn("__toks", toks).withColumn("__lines", lines)
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len", sumLen.cast("double") / greatest(nWords, lit(1L)))
      .withColumn("frac_alpha_words",
        alphaWords.cast("double") / greatest(nWords, lit(1L)))
      .withColumn("symbol_ratio",
        (hashCnt + ellCnt).cast("double") / greatest(nWords, lit(1L)))
      .withColumn("bullet_ratio",
        bulletLines.cast("double") / greatest(nLines, lit(1L)))
      .withColumn("ellipsis_ratio",
        ellLines.cast("double") / greatest(nLines, lit(1L)))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(3d, 10d) &&
          col("symbol_ratio") < 0.1 &&
          col("bullet_ratio") <= 0.9 &&
          col("ellipsis_ratio") <= 0.3 &&
          col("frac_alpha_words") > 0.8)
      .drop("__toks", "__lines")
  }

  /** Per-document lexical-diversity battery over the whitespace token
    * stream: `n_tokens` (N), `n_types` (V), type-token ratio V/N,
    * Simpson concentration Σc(c−1)/(N(N−1)) (the probability two tokens
    * drawn without replacement are the same type — high = repetitive),
    * and Shannon entropy −Σ(c/N)·ln(c/N) in nats (low = repetitive).
    *
    * TTR and Simpson are exact integer ratios (bit-identical across
    * engines); entropy terms are DECIMAL(28,12)-quantized before the
    * order-free sum, then rounded to 6 dp. Plan: one (doc, token)
    * hash aggregation (map-side combinable) feeding a per-doc rollup —
    * the same two-shuffle shape as tf-idf, linear at 100 TB.
    */
  def lexicalDiversity(df: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val counts = df
      .select(col(idCol), explode(tokensCol(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__c") * (col("__c") - 1L)).as("__same"))
    val p = col("__c").cast("double") / col("n_tokens").cast("double")
    val ent = counts
      .join(totals.select(col(idCol), col("n_tokens")), Seq(idCol))
      .withColumn("__t", (-p * log(p)).cast("decimal(28,12)"))
      .groupBy(col(idCol))
      .agg(round(sum(col("__t")).cast("double"), 6).as("entropy_nats"))
    totals.join(ent, Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        col("n_types").cast("double") / col("n_tokens").cast("double") as "ttr",
        when(col("n_tokens") > 1L,
          col("__same").cast("double") /
            (col("n_tokens") * (col("n_tokens") - 1L)).cast("double"))
          .as("simpson"),
        col("entropy_nats"))
  }

  /** Heaps'-law vocabulary growth per corpus slice: total tokens N,
    * vocabulary size V, and the empirical exponent ln V / ln N (Heaps
    * 1978: V ≈ K·Nᵝ, β ≈ 0.4–0.6 for natural text — a slice whose β
    * collapses toward 0 is template spam; toward 1, random noise).
    * Exact distincts via the two-level (slice, token) aggregation — no
    * count_distinct set state through the shuffle; one row per slice.
    */
  def heapsLaw(df: DataFrame, sliceCol: String = "source",
               textCol: String = "text"): DataFrame =
    df.select(col(sliceCol), explode(tokensCol(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(sliceCol), col("tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(sliceCol))
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("vocab"))
      .withColumn("heaps_exponent",
        when(col("n_tokens") > 1L,
          round(log(col("vocab").cast("double")) /
            log(col("n_tokens").cast("double")), 6)))

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    * — the MOSS scheme): hash every k-token gram, slide a window of `w`
    * consecutive gram hashes, select the minimum per window, dedup —
    * giving position-attributed fingerprints with the winnowing
    * guarantee (any shared run of ≥ w+k−1 tokens produces at least one
    * SHARED fingerprint), the local complement of [[fingerprint]]'s
    * whole-document hashes.
    *
    * Portability: gram hashes are the md5-top-64 HEX STRINGS — unsigned
    * 64-bit order IS lexicographic hex order, so the per-window min of
    * `hex || ':' || zero-padded position` is one VARCHAR min both
    * engines replay; the composite also resolves ties to the LEFTMOST
    * minimal position (documented divergence from the paper's rightmost
    * rule — a fixed deterministic choice either way). Docs with fewer
    * than `w` grams emit nothing (no full window).
    *
    * Scale shape: one corpus explode into gram rows, per-doc sliding
    * windows over millions of SMALL doc groups (the window's parallel
    * regime — never a global sort), one distinct. Output ∝ selected
    * fingerprints ≈ 2/(w+1) of gram count.
    */
  /** Token frequency-of-frequencies spectrum — N_r = how many distinct
    * tokens occur exactly r times — the Good–Turing input and the
    * standard corpus-health fingerprint (a template-heavy corpus shows
    * a depleted hapax shelf; natural text follows N_r ∝ r^−2). Two
    * map-side-combinable aggregations: (token → count), then
    * (count → token count); output ∝ distinct frequencies. `mass` is
    * the exact token-occurrence share r·N_r/N.
    */
  /** Vocabulary coverage curve: tokens ranked by corpus frequency with
    * the cumulative mass each prefix of the ranking covers — the
    * "how many vocabulary entries cover 90% / 99% of the corpus"
    * readout a tokenizer owner sizes vocabularies with (and the
    * head/tail shape a Zipf fit summarizes into one number, q).
    * Output per distinct token: `rank` (1-based, freq DESC then token),
    * `freq`, `cum_freq`, `cum_share` (6-dp).
    *
    * Scale shape: one map-side-combined token count (the corpus's only
    * shuffle), then rank + cumulative mass via the distributed prefix
    * core ([[FrameOps.orderedPrefixSum]]: one range exchange + a
    * numPartitions-bounded carry scan) — the DISTINCT-token frame is
    * VOCABULARY-scale (Heaps-bounded, billions of rows at 100 TB), not
    * the structurally-tiny distinct-frequency class
    * [[frequencySpectrum]] runs on, so a single-task `OVER ()` here
    * would be the exact ceiling the rank core exists to remove.
    */
  def vocabCoverageCurve(docs: DataFrame,
                         textCol: String = "text"): DataFrame = {
    val counts = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(tokensCol(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum(col("freq")).as("__total"))
    FrameOps.orderedPrefixSum(counts,
        Seq(col("freq").desc, col("token")), "freq", "rank", "cum_freq")
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("freq"), col("cum_freq"),
        round(col("cum_freq").cast("double") /
          col("__total").cast("double"), 6).as("cum_share"))
  }

  def frequencySpectrum(docs: DataFrame,
                        textCol: String = "text"): DataFrame = {
    val counts = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(tokensCol(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col("__tok")).agg(count(lit(1)).as("r"))
    val spectrum = counts.groupBy(col("r"))
      .agg(count(lit(1)).as("n_tokens"))
    val total = spectrum.agg(sum(col("r") * col("n_tokens")).as("__n"))
    spectrum.crossJoin(broadcast(total))
      .select(col("r"), col("n_tokens"),
        round((col("r") * col("n_tokens")).cast("double") /
          col("__n").cast("double"), 6).as("mass"))
  }

  /** Good–Turing smoothed counts r* = (r+1)·N_{r+1}/N_r over the
    * [[frequencySpectrum]] (Gale & Sampson's simple form WITHOUT the
    * log-linear regression fallback — exact spectrum ratios only, so
    * rows where N_{r+1} = 0 report null rather than an extrapolated
    * guess; the gated low-r region is where GT matters and where the
    * raw estimator is exact). `p_gt` is the smoothed probability
    * r_star / N; the output keeps the `shelfSize` SMALLEST observed
    * frequencies — relative, because an absolute cap goes vacuous on a
    * small-vocabulary corpus whose minimum count is already large.
    *
    * Scale: runs entirely on the spectrum frame (∝ distinct
    * frequencies — structurally tiny; its rank window is the bounded
    * frame), self-joined at r+1.
    */
  def goodTuring(docs: DataFrame, shelfSize: Int = 10,
                 textCol: String = "text"): DataFrame = {
    require(shelfSize >= 1, s"shelfSize must be >= 1, got $shelfSize")
    val spec = frequencySpectrum(docs, textCol)
      .select(col("r"), col("n_tokens"))
    val total = spec.agg(sum(col("r") * col("n_tokens")).as("__n"))
    val next = spec.select((col("r") - 1L).as("r"),
      col("n_tokens").as("__n_next"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("r"))
    spec.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= shelfSize).drop("__rk")
      .join(next, Seq("r"), "left")
      .crossJoin(broadcast(total))
      .select(col("r"), col("n_tokens"),
        round((col("r") + 1L).cast("double") * col("__n_next").cast("double") /
          col("n_tokens").cast("double"), 6).as("r_star"),
        round((col("r") + 1L).cast("double") * col("__n_next").cast("double") /
          col("n_tokens").cast("double") / col("__n").cast("double"), 9)
          .as("p_gt"))
  }

  /** word2phrase collocation promotion (Mikolov et al. 2013, the
    * phrase-vocabulary pass of word2vec preprocessing):
    * `score(a, b) = (c_ab − δ) · N / (c_a · c_b)` over adjacent token
    * pairs — a discounted lift; pairs above `threshold` are promoted
    * to single phrase tokens downstream. δ kills rare-pair noise.
    *
    * Exactness: all counts integers from two map-side-combinable
    * aggregations (pairs, unigrams) + a one-row total; the score is a
    * fixed double tree (counts cast before multiplication — no i64
    * overflow at any corpus size). Output: (w1, w2, n_pair, score).
    *
    * Scale: one corpus explode for pairs, one for unigrams; the
    * unigram frame is vocab-bounded, joins AQE-sized.
    */
  def phraseDetect(docs: DataFrame, threshold: Double, delta: Long = 5L,
                   textCol: String = "text"): DataFrame = {
    require(delta >= 0L, s"delta must be >= 0, got $delta")
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(tokensCol(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 1)
    val uni = toks.select(explode(col("__tk")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n"))
    val pairs = toks.filter(size(col("__tk")) >= 2)
      .select(col("__tk"),
        explode(sequence(lit(1), size(col("__tk")) - 1)).as("__i"))
      .select(element_at(col("__tk"), col("__i")).as("w1"),
        element_at(col("__tk"), col("__i") + 1).as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("__c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("__c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("score",
        (col("n_pair") - lit(delta)).cast("double") * col("n").cast("double") /
          (col("__c1").cast("double") * col("__c2").cast("double")))
      .filter(col("score") >= threshold)
      .select(col("w1"), col("w2"), col("n_pair"),
        round(col("score"), 6).as("score"))
  }

  /** Readability scores (Flesch reading ease + Flesch-Kincaid grade) —
    * the classic audience-level quality signal (used as a C4/Gopher-era
    * heuristic filter dimension): words = whitespace tokens, sentences
    * ≈ max(1, terminal-punctuation runs), syllables ≈ vowel-group runs
    * (`[aeiouy]+`) — the standard dictionary-free approximation, each
    * an exact integer count from one regexp scan, feeding fixed double
    * trees. Pure map stage, zero shuffle; empty/wordless docs are
    * excluded.
    */
  def readability(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val words = size(tokensCol(col(textCol)))
    val sents = greatest(lit(1),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))))
    val sylls = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0)))
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), words.cast("long").as("n_words"),
        sents.cast("long").as("n_sentences"),
        sylls.cast("long").as("n_syllables"))
      .filter(col("n_words") > 0L)
      .withColumn("fk_grade",
        round(lit(0.39) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) +
          lit(11.8) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")) - lit(15.59), 6))
      .withColumn("flesch_ease",
        round(lit(206.835) - lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")), 6))
  }

  /** Dictionary keyword tagging — the taxonomy labeler of a curation
    * pipeline ("which docs mention finance/medical/legal terms"):
    * documents are tagged with every tag whose term list intersects
    * their token set. Relational, not per-row scanning: one distinct
    * (doc, token) frame equi-joined to the (term, tag) dictionary —
    * the dictionary side is structurally small (a curated taxonomy),
    * AQE broadcasts it; no regex alternation blowup, no UDF.
    *
    * Output: (idCol, tags — comma-joined sorted distinct,
    * n_matched_terms — distinct matching terms). Docs with no match
    * are absent (inner join — the tagged subset IS the result).
    */
  def tagKeywords(docs: DataFrame, dictionary: Seq[(String, String)],
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(dictionary.nonEmpty, "dictionary must not be empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = dictionary.toDF("__term", "__tag")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(tokensCol(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .distinct()
      .join(dict, col("__tok") === col("__term"))
      .groupBy(col(idCol))
      .agg(concat_ws(",", array_sort(collect_set(col("__tag")))).as("tags"),
        countDistinct(col("__term")).as("n_matched_terms"))
  }

  def winnowFingerprints(docs: DataFrame, k: Int = 4, w: Int = 4,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val grams = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), tokensCol(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= k)
      .select(col(idCol), col("__tk"),
        explode(sequence(lit(1), size(col("__tk")) - (k - 1))).as("pos"))
      .select(col(idCol), col("pos"),
        (size(col("__tk")) - (k - 1)).as("__g"),
        substring(md5(concat_ws(" ",
          slice(col("__tk"), col("pos"), lit(k))).cast("binary")), 1, 16)
          .as("__h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("__sel",
        min(concat(col("__h"), lit(":"),
          lpad(col("pos").cast("string"), 8, "0"))).over(win))
      .filter(col("pos") <= col("__g") - (w - 1)) // full windows only
      .select(col(idCol), col("__sel")).distinct()
      .select(col(idCol),
        substring(col("__sel"), 18, 8).cast("int").as("pos"),
        substring(col("__sel"), 1, 16).as("fingerprint"))
  }
}
