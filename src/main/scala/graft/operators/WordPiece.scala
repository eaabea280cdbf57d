package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WordPiece tokenizer: greedy longest-match-first subword encoding
  * with the `##` continuation convention — the third classical subword
  * family next to BPE ([[Bpe]]) and unigram-LM ([[UnigramLm]]).
  *
  * Vocabulary: word-INITIAL pieces keep their surface form, word-
  * INTERNAL pieces carry the `##` prefix (so "hashing" might encode as
  * `hash ##ing`). The vocabulary is every single-character form (both
  * positions — the coverage floor that keeps every corpus word
  * segmentable, WordPiece's UNK-free condition on its own training
  * corpus) plus the `topK` most frequent multi-character forms by
  * frequency-weighted occurrence count (ties to the lexicographically
  * smaller form). Dense `token_id`s rank the union by (cnt desc, form).
  *
  * Encoding is the canonical WordPiece inference loop: at each
  * position take the LONGEST vocabulary piece starting there, emit it,
  * jump past it. Unlike BPE (merge order) and unigram (Viterbi), the
  * segmentation is fully determined by vocabulary membership — at a
  * fixed position every candidate length yields a distinct form, so
  * argmax-by-length needs no tie-break.
  *
  * Scale design (100 TB): everything model-side runs on the DISTINCT-
  * word frame (Heaps-bounded). The greedy loop is ROW-LOCAL — each
  * word's in-vocabulary candidate pieces are collected into one array
  * column (one join + groupBy) and the cursor walk runs inside a
  * single higher-order `aggregate` expression: zero shuffles per
  * position, no driver state. Corpus-scale work is exactly one
  * word-key join of the token stream to the segmentation frame plus
  * the doc-partitioned position window (doc-length-bounded groups).
  * Dense ids come from the rank core ([[Ranking.rangeRank]]), never a
  * one-task `OVER ()`.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no tokenizer; this extends the mandated tokenizer family
  * (SURVEY §2B4).
  */
object WordPiece {

  /** Candidate-occurrence frame over the model words: one row per
    * (word, start `i` 1-based, len `l`) substring occurrence with its
    * positional FORM (`##`-prefixed unless word-initial).
    */
  private def occurrences(wf: DataFrame, maxPieceLen: Int): DataFrame =
    wf.select(col("word"), col("freq"),
        explode(expr("sequence(1, length(word))")).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(expr(
          s"sequence(1, least($maxPieceLen, length(word) - i + 1))")).as("l"))
      .withColumn("form",
        concat(when(col("i") === 1, lit("")).otherwise(lit("##")),
          expr("substring(word, i, l)")))

  /** Model words: the (word, freq) frame, length-capped and
    * checkpointed ONCE — every downstream pass (vocab counts, rank
    * core, greedy walk) reads the checkpoint instead of replaying the
    * corpus explode (the rank core makes several passes).
    */
  private def modelWords(docs: DataFrame, maxWordLen: Int,
                         textCol: String): DataFrame =
    Bpe.wordFreqs(docs, textCol)
      .filter(length(col("word")) <= maxWordLen)
      .localCheckpoint()

  // Train-once memo (the UnigramLm frame-state pattern): (word frame,
  // vocab frame) keyed by (input plan, params) — q275/q276/q288 ask
  // for the same build. Checkpointed frames (executor-side), bounded,
  // swept by TrackedCaches; cross-query hits flag the bench row warm.
  private val memoBound = 4
  private val buildMemo = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Int, Int, Int, String), ((DataFrame, DataFrame), Long)]
  TrackedCaches.onRelease(() => buildMemo.synchronized(buildMemo.clear()))

  /** Memoized (modelWords, vocabCore) build for one corpus + params. */
  private def built(docs: DataFrame, maxPieceLen: Int, maxWordLen: Int,
                    topK: Int, textCol: String): (DataFrame, DataFrame) = {
    val memoKey = (docs.queryExecution.analyzed.canonicalized,
      maxPieceLen, maxWordLen, topK, textCol)
    val hit = buildMemo.synchronized(buildMemo.get(memoKey))
    hit match {
      case Some((frames, trainedEpoch)) =>
        if (trainedEpoch < TrackedCaches.currentQueryEpoch)
          TrackedCaches.noteMemoReuse()
        return frames
      case None => ()
    }
    val wf = modelWords(docs, maxWordLen, textCol)
    val frames = (wf, vocabCore(wf, maxPieceLen, topK))
    // jobs already ran; epoch read before the lock (ABBA lesson)
    val epoch = TrackedCaches.currentQueryEpoch
    buildMemo.synchronized {
      if (buildMemo.size >= memoBound) buildMemo -= buildMemo.head._1
      buildMemo(memoKey) = (frames, epoch)
    }
    frames
  }

  /** Internal: the fitted vocabulary — `(form, cnt, is_char)` rows,
    * every single-character form plus the top-`topK` multi-character
    * forms by (cnt desc, form). `l` is carried so "single-character"
    * means core length 1, not form length.
    */
  private def vocabCore(wf: DataFrame, maxPieceLen: Int,
                        topK: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(topK >= 0, s"topK must be >= 0, got $topK")
    // vocabulary-scale (Heaps-bounded); checkpointed because the rank
    // core below multi-passes it
    val counts = occurrences(wf, maxPieceLen)
      .groupBy(col("form"), (col("l") === 1).as("is_char"))
      .agg(sum(col("freq")).as("cnt"))
      .localCheckpoint()
    val chars = counts.filter(col("is_char"))
    val multi = Ranking.rangeRank(counts.filter(!col("is_char"))
          .withColumn("__nc", -col("cnt")),
        Nil, Seq("__nc", "form"), "rn")
      .filter(col("rn") <= topK)
      .select(col("form"), col("is_char"), col("cnt"))
    chars.select(col("form"), col("is_char"), col("cnt")).union(multi)
      .localCheckpoint()
  }

  private def checkBounds(maxPieceLen: Int, maxWordLen: Int): Unit =
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
      s"bad piece/word bounds ($maxPieceLen, $maxWordLen)")

  private def idsFrame(vocabF: DataFrame): DataFrame =
    Ranking.rangeRank(vocabF.withColumn("__nc", -col("cnt")),
        Nil, Seq("__nc", "form"), "token_id")
      .select(col("token_id").cast("long").as("token_id"),
        col("form"), col("cnt"))

  /** The fitted vocabulary with dense ids: `(token_id, form, cnt)`,
    * ranked by (cnt desc, form) over the char-floor ∪ top-K union.
    */
  def vocab(docs: DataFrame, maxPieceLen: Int = 4, maxWordLen: Int = 12,
            topK: Int = 40, textCol: String = "text"): DataFrame = {
    checkBounds(maxPieceLen, maxWordLen)
    idsFrame(built(docs, maxPieceLen, maxWordLen, topK, textCol)._2)
  }

  /** Row-local greedy longest-match walk: the accumulator is the
    * cursor (pos, path); step `j` only acts when the cursor sits at
    * `j`, where it consumes the longest in-vocabulary piece starting
    * there (unique per length — no tie-break needed; the single-char
    * floor guarantees one always exists).
    */
  private val greedyExpr = """
    aggregate(
      sequence(1, length(word)),
      named_struct('pos', 1, 'path', ''),
      (acc, j) -> IF(acc.pos != j, acc,
        named_struct(
          'pos', acc.pos + element_at(array_sort(
            filter(parr, p -> p.i = j),
            (a, b) -> CASE WHEN a.l > b.l THEN -1
                           WHEN a.l < b.l THEN 1 ELSE 0 END), 1).l,
          'path', concat(acc.path, ' ', element_at(array_sort(
            filter(parr, p -> p.i = j),
            (a, b) -> CASE WHEN a.l > b.l THEN -1
                           WHEN a.l < b.l THEN 1 ELSE 0 END), 1).form))),
      acc -> ltrim(acc.path))"""

  /** Per-distinct-word greedy segmentation under the corpus's own
    * vocabulary: `(word, freq, segmentation, n_pieces)`.
    */
  def segmentation(docs: DataFrame, maxPieceLen: Int = 4,
                   maxWordLen: Int = 12, topK: Int = 40,
                   textCol: String = "text"): DataFrame = {
    checkBounds(maxPieceLen, maxWordLen)
    val (wf, vocabF) = built(docs, maxPieceLen, maxWordLen, topK, textCol)
    segCore(wf, vocabF, maxPieceLen)
  }

  private def segCore(wf: DataFrame, vocabF: DataFrame,
                      maxPieceLen: Int): DataFrame =
    occurrences(wf, maxPieceLen)
      .join(vocabF.select(col("form")), Seq("form"))
      .groupBy(col("word"), col("freq"))
      .agg(collect_list(struct(col("i"), col("l"), col("form"))).as("parr"))
      .withColumn("segmentation", expr(greedyExpr))
      .select(col("word"), col("freq"), col("segmentation"),
        size(split(col("segmentation"), " ")).cast("long").as("n_pieces"))

  /** Vocab-size (top-K) compression curve — the WordPiece twin of the
    * BPE merge sweep. The top-K multi-character sets are NESTED
    * (prefixes of one (cnt desc, form) ranked list), so ONE build at
    * `ks.max` serves every sweep point: smaller vocabularies are
    * rank-filters of the one ranked frame, never re-counts. Per K, one
    * greedy walk over the distinct-word frame re-segments; readout
    * `(top_k, n_vocab, n_tokens, vocab_used)` with `n_tokens` the
    * corpus token count (Σ freq·pieces ≡ counting the id stream). The
    * single-char floor keeps every K's walk total.
    */
  def topKSweep(docs: DataFrame, ks: Seq[Int], maxPieceLen: Int = 4,
                maxWordLen: Int = 12, textCol: String = "text"): DataFrame = {
    checkBounds(maxPieceLen, maxWordLen)
    require(ks.nonEmpty && ks.forall(_ >= 0) && ks.distinct.size == ks.size,
      s"ks must be non-empty, distinct, >= 0: got $ks")
    val (wf, vocabF) = built(docs, maxPieceLen, maxWordLen, ks.max, textCol)
    val chars = vocabF.filter(col("is_char"))
      .select(col("form"), col("is_char"), col("cnt"))
    // rank the kept multi forms; the prefix property makes this the
    // same rank they hold in the full multi list
    val ranked = Ranking.rangeRank(vocabF.filter(!col("is_char"))
          .withColumn("__nc", -col("cnt")),
        Nil, Seq("__nc", "form"), "__rk")
      .select(col("form"), col("is_char"), col("cnt"), col("__rk"))
      .localCheckpoint()
    ks.map { k =>
      val vk = chars.union(
        ranked.filter(col("__rk") <= k.toLong).drop("__rk"))
      val seg = segCore(wf, vk, maxPieceLen)
      seg.select(col("freq"),
          explode(split(col("segmentation"), " ")).as("form"))
        .agg(sum(col("freq")).as("n_tokens"),
          countDistinct(col("form")).as("vocab_used"))
        .crossJoin(vk.agg(count(lit(1)).as("n_vocab")))
        .select(lit(k.toLong).as("top_k"), col("n_vocab"),
          col("n_tokens"), col("vocab_used"))
    }.reduce(_ union _)
  }

  /** Tokenize the corpus to dense ids: `(idCol, pos, piece, token_id)`,
    * `pos` 0-based per document — the WordPiece twin of
    * [[Bpe.encodeIds]] / [[UnigramLm.encodeIds]]. Per-DISTINCT-word
    * segmentation joined back on the word key; the only corpus-row
    * window is the doc-partitioned position rank.
    */
  def encodeIds(docs: DataFrame, maxPieceLen: Int = 4,
                maxWordLen: Int = 12, topK: Int = 40,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    checkBounds(maxPieceLen, maxWordLen)
    val (wf, vocabF) = built(docs, maxPieceLen, maxWordLen, topK, textCol)
    val ids = idsFrame(vocabF)
    val seg = segCore(wf, vocabF, maxPieceLen)
    val words = graft.operators.FrameOps.parallelized(docs)
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(TextAnalysis.tokensCol(col(textCol)))
          .as(Seq("wpos", "word")))
      .filter(col("word").rlike(Bpe.WordRe) &&
        length(col("word")) <= maxWordLen)
    val wordPieces = seg.select(col("word"),
      posexplode(split(col("segmentation"), " ")).as(Seq("spos", "piece")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("wpos"), col("spos"))
    words.join(wordPieces, Seq("word"))
      .select(col(idCol), col("wpos"), col("spos"), col("piece"))
      .select(col(idCol),
        (row_number().over(w) - 1).cast("long").as("pos"), col("piece"))
      .join(ids.select(col("form").as("piece"), col("token_id")),
        Seq("piece"))
      .select(col(idCol), col("pos"), col("piece"), col("token_id"))
  }

  /** Decode an [[encodeIds]] stream back to text through the
    * vocabulary's id→form map (ids alone must suffice — the
    * round-trip gate's point). The `##` continuation prefix IS the
    * word-boundary signal: joining forms with single spaces and
    * erasing every `" ##"` reattaches continuations to their word —
    * exact because forms are `[a-z0-9]`-cored, so `" ##"` can only
    * occur as an injected separator + continuation marker. One
    * token_id join + one per-doc order-free sorted-struct agg
    * (doc-length-bounded groups).
    */
  def decodeIds(ids: DataFrame, vocab: DataFrame,
                idCol: String = "doc_id"): DataFrame =
    ids.join(vocab.select(col("token_id"), col("form").as("__f")),
        Seq("token_id"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos").as("p"),
        col("__f").as("s")))).as("__fs"))
      .select(col(idCol),
        regexp_replace(
          array_join(expr("transform(__fs, x -> x.s)"), " "),
          " ##", "").as("decoded"))
}
