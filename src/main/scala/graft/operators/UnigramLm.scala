package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (SentencePiece-flavored), deterministic hard-EM.
  *
  * The second classical subword-tokenizer family next to BPE
  * ([[Bpe]]): instead of greedy pair merges, a unigram language model
  * over a FIXED candidate-piece set (all substrings of model words up
  * to `maxPieceLen`), refined by hard EM —
  *
  *   - E-step: Viterbi-segment every distinct word under the current
  *     piece log-probabilities (maximize the sum of piece log-probs;
  *     ties break to the lexicographically smallest path).
  *   - M-step: re-estimate piece probabilities from the frequency-
  *     weighted segmentation counts, add-one smoothed over the fixed
  *     candidate set (so no piece's probability ever reaches zero and
  *     every word stays segmentable).
  *
  * Initial probabilities come from overlap-inflated raw substring
  * counts (every occurrence of every substring counts); the first
  * M-step is therefore the big correction — from "how often does this
  * piece APPEAR" to "how often is it USED". All probabilities are
  * ln-transformed once and quantized to DECIMAL(28,12) (the house
  * cross-engine exactness pattern: one rounding per piece per
  * iteration, decimal-exact sums inside the DP), so the whole chain
  * replays bit-identically in the DuckDB oracle.
  *
  * Scale design (100 TB): everything runs over the DISTINCT-word frame
  * (Heaps-bounded, orders of magnitude below corpus size). The Viterbi
  * DP is ROW-LOCAL — each word's candidate pieces are assembled into
  * one array column (one piece-table join + groupBy per E-step) and
  * the DP runs inside a single higher-order `aggregate` expression:
  * zero shuffles per DP position, no driver-side per-word state. Each
  * EM iteration is 3 vocabulary-scale shuffles (piece join, recount,
  * smoothing), `localCheckpoint` between iterations truncates lineage
  * (the PageRank lesson). Words longer than `maxWordLen` are excluded
  * from the model (documented contract, mirrored by the oracle) so the
  * oracle's position-unrolled DP stays bounded.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no tokenizer; this extends the mandated tokenizer family
  * (SURVEY §2B4) beyond BPE.
  */
object UnigramLm {

  /** Candidate-piece occurrence frame over the model words: one row
    * per (word, start, len) substring occurrence, `i` 1-based.
    */
  private def pieces(wf: DataFrame, maxPieceLen: Int): DataFrame =
    wf.select(col("word"), col("freq"),
        explode(expr("sequence(1, length(word))")).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(expr(
          s"sequence(1, least($maxPieceLen, length(word) - i + 1))")).as("l"))
      .withColumn("piece", expr("substring(word, i, l)"))

  /** Add-one-smoothed piece log-probabilities over the fixed candidate
    * set: lp = ln((cnt + 1) / (total + |candidates|)), quantized to
    * DECIMAL(28,12). `tot` is a one-row aggregate (parameter-bounded
    * broadcast, PlanAudit-allowlisted).
    */
  private def logProbs(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("cnt")).as("tot"),
      count(lit(1)).as("np"))
    counts.crossJoin(broadcast(tot))
      .select(col("piece"),
        expr("CAST(ln(CAST(cnt + 1 AS DOUBLE) / CAST(tot + np AS DOUBLE))" +
          " AS DECIMAL(28,12))").as("lp"))
  }

  /** Row-local Viterbi DP: the accumulator is the best-(score, path)
    * array over word positions 0..len; candidates at position j are the
    * pieces ending there, each extending the best prefix at its start.
    * Max score wins, ties break to the lexicographically smallest path
    * (the array_sort comparator — mirrored by the oracle's
    * `ORDER BY score DESC, path` window). Scores re-quantize to
    * DECIMAL(28,12) each step so the decimal type never widens.
    */
  private val dpExpr = """
    aggregate(
      sequence(1, length(word)),
      array(named_struct('score', CAST(0 AS DECIMAL(28,12)), 'path', '')),
      (acc, j) -> array_append(acc,
        element_at(
          array_sort(
            transform(
              filter(parr, p -> p.i + p.l - 1 = j),
              p -> named_struct(
                'score', CAST(element_at(acc, p.i).score + p.lp
                              AS DECIMAL(28,12)),
                'path', concat(element_at(acc, p.i).path, ' ', p.piece))),
            (a, b) -> CASE WHEN a.score > b.score THEN -1
                           WHEN a.score < b.score THEN 1
                           WHEN a.path < b.path THEN -1
                           WHEN a.path > b.path THEN 1 ELSE 0 END),
          1)),
      acc -> element_at(acc, length(word) + 1))"""

  /** E-step: segment every model word under `lp`. Output:
    * (word, freq, segmentation, score, n_pieces).
    */
  private def viterbi(pcs: DataFrame, lp: DataFrame): DataFrame =
    pcs.join(lp, Seq("piece"))
      .groupBy(col("word"), col("freq"))
      .agg(collect_list(
        struct(col("i"), col("l"), col("piece"), col("lp"))).as("parr"))
      .withColumn("fin", expr(dpExpr))
      .select(col("word"), col("freq"),
        ltrim(col("fin.path")).as("segmentation"),
        col("fin.score").as("score"))
      .withColumn("n_pieces",
        size(split(col("segmentation"), " ")).cast("long"))

  /** M-step counts: frequency-weighted piece usage over the
    * segmentations, zero-filled over the full candidate set.
    */
  private def recount(seg: DataFrame, candidates: DataFrame): DataFrame = {
    val used = seg.select(col("freq"),
        explode(split(col("segmentation"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("used"))
    candidates.join(used, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("used"), lit(0L)).as("cnt"))
  }

  // Train-once memo (the KMeans/Bpe fitMemo pattern lifted to frame
  // state): the EM chain is deterministic in (input plan, params), and
  // a battery asks for the SAME fit from q269/q270/q271/q272/q288 —
  // five EM chains where one serves. Values are the localCheckpoint'ed
  // frames (executor-side storage; the driver holds only plan
  // references, so this stays within the no-driver-data rule — unlike
  // KMeans' k-row collects, the unigram model is vocab-scale and is
  // NEVER collected). Bounded LinkedHashMap, swept by TrackedCaches so
  // COLD benches retrain per query; cross-query hits flag the bench
  // row warm.
  private val memoBound = 4
  private val fitMemo = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Int, Int, Int, String), ((DataFrame, DataFrame, DataFrame), Long)]
  TrackedCaches.onRelease(() => fitMemo.synchronized(fitMemo.clear()))

  /** Internal fit: runs the EM chain and returns
    * (candidate counts c0, final log-probs, final segmentation frame).
    */
  private def fitted(docs: DataFrame, maxPieceLen: Int, maxWordLen: Int,
                     iterations: Int, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
      s"bad piece/word bounds ($maxPieceLen, $maxWordLen)")
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val memoKey = (docs.queryExecution.analyzed.canonicalized,
      maxPieceLen, maxWordLen, iterations, textCol)
    val hit = fitMemo.synchronized(fitMemo.get(memoKey))
    hit match {
      case Some((frames, trainedEpoch)) =>
        if (trainedEpoch < TrackedCaches.currentQueryEpoch)
          TrackedCaches.noteMemoReuse()
        return frames
      case None => ()
    }
    val wf = Bpe.wordFreqs(docs, textCol)
      .filter(length(col("word")) <= maxWordLen)
    val pcs = pieces(wf, maxPieceLen).localCheckpoint()
    val c0 = pcs.groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt")).localCheckpoint()
    var lp = logProbs(c0).localCheckpoint()
    for (_ <- 1 to iterations) {
      val seg = viterbi(pcs, lp)
      lp = logProbs(recount(seg, c0.select(col("piece"))))
        .localCheckpoint()
    }
    val frames = (c0, lp, viterbi(pcs, lp).localCheckpoint())
    // jobs above already ran; read the epoch into a local BEFORE taking
    // the memo lock (the KMeans ABBA-deadlock lesson: release() holds
    // the TrackedCaches lock while invoking the onRelease hook)
    val epoch = TrackedCaches.currentQueryEpoch
    fitMemo.synchronized {
      if (fitMemo.size >= memoBound) fitMemo -= fitMemo.head._1
      fitMemo(memoKey) = (frames, epoch)
    }
    frames
  }

  /** Fit the model: returns (final segmentation frame, final piece
    * counts + log-probs). `iterations` EM rounds, then one final
    * E-step under the last probabilities. The returned counts are the
    * usage counts of the FINAL segmentation (a last M-count, purely
    * reporting) with the final lp joined — so a gate on them pins the
    * whole E/M chain, not just the DP.
    */
  def fit(docs: DataFrame, maxPieceLen: Int = 4, maxWordLen: Int = 12,
          iterations: Int = 2,
          textCol: String = "text"): (DataFrame, DataFrame) = {
    val (c0, lp, segFinal) =
      fitted(docs, maxPieceLen, maxWordLen, iterations, textCol)
    // vocab-scale frame: rank via the distributed rank core, not a
    // single-task OVER () — the same refusal modelFrame makes below
    val vocab = Ranking.rangeRank(
        recount(segFinal, c0.select(col("piece")))
          .filter(col("cnt") > 0)
          .join(lp, Seq("piece"))
          .withColumn("__nc", -col("cnt")),
        Nil, Seq("__nc", "piece"), "rank")
      .select(col("rank").cast("long").as("rank"), col("piece"), col("cnt"),
        round(col("lp").cast("double"), 6).as("lp6"))
    (segFinal, vocab)
  }

  /** Final per-word segmentation view for the gate: score exposed as a
    * 6-dp double (the decimal itself would hash-differ on formatting).
    */
  def segmentation(docs: DataFrame, maxPieceLen: Int = 4,
                   maxWordLen: Int = 12, iterations: Int = 2,
                   textCol: String = "text"): DataFrame =
    fit(docs, maxPieceLen, maxWordLen, iterations, textCol)._1
      .select(col("word"), col("freq"), col("segmentation"),
        col("n_pieces"), round(col("score").cast("double"), 6).as("score6"))

  /** Final piece vocabulary (usage count + smoothed log-prob, ranked by
    * count desc then piece).
    */
  def vocab(docs: DataFrame, maxPieceLen: Int = 4, maxWordLen: Int = 12,
            iterations: Int = 2, textCol: String = "text"): DataFrame =
    fit(docs, maxPieceLen, maxWordLen, iterations, textCol)._2

  /** The model state for train-once / apply-anywhere: the FULL
    * candidate-piece frame — `(token_id, piece, cnt, lp)` — with final
    * usage counts, the exact DECIMAL(28,12) log-probs (they survive
    * parquet bit-exact, so a loaded model segments byte-identically),
    * and dense token ids ranked by (cnt desc, piece). Zero-count pieces
    * stay IN the model (tail ids): add-one smoothing keeps them alive,
    * and they are what lets an unseen apply-batch word segment at all.
    * Restricted to used pieces the ids coincide with [[vocab]]'s rank.
    *
    * Ids are assigned with the rank core ([[Ranking.rangeRank]]), not a
    * global window: the candidate frame is sublinear in the corpus
    * (Heaps-bounded distinct words × ≤ maxPieceLen·maxWordLen pieces)
    * but still far too large for a one-task `OVER ()` at 100 TB.
    */
  def model(docs: DataFrame, maxPieceLen: Int = 4, maxWordLen: Int = 12,
            iterations: Int = 2, textCol: String = "text"): DataFrame =
    modelOf(docs, maxPieceLen, maxWordLen, iterations, textCol)

  // Checkpointed-model memo next to fitMemo: the ranked model frame is
  // derived from the memoized fit by a vocab-scale recount + rangeRank,
  // but every caller re-ran those jobs per invocation — and the decode
  // round-trip query invokes model() AND encodeIdsMarked() over the same
  // corpus, i.e. twice in ONE query. Same key/bound/epoch discipline as
  // fitMemo; same executor-side-frames-only storage.
  private val modelMemo = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Int, Int, Int, String), (DataFrame, Long)]
  TrackedCaches.onRelease(() => modelMemo.synchronized(modelMemo.clear()))

  private def modelOf(docs: DataFrame, maxPieceLen: Int, maxWordLen: Int,
                      iterations: Int, textCol: String): DataFrame = {
    val memoKey = (docs.queryExecution.analyzed.canonicalized,
      maxPieceLen, maxWordLen, iterations, textCol)
    modelMemo.synchronized(modelMemo.get(memoKey)) match {
      case Some((m, trainedEpoch)) =>
        if (trainedEpoch < TrackedCaches.currentQueryEpoch)
          TrackedCaches.noteMemoReuse()
        return m
      case None => ()
    }
    val (c0, lp, segFinal) =
      fitted(docs, maxPieceLen, maxWordLen, iterations, textCol)
    val m = modelFrame(c0, lp, segFinal).localCheckpoint()
    val epoch = TrackedCaches.currentQueryEpoch
    modelMemo.synchronized {
      if (modelMemo.size >= memoBound) modelMemo -= modelMemo.head._1
      modelMemo(memoKey) = (m, epoch)
    }
    m
  }

  private def modelFrame(c0: DataFrame, lp: DataFrame,
                         segFinal: DataFrame): DataFrame = {
    val full = recount(segFinal, c0.select(col("piece")))
      .join(lp, Seq("piece"))
    Ranking.rangeRank(full.withColumn("__nc", -col("cnt")),
        Nil, Seq("__nc", "piece"), "token_id")
      .select(col("token_id").cast("long").as("token_id"),
        col("piece"), col("cnt"), col("lp"))
  }

  /** Persist / load the model frame. The k rows ARE the tokenizer:
    * loading them back and calling [[encodeIdsWithModel]] reproduces
    * the trainer's segmentations and ids byte-for-byte with zero
    * EM jobs.
    */
  def writeModel(model: DataFrame, dir: String): Unit =
    model.write.mode("overwrite").parquet(dir)

  def readModel(spark: org.apache.spark.sql.SparkSession,
                dir: String): DataFrame =
    spark.read.parquet(dir)

  /** [[viterbi]] under a LOADED model, guarded for coverage: a word
    * containing a character outside the model's alphabet has no DP
    * path (every model piece is a substring of a training word, so an
    * unknown character can appear in no piece) — such words surface
    * with a null segmentation (the UNK contract) instead of an ANSI
    * empty-array error. Coverage ⟺ every position has its single-char
    * piece in the model, the SentencePiece UNK condition exactly.
    */
  private def viterbiGuarded(pcs: DataFrame, lp: DataFrame): DataFrame =
    pcs.join(lp, Seq("piece"))
      .groupBy(col("word"), col("freq"))
      .agg(collect_list(
        struct(col("i"), col("l"), col("piece"), col("lp"))).as("parr"))
      .withColumn("covered", expr(
        "forall(sequence(1, length(word))," +
          " j -> exists(parr, p -> p.l = 1 AND p.i = j))"))
      .withColumn("fin", when(col("covered"), expr(dpExpr)))
      .select(col("word"),
        when(col("covered"), ltrim(col("fin.path"))).as("segmentation"))

  /** Tokenize the corpus to dense ids under its own fitted model —
    * the unigram twin of [[Bpe.encodeIds]]: `(idCol, pos, piece,
    * token_id)`, `pos` 0-based per document over (word, piece)
    * position. Per-DISTINCT-word segmentation joined back on the word
    * key; the only corpus-row window is the doc-partitioned position
    * rank (doc-length-bounded groups).
    */
  def encodeIds(docs: DataFrame, maxPieceLen: Int = 4,
                maxWordLen: Int = 12, iterations: Int = 2,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    encodeIdsMarked(docs, maxPieceLen, maxWordLen, iterations, idCol,
      textCol).drop("wpos")

  /** Tokenize a batch under a persisted model — one guarded Viterbi
    * pass, zero EM jobs. Words whose characters all lie in the model
    * alphabet segment and id exactly as the trainer would; a word with
    * an out-of-alphabet character contributes ONE position with null
    * piece/token_id (the UNK token), so OOV can never silently
    * renumber a document. `maxPieceLen`/`maxWordLen` must be ≥ the
    * trained values (larger only wastes candidate rows — the model
    * join discards pieces it never saw).
    */
  def encodeIdsWithModel(docs: DataFrame, model: DataFrame,
                         maxPieceLen: Int = 4, maxWordLen: Int = 12,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val wf = Bpe.wordFreqs(docs, textCol)
      .filter(length(col("word")) <= maxWordLen)
    val seg = viterbiGuarded(pieces(wf, maxPieceLen),
      model.select(col("piece"), col("lp")))
    encodeCore(docs, seg, model, maxWordLen, idCol, textCol).drop("wpos")
  }

  private def encodeCore(docs: DataFrame, seg: DataFrame, model: DataFrame,
                         maxWordLen: Int, idCol: String,
                         textCol: String): DataFrame = {
    val words = graft.operators.FrameOps.parallelized(docs)
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(TextAnalysis.tokensCol(col(textCol)))
          .as(Seq("wpos", "word")))
      .filter(col("word").rlike(Bpe.WordRe) &&
        length(col("word")) <= maxWordLen)
    // posexplode_outer: an UNK word (null segmentation) keeps exactly
    // one (null piece) row so its position survives
    val wordPieces = seg.select(col("word"),
      posexplode_outer(split(col("segmentation"), " "))
        .as(Seq("spos", "piece")))
      .withColumn("spos", coalesce(col("spos"), lit(0)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("wpos"), col("spos"))
    words.join(wordPieces, Seq("word"))
      .select(col(idCol), col("wpos"), col("spos"), col("piece"))
      .select(col(idCol), col("wpos").cast("long").as("wpos"),
        (row_number().over(w) - 1).cast("long").as("pos"), col("piece"))
      .join(model.select(col("piece"), col("token_id")),
        Seq("piece"), "left")
      .select(col(idCol), col("wpos"), col("pos"), col("piece"),
        col("token_id"))
  }

  /** Vocab-size compression curve — the unigram twin of the BPE merge
    * sweep: the ONE fitted model (memoized; every sweep point shares
    * it) pruned to its top-`V` pieces by the model's (cnt desc, piece)
    * rank, KEEPING every single-character piece so coverage survives
    * (the SentencePiece pruning constraint), each pruned vocabulary
    * re-smoothed with the same add-one formula over its own support,
    * and ONE guarded Viterbi pass per V re-segmenting the
    * distinct-word frame. Output per V: `(vocab_size, n_kept,
    * n_tokens, vocab_used)` — requested cut, actual kept count (char
    * floor included), corpus token count (Σ freq·pieces — identical
    * to counting the id stream), distinct pieces actually used.
    *
    * Scale: the EM chain runs once (memo); per sweep point only a
    * vocab-scale filter + smooth and one distinct-word DP pass — no
    * per-V corpus scan (`wf`/`pcs` are checkpointed once).
    */
  def vocabSweep(docs: DataFrame, sizes: Seq[Int], maxPieceLen: Int = 4,
                 maxWordLen: Int = 12, iterations: Int = 2,
                 textCol: String = "text"): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1) &&
        sizes.distinct.size == sizes.size,
      s"sizes must be non-empty, distinct, >= 1: got $sizes")
    val m = modelOf(docs, maxPieceLen, maxWordLen, iterations, textCol)
    val wf = Bpe.wordFreqs(docs, textCol)
      .filter(length(col("word")) <= maxWordLen).localCheckpoint()
    val pcs = pieces(wf, maxPieceLen).localCheckpoint()
    sizes.map { v =>
      val kept = m.filter(col("token_id") <= v.toLong ||
        length(col("piece")) === 1)
      val seg = viterbiGuarded(pcs,
        logProbs(kept.select(col("piece"), col("cnt"))))
      seg.join(wf, Seq("word"))
        .select(col("freq"),
          explode(split(col("segmentation"), " ")).as("piece"))
        .agg(sum(col("freq")).as("n_tokens"),
          countDistinct(col("piece")).as("vocab_used"))
        .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
        .select(lit(v.toLong).as("vocab_size"), col("n_kept"),
          col("n_tokens"), col("vocab_used"))
    }.reduce(_ union _)
  }

  /** [[encodeIds]] plus the word index (`wpos`) each piece came from —
    * the boundary signal [[decodeIds]] needs. Unigram pieces are bare
    * substrings (no `</w>` / `##` marker), so word boundaries are NOT
    * recoverable from the flat piece stream alone; SentencePiece's ▁
    * marker plays this role upstream, and here the explicit column
    * does (the trained piece inventory — and so every gated id — stays
    * untouched).
    */
  def encodeIdsMarked(docs: DataFrame, maxPieceLen: Int = 4,
                      maxWordLen: Int = 12, iterations: Int = 2,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val (_, _, segFinal) =
      fitted(docs, maxPieceLen, maxWordLen, iterations, textCol)
    encodeCore(docs, segFinal.select(col("word"), col("segmentation")),
      modelOf(docs, maxPieceLen, maxWordLen, iterations, textCol),
      maxWordLen, idCol, textCol)
  }

  /** Decode an [[encodeIdsMarked]] stream back to text through the
    * MODEL's id→piece map (ids alone must suffice — the round-trip
    * gate's point): pieces reassemble into words by (wpos, pos) and
    * words join with single spaces. UNK positions (null `token_id`)
    * are SKIPPED — their word decodes lossily — mirroring the
    * [[Bpe.decodeIds]] contract. Order-free sorted-struct aggs keep
    * both rollups combinable and partition-invariant; groups are
    * word-/doc-length-bounded.
    */
  def decodeIds(ids: DataFrame, model: DataFrame,
                idCol: String = "doc_id"): DataFrame =
    ids.join(model.select(col("token_id"), col("piece").as("__mp")),
        Seq("token_id"))
      .groupBy(col(idCol), col("wpos"))
      .agg(array_sort(collect_list(struct(col("pos").as("p"),
        col("__mp").as("s")))).as("__ps"))
      .select(col(idCol), col("wpos"),
        array_join(expr("transform(__ps, x -> x.s)"), "").as("__w"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("wpos").as("w"),
        col("__w").as("s")))).as("__ws"))
      .select(col(idCol),
        array_join(expr("transform(__ws, x -> x.s)"), " ").as("decoded"))
}
