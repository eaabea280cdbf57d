package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning (Sennrich et al. 2016, ACL) —
  * the tokenizer-training step of an LLM data pipeline: iteratively
  * merge the most frequent adjacent symbol pair across the corpus,
  * starting from characters, yielding the ordered merge table that IS a
  * BPE vocabulary.
  *
  * Representation: each distinct word becomes one row carrying its
  * corpus frequency and its current symbol sequence encoded as a
  * double-space-delimited string (`"  l  o  w  </w>  "`). A merge of
  * pair (a, b) is then the plain string replacement
  * `replace(seq, ' a  b ', ' ab ')`: the single-space-padded pattern
  * consumes one space of each flanking double-space separator, so
  * adjacent pairs stay matchable and a symbol can never match inside a
  * longer symbol — left-to-right non-overlapping `replace` semantics
  * (identical in the JVM and every SQL engine; no regex lookarounds, so
  * the DuckDB/RE2 oracle replays it verbatim) reproduce the reference
  * algorithm's leftmost-greedy merge order.
  *
  * Words are restricted to `^[a-z0-9]+$` after lowercasing so
  * per-character splitting is byte-unambiguous on every engine; the
  * Sennrich end-of-word marker `</w>` is appended as its own symbol.
  *
  * Scale shape: the corpus is scanned ONCE into the (word, freq) vocab
  * frame (Zipf-bounded — millions of rows at any corpus size, never
  * corpus-sized). Each of the k iterations is one map-side-combinable
  * pair-count aggregation over the vocab frame, a one-row best-pair
  * sort-limit broadcast back, and a per-row replace — no corpus
  * rescans, no driver-side state beyond the plan. Lineage is cut with
  * an eager localCheckpoint per round (the PageRank lesson).
  */
object Bpe {

  private[operators] val WordRe = "^[a-z0-9]+$"

  /** Extended (raw-text) word shape: any non-whitespace run with
    * `<`/`>` excluded — those two characters are reserved so the
    * `</w>` marker and the `<0xNN>` byte tokens can never collide with
    * text symbols.
    */
  private val WordReExt = "^[^\\s<>]+$"

  /** Corpus (word, freq) vocabulary frame: lowercase whitespace tokens
    * restricted to [a-z0-9]+. One shuffle, Zipf-bounded output.
    */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    // THE shared corpus pass of every tokenizer trainer (BPE, unigram,
    // WordPiece): tokenize+explode is per-row heavy, and a single-file
    // corpus otherwise runs it on ONE core (guide §2.5 — parallelized
    // is an identity at production scan widths)
    FrameOps.parallelized(docs)
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(TextAnalysis.tokensCol(col(textCol))).as("word"))
      .filter(col("word").rlike(WordRe))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence for a word: every character a symbol plus
    * the `</w>` end marker, double-space delimited with leading and
    * trailing double spaces.
    */
  private def initialSeq(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "), lit("</w>  "))

  private def symbols(seq: Column): Column = split(trim(seq), "  ")

  /** Learn `merges` BPE merges over the corpus. Output: one row per
    * merge — (iteration, sym_a, sym_b, merged, pair_count) — ordered by
    * iteration; `pair_count` is the frequency-weighted occurrence count
    * of the winning pair at the time it was chosen. Ties break on
    * (count DESC, sym_a ASC, sym_b ASC) — fully deterministic.
    */
  def learnMerges(docs: DataFrame, merges: Int,
                  textCol: String = "text"): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    learned(docs, merges, textCol)._1
  }

  // Session-scoped training memo keyed by the canonicalized corpus plan
  // + merge count: the merge table and final sequences are a pure
  // function of (docs, merges), and four driver queries (train,
  // compression, persisted apply, token ids) consume the same chain —
  // one training per session, the checkpointed frames reused directly.
  // Swept by TrackedCaches.release() (cold benches retrain per query).
  // LinkedHashMap (insertion-ordered) and BOUNDED: entries pin
  // localCheckpoint blocks (executor storage) and analyzed-plan keys, so
  // a session training many distinct corpora evicts oldest-first — the
  // dropped references let the ContextCleaner reclaim the checkpoints —
  // instead of accumulating driver+executor state without limit.
  private val memoBound = 4
  private val trainMemo = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Int, String), (DataFrame, DataFrame, Long)]
  TrackedCaches.onRelease(() => trainMemo.synchronized(trainMemo.clear()))

  /** Internal: (merge table, final per-word symbol sequences). */
  private def learned(docs: DataFrame, merges: Int,
                      textCol: String): (DataFrame, DataFrame) = {
    // plan-object key: structural equality covers LocalRelation data,
    // which the truncating toString would not
    val memoKey = (docs.queryExecution.analyzed.canonicalized,
      merges, textCol)
    trainMemo.synchronized(trainMemo.get(memoKey)) match {
      case Some((table, seqs, trainedEpoch)) =>
        // cross-QUERY reuse flags the bench row warm, like track()'s
        // plan match (within-query reuse is the query's own)
        if (trainedEpoch < TrackedCaches.currentQueryEpoch)
          TrackedCaches.noteMemoReuse()
        return (table, seqs)
      case None => ()
    }
    val spark = docs.sparkSession
    var seqs = wordFreqs(docs, textCol)
      .select(col("word"), col("freq"), initialSeq(col("word")).as("seq"))
      .localCheckpoint(true) // referenced twice per iteration: scan once
    var table: DataFrame = null
    var i = 1
    var exhausted = false
    while (i <= merges && !exhausted) {
      val sy = symbols(col("seq"))
      val pairs = seqs
        .select(col("freq"), sy.as("sy"))
        // a fully-merged word has ONE symbol: Spark's sequence(1, 0)
        // counts DOWN, so guard before generating pair positions
        .filter(size(col("sy")) >= 2)
        .select(col("freq"),
          explode(sequence(lit(1), size(col("sy")) - 1)).as("i"), col("sy"))
        .select(col("freq"), element_at(col("sy"), col("i")).as("a"),
          element_at(col("sy"), col("i") + 1).as("b"))
        .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("cnt"))
      val bestPlan = pairs
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .select(lit(i).as("iteration"), col("a").as("sym_a"),
          col("b").as("sym_b"), concat(col("a"), col("b")).as("merged"),
          col("cnt").as("pair_count"))
      // COLLECT the winner (≤ 1 row — driver-bounded by construction)
      // instead of localCheckpoint + isEmpty: one job per iteration
      // where the checkpointed form paid two (materialize + head-check),
      // and the LocalRelation-backed `best` makes the rewrite's
      // broadcast, the merge-table union and every later
      // composedReplace collect job-free. The driver loop is the BPE
      // algorithm's inherent serial spine; this halves its per-step
      // job count without touching what it computes.
      val bestRows = bestPlan.collect()
      val best = spark.createDataFrame(
        java.util.Arrays.asList(bestRows: _*), bestPlan.schema)
      table = if (table == null) best else table.union(best)
      if (bestRows.isEmpty) {
        // merges > achievable: every word is a single symbol, so no
        // pair exists anywhere. STOP — rewriting against the empty
        // best frame would cross-join `seqs` down to zero rows and
        // silently empty every downstream consumer (compressionStats
        // inner-joins the vocab). `seqs` keeps the fully-merged
        // sequences; the merge table just ends short.
        exhausted = true
      } else {
        seqs = seqs
          .crossJoin(broadcast(best.select(
            col("sym_a"), col("sym_b"), col("merged"))))
          .select(col("word"), col("freq"),
            expr("replace(seq, concat(' ', sym_a, '  ', sym_b, ' '), " +
              "concat(' ', merged, ' '))").as("seq"))
          .localCheckpoint(true) // cut per-iteration lineage growth
      }
      i += 1
    }
    // seqs is localCheckpoint-backed (table is LocalRelation-backed —
    // ≤ merges driver rows) — storing the frames keeps the checkpoint
    // alive for session reuse; the release hook drops the references
    // and the ContextCleaner reclaims them
    // Read the epoch into a LOCAL before taking the memo lock:
    // TrackedCaches.release() holds ITS lock while invoking the onRelease
    // hook (which takes this lock), so nesting the TrackedCaches lock
    // inside the memo lock would be an ABBA deadlock against a concurrent
    // release() from another driver thread.
    val epoch = TrackedCaches.currentQueryEpoch
    trainMemo.synchronized {
      if (trainMemo.size >= memoBound) trainMemo -= trainMemo.head._1
      trainMemo(memoKey) = (table, seqs, epoch)
    }
    (table, seqs)
  }

  /** The merge-count sweep on ONE cascade — BPE merges are strictly
    * incremental (the state after k merges is an intermediate of the
    * state after k' > k), so training a separate cascade per sweep
    * point is pure waste: this trains ONCE to `max(ks)` and snapshots
    * the per-word sequence state at each requested k. Per k:
    * `(merges, n_tokens, vocab_used)` where `n_tokens` =
    * Σ freq · |symbols| (≡ counting the id stream — every model word
    * comes from the corpus) and `vocab_used` = distinct symbols in
    * use. The oracle has ALWAYS read one cascade's intermediates
    * (s2/s4/s8/s16 — the r8 fd-limit lesson); this makes the engine
    * side match it. Exhaustion before max(ks) freezes the remaining
    * sweep points at the fully-merged state, same as per-k training
    * would.
    */
  def mergeSweepStats(docs: DataFrame, ks: Seq[Int],
                      textCol: String = "text"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && ks.distinct.size == ks.size,
      s"ks must be non-empty, distinct, >= 1: got $ks")
    val sorted = ks.sorted
    var seqs = wordFreqs(docs, textCol)
      .select(col("word"), col("freq"), initialSeq(col("word")).as("seq"))
      .localCheckpoint(true)
    def statsAt(k: Int, s: DataFrame): DataFrame =
      s.select(col("freq"), explode(symbols(col("seq"))).as("sym"))
        .agg(sum(col("freq")).as("n_tokens"),
          countDistinct(col("sym")).as("vocab_used"))
        .select(lit(k.toLong).as("merges"), col("n_tokens"),
          col("vocab_used"))
    val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var exhausted = false
    var i = 1
    while (i <= sorted.last) {
      if (!exhausted) {
        val sy = symbols(col("seq"))
        val pairs = seqs
          .select(col("freq"), sy.as("sy"))
          .filter(size(col("sy")) >= 2)
          .select(col("freq"),
            explode(sequence(lit(1), size(col("sy")) - 1)).as("i"),
            col("sy"))
          .select(col("freq"), element_at(col("sy"), col("i")).as("a"),
            element_at(col("sy"), col("i") + 1).as("b"))
          .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("cnt"))
        val bestPlan = pairs
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
          .select(col("a").as("sym_a"), col("b").as("sym_b"),
            concat(col("a"), col("b")).as("merged"))
        // one-row collect instead of localCheckpoint + isEmpty — the
        // [[learned]] per-iteration job-count fix, same reasoning
        val bestRows = bestPlan.collect()
        val best = seqs.sparkSession.createDataFrame(
          java.util.Arrays.asList(bestRows: _*), bestPlan.schema)
        if (bestRows.isEmpty) exhausted = true
        else seqs = seqs
          .crossJoin(broadcast(best))
          .select(col("word"), col("freq"),
            expr("replace(seq, concat(' ', sym_a, '  ', sym_b, ' '), " +
              "concat(' ', merged, ' '))").as("seq"))
          .localCheckpoint(true)
      }
      if (sorted.contains(i)) out += statsAt(i, seqs)
      i += 1
    }
    out.reduce(_ union _)
  }

  /** Apply the learned vocabulary back to the corpus: per document, the
    * word count, character count, BPE token count under the final merge
    * table, and the chars-per-token compression ratio — the standard
    * "how well does this tokenizer compress this corpus" diagnostic.
    * Only [a-z0-9]+ words count (same contract as training). Documents
    * with no qualifying words are excluded.
    *
    * Scale shape: one corpus explode joined to the Zipf-bounded vocab
    * frame on the word key (AQE-sized — the vocab side is small), then
    * one per-doc rollup.
    */
  def compressionStats(docs: DataFrame, merges: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    statsFromWordTokens(docs,
      learned(docs, merges, textCol)._2
        .select(col("word"),
          size(symbols(col("seq"))).cast("long").as("word_tokens")),
      idCol, textCol)
  }

  /** Tokenizer fertility per corpus SLICE (source/language): tokens
    * per word and chars per token by slice — the tokenizer-fairness
    * readout multilingual corpus owners publish (a slice whose
    * fertility is 2× the corpus mean pays 2× the context budget per
    * word, SentencePiece/NLLB reporting convention). Same word
    * contract as [[compressionStats]] ([a-z0-9]+ only, trained on the
    * same corpus, so every word is in the vocab frame); null slices
    * excluded.
    *
    * Scale shape: the corpus explode joins the Zipf-bounded vocab
    * frame on the word key, then ONE slice-keyed rollup (map-side
    * combinable; distinct doc count via the slice, doc two-level
    * group — no count_distinct set state through the shuffle).
    */
  def fertilityBySlice(docs: DataFrame, merges: Int,
                       sliceCol: String = "source",
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val wt = learned(docs, merges, textCol)._2
      .select(col("word"), size(symbols(col("seq"))).cast("long")
        .as("word_tokens"))
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "" &&
        col(sliceCol).isNotNull)
      .select(col(sliceCol).as("slice"), col(idCol),
        explode(TextAnalysis.tokensCol(col(textCol))).as("word"))
      .filter(col("word").rlike(WordRe))
      .join(wt, Seq("word"))
      .groupBy(col("slice"), col(idCol))
      .agg(count(lit(1)).as("__w"), sum(length(col("word"))).as("__c"),
        sum(col("word_tokens")).as("__t"))
      .groupBy(col("slice"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).cast("long").as("n_words"),
        sum(col("__t")).cast("long").as("n_tokens"),
        round(sum(col("__t")).cast("double") /
          sum(col("__w")).cast("double"), 6).as("fertility"),
        round(sum(col("__c")).cast("double") /
          sum(col("__t")).cast("double"), 6).as("chars_per_token"))
  }

  /** Persist a [[learnMerges]] table for train-once / apply-anywhere
    * tokenization (the writeIvfIndex / LogReg.Model precedent): merges
    * are the WHOLE tokenizer state, k rows, so new batches encode
    * without touching the training corpus again.
    */
  def writeMerges(mergeTable: DataFrame, dir: String): Unit =
    mergeTable
      .select(col("iteration"), col("sym_a"), col("sym_b"), col("merged"),
        col("pair_count"))
      .repartition(1) // k rows — one footer beats k tiny files
      .write.mode("overwrite").parquet(dir)

  def readMerges(spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Tokenize a batch under a SAVED merge table, without retraining:
    * the k merge rows (parameter-bounded — the tokenizer's entire
    * state) collect to the driver and compose, in iteration order, into
    * ONE nested `replace` column — a single codegen map pass over the
    * batch's Zipf-bounded vocab frame, byte-identical to the
    * training-time rewrite because sequential replace application IS
    * function composition (q246 shares q208's oracle verbatim).
    * Output matches [[compressionStats]]: (idCol, n_words, n_chars,
    * n_bpe_tokens, chars_per_token).
    *
    * Scale shape: zero iteration jobs — where training runs k
    * aggregate+rewrite rounds, applying runs none; the only shuffles
    * are the batch's word-vocab groupBy and the per-doc rollup. Very
    * large k would nest the expression past codegen comfort
    * (~thousands); at vocabulary-building scale (k ≤ a few hundred
    * here) the composed expression stays a single whole-stage span.
    */
  def encodeFromMerges(docs: DataFrame, mergeTable: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    statsFromWordTokens(docs,
      distinctWords(docs, textCol).select(col("word"),
        size(symbols(composedReplace(mergeTable))).cast("long")
          .as("word_tokens")),
      idCol, textCol)

  /** The k merges of a saved table composed, in iteration order, into
    * one nested `replace` column over [[initialSeq]] — sequential
    * replace application IS function composition, so this equals the
    * training-time rewrite byte for byte.
    */
  private def composedReplace(mergeTable: DataFrame): org.apache.spark.sql.Column = {
    val ms = mergeTable
      .select(col("iteration").cast("int"), col("sym_a"), col("sym_b"),
        col("merged"))
      .collect()
      .sortBy(_.getInt(0))
    ms.foldLeft(initialSeq(col("word"))) { (c, r) =>
      replace(c, lit(s" ${r.getString(1)}  ${r.getString(2)} "),
        lit(s" ${r.getString(3)} "))
    }
  }

  private def distinctWords(docs: DataFrame, textCol: String): DataFrame =
    // same §2.5 un-starve as [[wordFreqs]] — tokenize on all cores
    FrameOps.parallelized(docs)
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(TextAnalysis.tokensCol(col(textCol))).as("word"))
      .filter(col("word").rlike(WordRe))
      .distinct()

  /** Deterministic symbol vocabulary of a corpus encoded under a saved
    * merge table: (symbol, token_id) with dense 0-based ids in symbol
    * sort order — the id table a trainer's tokenizer ships with. The
    * frame is STRUCTURALLY tiny (≤ base alphabet + |merges| + 1
    * symbols), so the unpartitioned id window is k-bounded by
    * construction (the q228 waiver class, never corpus-sized).
    */
  def symbolVocab(docs: DataFrame, mergeTable: DataFrame,
                  textCol: String = "text"): DataFrame =
    distinctWords(docs, textCol)
      .select(explode(symbols(composedReplace(mergeTable))).as("symbol"))
      .distinct()
      .withColumn("token_id",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("symbol"))) - 1).cast("long"))

  /** Tokenize a corpus TO TOKEN IDS under a saved merge table — the
    * pipeline's actual tokenizer output (ids, not counts): one row per
    * (document, position) with the symbol's [[symbolVocab]] id.
    * Document order is (word position, symbol position within word),
    * positions dense 0-based per document; only `[a-z0-9]+` words
    * participate (the training contract).
    *
    * Scale shape: the per-word encode runs once per DISTINCT word
    * (Zipf-bounded) and joins back on the word key; the vocab join is
    * symbol-bounded; the only per-corpus-row window is partitioned by
    * document. Output: (idCol, pos, token_id).
    */
  def encodeIds(docs: DataFrame, mergeTable: DataFrame,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    encodeIdsCore(docs, mergeTable,
      symbolVocab(docs, mergeTable, textCol), idCol, textCol)

  /** [[encodeIds]] under a FIXED vocabulary — stable ids across
    * batches: pair with [[writeMerges]]-persisted merges and a
    * persisted [[symbolVocab]] so every future batch tokenizes to the
    * SAME id space the trainer saw. Symbols absent from `vocab` (a new
    * batch can carry characters the vocab corpus lacked) surface as a
    * null `token_id` AT THEIR POSITION — positions are assigned before
    * the vocab join, so OOV can never silently renumber a document.
    */
  def encodeIdsWithVocab(docs: DataFrame, mergeTable: DataFrame,
                         vocab: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame =
    encodeIdsCore(docs, mergeTable, vocab, idCol, textCol)

  private def encodeIdsCore(docs: DataFrame, mergeTable: DataFrame,
                            vocab: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val words = FrameOps.parallelized(docs)
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(TextAnalysis.tokensCol(col(textCol))).as(Seq("wpos", "word")))
      .filter(col("word").rlike(WordRe))
    val wordSyms = distinctWords(docs, textCol)
      .select(col("word"), symbols(composedReplace(mergeTable)).as("syms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("wpos"), col("spos"))
    words.join(wordSyms, Seq("word"))
      .select(col(idCol), col("wpos"),
        posexplode(col("syms")).as(Seq("spos", "symbol")))
      .select(col(idCol),
        (row_number().over(w) - 1).cast("long").as("pos"),
        col("symbol"))
      .join(vocab, Seq("symbol"), "left")
      .select(col(idCol), col("pos"), col("token_id"))
  }

  /** Decode a token-id stream back to text — the inverse of
    * [[encodeIds]] and the other half of the tokenizer surface (what a
    * trainer runs to inspect samples, and what the round-trip gate
    * needs to prove the id stream is lossless). Joins ids to the vocab,
    * reassembles each document's symbols in position order, and turns
    * the `</w>` end-of-word markers back into spaces.
    *
    * Contract: positions whose `tokCol` is null (a stable-vocab OOV
    * from [[encodeIdsWithVocab]]) are SKIPPED — a lossy encode decodes
    * lossily; use the byte-fallback encoders when decode must be exact
    * over any input.
    *
    * Scale shape: one symbol-bounded vocab join (AQE broadcasts it), one
    * per-document shuffle for the reassembly agg; the per-doc symbol
    * array is doc-length-bounded, same class as every per-doc rollup
    * here. `array_sort` over (pos, symbol) structs makes the concat
    * order-free, so the agg stays combinable and partition-invariant.
    */
  def decodeIds(ids: DataFrame, vocab: DataFrame,
                idCol: String = "doc_id", posCol: String = "pos",
                tokCol: String = "token_id"): DataFrame =
    ids.join(vocab.select(col("token_id").as(tokCol), col("symbol")),
        Seq(tokCol))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col(posCol).as("p"),
        col("symbol").as("s")))).as("__ss"))
      .select(col(idCol),
        trim(regexp_replace(
          array_join(expr("transform(__ss, x -> x.s)"), ""),
          "</w>", " ")).as("decoded"))

  /** The base symbol alphabet every tokenizer here can fall back to:
    * the training contract's `[a-z0-9]` characters plus the end-of-word
    * marker. Merges only ever CONCATENATE these units, so every symbol
    * any merge table can produce decomposes uniquely into them.
    */
  private[graft] val BaseSymbols: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString) :+ "</w>"

  /** GPT-2-style byte-fallback extension of a persisted [[symbolVocab]]:
    * every base symbol absent from `vocab` gets a dense id AFTER the
    * persisted range (max persisted id + 1 onward, in symbol sort
    * order). Persisted ids never renumber — a trainer's checkpoints
    * stay valid — and with the full base alphabet present, NO symbol
    * sequence is ever out of vocabulary (the production guarantee
    * byte-level BPE tokenizers provide, cf. GPT-2's 256 byte-level
    * initial entries).
    *
    * Scale shape: the vocab frame is symbol-bounded (≤ base alphabet +
    * |merges| + 1 rows); the max-id frame is a one-row aggregate
    * (broadcast allowlisted) and the id window runs over ≤37 candidate
    * rows — k-bounded by construction.
    */
  def byteFallbackVocab(vocab: DataFrame): DataFrame =
    fallbackExtended(vocab, BaseSymbols)

  /** The 256 byte tokens `<0x00>`..`<0xFF>` — SentencePiece's
    * byte_fallback surface: with all of them in the vocabulary, ANY
    * character (mixed case, punctuation, full Unicode) decomposes to
    * in-vocabulary units via its UTF-8 bytes.
    */
  private[graft] val ByteSymbols: Seq[String] =
    (0 until 256).map(b => f"<0x$b%02X>")

  /** [[byteFallbackVocab]] for the EXTENDED raw-text alphabet: the
    * persisted vocab plus every missing `[a-z0-9]`/marker base symbol
    * AND every missing `<0xNN>` byte token, dense ids after the
    * persisted range in symbol sort order. Persisted ids never
    * renumber, and with the byte alphabet complete no symbol any text
    * can produce is out of vocabulary.
    */
  def byteFallbackVocabExt(vocab: DataFrame): DataFrame =
    fallbackExtended(vocab, BaseSymbols ++ ByteSymbols)

  private def fallbackExtended(vocab: DataFrame,
                               candidates: Seq[String]): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val ids = vocab.select(col("symbol"),
      col("token_id").cast("long").as("token_id"))
    val mx = ids.agg(coalesce(max(col("token_id")), lit(-1L)).as("__mx"))
    val missing = candidates.toDF("symbol")
      .join(ids.select("symbol"), Seq("symbol"), "left_anti")
      .crossJoin(broadcast(mx))
      .withColumn("token_id",
        col("__mx") + row_number().over(org.apache.spark.sql.expressions
          .Window.orderBy(col("symbol"))).cast("long"))
      .select(col("symbol"), col("token_id"))
    ids.union(missing)
  }

  /** A symbol's base-unit decomposition: strip the `</w>` suffix if
    * present, split the remainder into characters, re-append the marker
    * as its own unit. `</w>` itself decomposes to `['</w>']`.
    */
  private def decomposeUnits(symbol: Column): Column = {
    val hasMarker = symbol.endsWith(lit("</w>"))
    val core = when(hasMarker,
      symbol.substr(lit(1), length(symbol) - lit(4))).otherwise(symbol)
    val chars = filter(
      split(regexp_replace(core, "(.)", "$1"), ""),
      c => c =!= lit(""))
    when(hasMarker, concat(chars, array(lit("</w>")))).otherwise(chars)
  }

  /** [[encodeIdsWithVocab]] with BYTE-LEVEL FALLBACK — the production
    * tokenizer contract where nothing is ever OOV: a symbol missing
    * from the (fallback-extended) vocabulary decomposes into its base
    * units — characters plus the end marker, each guaranteed an id by
    * [[byteFallbackVocab]] — and each unit becomes its own token at its
    * own position. In-vocabulary symbols encode exactly as
    * [[encodeIdsWithVocab]] would, at the same ids; only the null
    * positions q252's contract surfaces are replaced, by the
    * decomposed id runs. Output: (idCol, pos, token_id), token_id
    * never null.
    *
    * Scale shape: the per-word encode still runs once per DISTINCT
    * word; both vocab joins are symbol-bounded sides (AQE broadcasts
    * them, hint-free); the only corpus-row window is doc-partitioned.
    */
  def encodeIdsByteFallback(docs: DataFrame, mergeTable: DataFrame,
                            vocab: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame =
    encodeIdsFallbackCore(docs, mergeTable, byteFallbackVocab(vocab),
      TextAnalysis.tokensCol, WordRe, decomposeUnits, idCol, textCol)

  /** [[encodeIdsByteFallback]] over the EXTENDED raw-text alphabet —
    * the full production pre-tokenizer: words are whitespace tokens
    * with case, punctuation and Unicode PRESERVED (only `<`/`>` are
    * excluded — reserved for the end-of-word marker and the `<0xNN>`
    * byte tokens), so mixed-case and non-ASCII text actually reaches
    * the fallback instead of being filtered out by the training
    * contract's `[a-z0-9]` gate. An out-of-vocabulary symbol
    * decomposes into its UTF-8 BYTES as `<0xNN>` tokens (SentencePiece
    * byte_fallback semantics), each guaranteed an id by
    * [[byteFallbackVocabExt]] — token_id never null on ANY input.
    * In-vocabulary symbols (and `[a-z0-9]` base characters) encode at
    * exactly their [[encodeIdsWithVocab]] ids.
    *
    * Scale shape: identical to [[encodeIdsByteFallback]] — per-DISTINCT
    * word encode, symbol-bounded vocab joins (≤ persisted + 37 + 256
    * rows), one doc-partitioned window.
    */
  def encodeIdsByteFallbackExt(docs: DataFrame, mergeTable: DataFrame,
                               vocab: DataFrame, idCol: String = "doc_id",
                               textCol: String = "text"): DataFrame =
    encodeIdsFallbackCore(docs, mergeTable, byteFallbackVocabExt(vocab),
      t => split(trim(t), "\\s+"), WordReExt, decomposeBytes, idCol, textCol)

  private def encodeIdsFallbackCore(docs: DataFrame, mergeTable: DataFrame,
                                    ext: DataFrame,
                                    tokens: Column => Column, wordRe: String,
                                    decompose: Column => Column,
                                    idCol: String, textCol: String): DataFrame = {
    val words = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("wpos", "word")))
      .filter(col("word").rlike(wordRe))
    val wordSyms = words.select(col("word")).distinct()
      .select(col("word"), symbols(composedReplace(mergeTable)).as("syms"))
    val units = words.join(wordSyms, Seq("word"))
      .select(col(idCol), col("wpos"),
        posexplode(col("syms")).as(Seq("spos", "symbol")))
      .join(ext.select(col("symbol"), col("token_id").as("__direct")),
        Seq("symbol"), "left")
      .withColumn("units", when(col("__direct").isNotNull,
        array(col("symbol"))).otherwise(decompose(col("symbol"))))
      .select(col(idCol), col("wpos"), col("spos"),
        posexplode(col("units")).as(Seq("bpos", "unit")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("wpos"), col("spos"), col("bpos"))
    units
      .join(ext.select(col("symbol").as("unit"), col("token_id")), Seq("unit"))
      .select(col(idCol),
        (row_number().over(w) - 1).cast("long").as("pos"),
        col("token_id"))
  }

  /** Byte-level decomposition of an out-of-vocabulary symbol (the
    * extended-alphabet twin of [[decomposeUnits]]): strip the `</w>`
    * suffix if present, expand the remainder into its UTF-8 bytes as
    * uppercase-hex `<0xNN>` tokens, re-append the marker as its own
    * unit. `</w>` itself decomposes to `['</w>']`.
    */
  private def decomposeBytes(symbol: Column): Column = {
    val hasMarker = symbol.endsWith(lit("</w>"))
    val core = when(hasMarker,
      symbol.substr(lit(1), length(symbol) - lit(4))).otherwise(symbol)
    val hx = hex(encode(core, "UTF-8"))
    val n = (length(hx) / lit(2)).cast("int")
    // sequence(1, 0) counts DOWN (the learnMerges lesson) — guard the
    // empty core ("</w>" itself) before generating byte positions
    val bytes = when(n <= 0, typedLit(Seq.empty[String]))
      .otherwise(transform(sequence(lit(1), n), i =>
        concat(lit("<0x"), hx.substr(i * lit(2) - lit(1), lit(2)), lit(">"))))
    when(hasMarker, concat(bytes, array(lit("</w>")))).otherwise(bytes)
  }

  /** Per-doc rollup shared by [[compressionStats]] and
    * [[encodeFromMerges]]: join the corpus words to the per-word token
    * counts, aggregate counts and the chars-per-token ratio.
    */
  private def statsFromWordTokens(docs: DataFrame, wordTokens: DataFrame,
                                  idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        explode(TextAnalysis.tokensCol(col(textCol))).as("word"))
      .filter(col("word").rlike(WordRe))
      .join(wordTokens, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum(col("word_tokens")).as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") /
          col("n_bpe_tokens").cast("double"), 6))
}
