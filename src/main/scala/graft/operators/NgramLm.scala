package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bigram language model + CCNet-style perplexity filtering.
  *
  * The classic quality signal for LLM training-data curation
  * (CCNet / "head-middle-tail" buckets): train a smoothed n-gram LM
  * on the corpus, score every document by its per-token negative
  * log-likelihood, and bucket documents into perplexity terciles —
  * "head" (lowest perplexity, most language-like) through "tail".
  *
  * Model: bigram with add-one smoothing over the corpus vocabulary,
  *   P(w | v) = (c(v,w) + 1) / (c(v,·) + |V|),
  * with a per-document BOS context `<s>` so every token is scored
  * (n scored bigrams = n tokens). All counts are exact BIGINTs; each
  * bigram's log-probability is ln of an exact integer ratio, quantized
  * once to 6 dp micros ([[ExactSum.quantize6]]) so per-document sums
  * are order-independent exact longs and the whole chain replays
  * bit-identically in the DuckDB oracle (ln/exp are in the accepted
  * bit-identical set; `pow` is not, and is not used).
  *
  * Scale design (100 TB): the bigram TYPE table is vocabulary²-bounded
  * (Heaps: far below corpus size) — counting it is one map-side-
  * combined shuffle on (prev, cur). Scoring joins corpus bigrams to
  * the type table on (prev, cur) — a plain shuffle join both sides of
  * which AQE can re-plan; nothing is ever collected to the driver but
  * two one-row aggregates (|V| and the doc count). The only windows
  * are per-document (doc-length-bounded) and the tercile rank runs on
  * the rank core ([[Ranking.rangeRank]]), never a one-task `OVER ()`.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no LM scoring; this extends the mandated text-analysis family
  * (SURVEY §2B4) with the standard perplexity-filtering stage.
  */
object NgramLm {

  /** Per-document token stream: (idCol, wpos, cur), wpos 0-based. */
  private def docTokens(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        posexplode(TextAnalysis.tokensCol(col(textCol)))
          .as(Seq("wpos", "cur")))

  /** Per-document bigram stream with BOS: every token scored against
    * its predecessor (`<s>` at position 0). The lag window is
    * doc-partitioned — doc-length-bounded groups, the allowed class.
    */
  private def bigrams(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docTokens(docs, idCol, textCol)
      .withColumn("prev", lag(col("cur"), 1, "<s>").over(
        Window.partitionBy(col(idCol)).orderBy(col("wpos"))))

  /** The fitted model: one row per observed bigram type —
    * `(prev, cur, c2, c1, lp6)` where `c2` = bigram count, `c1` =
    * context count (Σ over cur), and `lp6` = 6-dp-quantized
    * ln((c2+1)/(c1+|V|)). |V| is a one-row distinct-`cur` aggregate
    * (parameter-bounded broadcast, PlanAudit-allowlisted).
    */
  def bigramModel(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    modelParts(docs, idCol, textCol)._1

  /** Internal model pieces: (full likelihood table, context-count
    * table, one-row |V| frame) — the latter two are what smoothed
    * UNSEEN-bigram scoring needs ([[heldOutNllBySource]]).
    */
  private def modelParts(docs: DataFrame, idCol: String,
                         textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val bg = bigrams(docs, idCol, textCol)
    val c2 = bg.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
    val v = bg.agg(countDistinct(col("cur")).as("v"))
    val lp = c2.join(c1, Seq("prev"))
      .crossJoin(broadcast(v))
      .select(col("prev"), col("cur"), col("c2"), col("c1"),
        ExactSum.quantize6(
          log((col("c2") + lit(1L)).cast("double") /
              (col("c1") + col("v")).cast("double"))).as("lp6"))
    (lp, c1, v)
  }

  /** Per-document negative log-likelihood under the corpus's own
    * bigram model: `(idCol, n_tokens, nll, ppl6)` where `nll` is the
    * mean per-token −ln P and `ppl6 = exp(nll)` re-quantized to 6 dp
    * (DuckDB's `exp` can differ from the JVM's in the last ulp — the
    * only one of ln/exp observed to — so the raw double is not
    * gate-safe). Every token is scored (BOS context), so `n_tokens`
    * is the document token count.
    */
  def docNll(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val lp = bigramModel(docs, idCol, textCol)
      .select(col("prev"), col("cur"), col("lp6"))
    val nll = col("s").cast("double") / lit(-1000000.0) / col("n_tokens")
    bg.join(lp, Seq("prev", "cur"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp6")).as("s"))
      .select(col(idCol), col("n_tokens"), nll.as("nll"),
        (ExactSum.quantize6(exp(nll)).cast("double") / lit(1000000.0))
          .as("ppl6"))
  }

  /** HELD-OUT perplexity per group — the honest form of q273's
    * self-scoring: train the bigram model on a deterministic md5
    * fraction of documents ([[Sampling.hexThreshold]] ring, so the
    * split is reproducible from ids alone) and score the COMPLEMENT,
    * rolled up per `groupCol` (source). Bigrams the training split
    * never saw still score — the add-one mass
    * `ln(1/(c1(prev) + |V|))` (with c1 = 0 for an unseen context)
    * covers them, so no held-out token silently drops.
    *
    * Output: `(groupCol, n_docs, n_tokens, nll, ppl6)`.
    */
  def heldOutNllBySource(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text",
                         groupCol: String = "source",
                         trainFrac: Double = 0.5): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1,
      s"trainFrac must be in (0,1), got $trainFrac")
    val thr = Sampling.hexThreshold(trainFrac)
    val bkt = substring(
      md5(col(idCol).cast("string").cast("binary")), 1, 4)
    val (lp, c1t, v) =
      modelParts(docs.filter(bkt < lit(thr)), idCol, textCol)
    val held = docs.filter(!(bkt < lit(thr)))
    val unseen = ExactSum.quantize6(log(lit(1.0) /
      (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")))
    val scored = bigrams(held, idCol, textCol)
      .join(lp.select(col("prev"), col("cur"), col("lp6")),
        Seq("prev", "cur"), "left")
      .join(c1t, Seq("prev"), "left")
      .crossJoin(broadcast(v))
      .select(col(idCol), coalesce(col("lp6"), unseen).as("lp6e"))
    val bySrc = scored
      .join(held.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_tokens"), sum(col("lp6e")).as("s"))
    val nll = col("s").cast("double") / lit(-1000000.0) / col("n_tokens")
    bySrc.select(col(groupCol), col("n_docs"), col("n_tokens"),
      nll.as("nll"),
      (ExactSum.quantize6(exp(nll)).cast("double") / lit(1000000.0))
        .as("ppl6"))
  }

  /** CCNet head/middle/tail perplexity terciles: documents ranked by
    * (nll asc, id asc) — rank core, no global window — and bucketed by
    * `rank·3` against the doc count (a one-row aggregate). "head" =
    * the lowest-perplexity third, the bucket CCNet keeps outright.
    */
  def pplBuckets(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    bucketize(docNll(docs, idCol, textCol), idCol)

  private def bucketize(nllFrame: DataFrame, idCol: String): DataFrame = {
    // the rank core makes several passes over its input (range sample,
    // counts, rank) — checkpoint the scored frame so the LM chain
    // (3 shuffles) is not replayed per pass
    val nf = nllFrame.localCheckpoint()
    val ranked = Ranking.rangeRank(nf, Nil, Seq("nll", idCol), "rank")
    val nd = nf.agg(count(lit(1)).as("nd"))
    ranked.crossJoin(broadcast(nd))
      .select(col(idCol), col("rank").cast("long").as("rank"),
        when(col("rank") * 3 <= col("nd"), lit("head"))
          .when(col("rank") * 3 <= col("nd") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  // ---------------------------------------------------------------
  // Interpolated Kneser–Ney trigram (Kneser & Ney 1995; Chen & Goodman
  // 1999) — the properly-smoothed upgrade over [[docNll]]'s add-one
  // bigram. Add-one gives every unseen/rare n-gram the SAME tiny mass
  // 1/(c1+|V|), which over-penalizes the long tail real quality
  // ranking depends on (the CCNet recipe trains a 5-gram KN LM for
  // exactly this reason). KN instead discounts every seen count by a
  // fixed `d` and redistributes that mass by CONTINUATION diversity —
  // how many distinct contexts a word follows, not how often it
  // occurs — so "francisco" (frequent, but only ever after "san")
  // stops leaking probability into fresh contexts.
  //
  //   p(w₃|w₁w₂) = max(c₃−d,0)/c₁₂ + d·N₁₊(w₁w₂·)/c₁₂ · p(w₃|w₂)
  //   p(w₃|w₂)   = max(N₁₊(·w₂w₃)−d,0)/N₁₊(·w₂·)
  //                  + d·N₁₊(w₂·)/N₁₊(·w₂·) · p_cont(w₃)
  //   p_cont(w₃) = (N₁₊(·w₃)+1)/(T+|V|+1)
  //
  // with every N₁₊ a TYPE count off the trigram type table, T = total
  // bigram types, and the +1 floor on the continuation unigram the
  // one "lite" deviation (it keeps unseen held-out tokens scoreable —
  // a pure KN unigram assigns them zero). Unseen contexts back off
  // wholesale to the next order (the CASE branches below).
  //
  // Everything is exact BIGINT counts feeding a FIXED double
  // expression tree (divisions/multiplies of integer-cast doubles —
  // IEEE-identical across engines), one 6-dp ln quantization per
  // scored trigram, order-free long sums per document: the whole
  // chain replays bit-identically in the DuckDB oracle.
  //
  // Scale: the trigram TYPE table is Heaps-bounded (far below corpus
  // size); all derived stats frames are type-table aggregations.
  // Scoring is the token stream left-joined to five bounded type
  // frames — plain shuffle joins AQE can re-plan — plus one one-row
  // (T, |V|) broadcast. Windows: per-document lags only.
  // ---------------------------------------------------------------

  /** Per-document trigram stream with double-BOS: every token is
    * scored against its two predecessors (`<s> <s>` at position 0).
    */
  private def trigrams(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("wpos"))
    docTokens(docs, idCol, textCol)
      .withColumn("w1", lag(col("cur"), 2, "<s>").over(w))
      .withColumn("w2", lag(col("cur"), 1, "<s>").over(w))
      .withColumnRenamed("cur", "w3")
  }

  // Train-once memo (the UnigramLm/KMeans fitMemo pattern): the KN
  // type tables are deterministic in (train plan, params), and a
  // battery asks for the same training from q294/q295/q300. Values are
  // localCheckpoint'ed frames (executor-side; the driver holds plan
  // references only). The checkpoints also serve WITHIN one query:
  // knScored joins five frames all derived from c3t — without the
  // checkpoint each join side would replay the corpus trigram shuffle.
  // Bounded, swept by TrackedCaches (cold benches retrain per query);
  // cross-query hits flag the bench row warm.
  private val knMemoBound = 4
  private val knMemo = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String, String),
      ((DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame),
        Long)]
  TrackedCaches.onRelease(() => knMemo.synchronized(knMemo.clear()))

  /** Training stats for [[knTrigramNll]]: (trigram counts, context
    * stats, bigram-type continuation counts, middle stats, unigram
    * continuation counts, one-row (T, V)). All type-table-bounded.
    * `V` derives from the TYPE table (every stream token type appears
    * there) — value-identical to a stream distinct, one scan cheaper.
    */
  private def knParts(train: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val memoKey =
      (train.queryExecution.analyzed.canonicalized, idCol, textCol)
    knMemo.synchronized(knMemo.get(memoKey)) match {
      case Some((frames, trainedEpoch)) =>
        if (trainedEpoch < TrackedCaches.currentQueryEpoch)
          TrackedCaches.noteMemoReuse()
        return frames
      case None => ()
    }
    val tg = trigrams(train, idCol, textCol)
    val c3t = tg.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3")).localCheckpoint()
    val ctx = c3t.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c3")).as("c12"), count(lit(1)).as("n3"))
    val bt = c3t.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("n1mid")).localCheckpoint()
    val mid = bt.groupBy(col("w2"))
      .agg(sum(col("n1mid")).as("nmid"), count(lit(1)).as("ntyp2"))
    val uni = bt.groupBy(col("w3")).agg(count(lit(1)).as("n1"))
    val tv = bt.agg(count(lit(1)).as("t_types"))
      .crossJoin(c3t.agg(countDistinct(col("w3")).as("v")))
      .localCheckpoint()
    val frames = (c3t, ctx, bt, mid, uni, tv)
    knMemo.synchronized {
      if (knMemo.size >= knMemoBound) knMemo -= knMemo.head._1
      knMemo(memoKey) = (frames, TrackedCaches.currentQueryEpoch)
    }
    frames
  }

  /** 6-dp-quantized ln p_KN per scored trigram TYPE of `score`, under
    * the model trained on `train`: `(idCol, __m, lp6)` — `__m` the
    * within-document occurrence count, so `Σ __m·lp6` equals the
    * per-token sum exactly (lp6 is quantized per TYPE; integer
    * multiplication loses nothing). Rare/unseen grams back off through
    * the CASE chain; nothing drops.
    *
    * Scale shape: the raw token stream collapses to (doc, trigram
    * type) rows in ONE map-side-combinable shuffle BEFORE the five
    * type-frame joins — without this the full 100 TB stream would ride
    * five consecutive join exchanges (one per stats key).
    */
  private def knScored(train: DataFrame, score: DataFrame, idCol: String,
                       textCol: String, discount: Double): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val (c3t, ctx, bt, mid, uni, tv) = knParts(train, idCol, textCol)
    val d = lit(discount)
    val dbl: String => Column = c => col(c).cast("double")
    val pUni = (coalesce(col("n1"), lit(0L)) + lit(1L)).cast("double") /
      (col("t_types") + col("v") + lit(1L)).cast("double")
    val pBi = when(coalesce(col("nmid"), lit(0L)) > 0L,
      greatest(coalesce(col("n1mid"), lit(0L)).cast("double") - d, lit(0d)) /
        dbl("nmid") + ((d * dbl("ntyp2")) / dbl("nmid")) * pUni)
      .otherwise(pUni)
    val p = when(coalesce(col("c12"), lit(0L)) > 0L,
      greatest(coalesce(col("c3"), lit(0L)).cast("double") - d, lit(0d)) /
        dbl("c12") + ((d * dbl("n3")) / dbl("c12")) * pBi)
      .otherwise(pBi)
    trigrams(score, idCol, textCol)
      .groupBy(col(idCol), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("__m"))
      .join(c3t, Seq("w1", "w2", "w3"), "left")
      .join(ctx, Seq("w1", "w2"), "left")
      .join(bt, Seq("w2", "w3"), "left")
      .join(mid, Seq("w2"), "left")
      .join(uni, Seq("w3"), "left")
      .crossJoin(broadcast(tv))
      .select(col(idCol), col("__m"),
        ExactSum.quantize6(log(p)).as("lp6"))
  }

  /** Per-document NLL/perplexity under the corpus's own interpolated-KN
    * trigram model: `(idCol, n_tokens, nll, ppl6)` — the [[docNll]]
    * shape, properly smoothed.
    */
  def knTrigramNll(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   discount: Double = 0.75): DataFrame = {
    val nll = col("s").cast("double") / lit(-1000000.0) / col("n_tokens")
    knScored(docs, docs, idCol, textCol, discount)
      .groupBy(col(idCol))
      .agg(sum(col("__m")).as("n_tokens"),
        sum(col("__m") * col("lp6")).as("s"))
      .select(col(idCol), col("n_tokens"), nll.as("nll"),
        (ExactSum.quantize6(exp(nll)).cast("double") / lit(1000000.0))
          .as("ppl6"))
  }

  /** CCNet terciles under the KN trigram model — the [[pplBuckets]]
    * twin with honest tail smoothing.
    */
  def knPplBuckets(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   discount: Double = 0.75): DataFrame =
    bucketize(knTrigramNll(docs, idCol, textCol, discount), idCol)

  /** HELD-OUT KN-trigram perplexity per group — the
    * [[heldOutNllBySource]] twin under proper smoothing, and the pair
    * that shows WHY the smoothing choice matters: add-one gives every
    * unseen held-out bigram the same 1/(c1+|V|) penalty, while KN's
    * backoff chain scores it by how PLAUSIBLE its parts are (unseen
    * trigram → bigram continuation → unigram continuation — the CASE
    * chain in [[knScored]]), so a held-out document of natural-but-new
    * word combinations stops being indistinguishable from noise.
    * Same deterministic md5-ring split; no held-out token drops (the
    * +1-floored continuation unigram covers even words the training
    * split never saw). Output: `(groupCol, n_docs, n_tokens, nll,
    * ppl6)`.
    */
  def knHeldOutNllBySource(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text",
                           groupCol: String = "source",
                           trainFrac: Double = 0.5,
                           discount: Double = 0.75): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1,
      s"trainFrac must be in (0,1), got $trainFrac")
    val thr = Sampling.hexThreshold(trainFrac)
    val bkt = substring(
      md5(col(idCol).cast("string").cast("binary")), 1, 4)
    val held = docs.filter(!(bkt < lit(thr)))
    val scored = knScored(docs.filter(bkt < lit(thr)), held,
      idCol, textCol, discount)
    val bySrc = scored
      .join(held.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        sum(col("__m")).as("n_tokens"),
        sum(col("__m") * col("lp6")).as("s"))
    val nll = col("s").cast("double") / lit(-1000000.0) / col("n_tokens")
    bySrc.select(col(groupCol), col("n_docs"), col("n_tokens"),
      nll.as("nll"),
      (ExactSum.quantize6(exp(nll)).cast("double") / lit(1000000.0))
        .as("ppl6"))
  }
}
