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
                 textCol: String = "text"): DataFrame = {
    // the rank core makes several passes over its input (range sample,
    // counts, rank) — checkpoint the scored frame so the LM chain
    // (3 shuffles) is not replayed per pass
    val nf = docNll(docs, idCol, textCol).localCheckpoint()
    val ranked = Ranking.rangeRank(nf, Nil, Seq("nll", idCol), "rank")
    val nd = nf.agg(count(lit(1)).as("nd"))
    ranked.crossJoin(broadcast(nd))
      .select(col(idCol), col("rank").cast("long").as("rank"),
        when(col("rank") * 3 <= col("nd"), lit("head"))
          .when(col("rank") * 3 <= col("nd") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
