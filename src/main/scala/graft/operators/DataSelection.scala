package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR — Xie et al. 2023,
  * NeurIPS): score every raw document by how target-like its hashed
  * n-gram profile is, `score(doc) = Σ_f log(p_target(h(f)) /
  * p_raw(h(f)))` over the doc's unigram+bigram features hashed into a
  * fixed bucket space — the method used to select LLM pretraining data
  * toward a target domain without training a model.
  *
  * Determinism/portability: features hash via the md5 ring (`('0x' ||
  * substr(md5(f), 1, 13)) % buckets` — the same arithmetic every SQL
  * engine replays); bucket distributions are add-1-smoothed exact
  * counts; per-feature log-ratios are DECIMAL(28,12)-quantized before
  * the order-free per-doc sum.
  *
  * Scale shape: ONE explode of the corpus into (doc, bucket) feature
  * rows feeding two aggregations — the bucket profile (B-bounded,
  * parameter-small, broadcast back) and the per-doc score rollup. The
  * corpus is scanned once; no vocab-sized state.
  */
object DataSelection {

  private def bucketOf(f: org.apache.spark.sql.Column, buckets: Int) =
    pmod(conv(substring(md5(f.cast("binary")), 1, 13), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Per-document DSIR importance score against a target subset.
    * `isTarget` marks the in-domain documents (they get scores too —
    * useful as a sanity floor); `buckets` is the hashed feature space
    * (paper uses 10⁴; any fixed B works). Output: (idCol, n_feats,
    * dsir_score) with positive = more target-like than the raw pool.
    */
  def dsirScores(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
                 idCol: String = "doc_id", textCol: String = "text",
                 buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = TextAnalysis.tokensCol(col(textCol))
    val base = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), isTarget.as("__tgt"), toks.as("__toks"))
    // unigrams + bigrams in one pass: index i covers unigram i, and the
    // bigram (i, i+1) when it exists
    val feats = base
      .select(col(idCol), col("__tgt"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")))).as("__i"))
      .select(col(idCol), col("__tgt"),
        element_at(col("__toks"), col("__i")).as("__u"),
        when(col("__i") < size(col("__toks")),
          concat_ws(" ", element_at(col("__toks"), col("__i")),
            element_at(col("__toks"), col("__i") + 1))).as("__b2"))
      .select(col(idCol), col("__tgt"),
        explode(array(col("__u"), col("__b2"))).as("__f"))
      .filter(col("__f").isNotNull && col("__f") =!= "")
      .withColumn("__bk", bucketOf(col("__f"), buckets))
    val profile = feats.groupBy(col("__bk"))
      .agg(count(when(col("__tgt"), lit(1))).as("__ct"),
        count(when(!col("__tgt"), lit(1))).as("__cr"))
    val totals = profile.agg(sum(col("__ct")).as("__nt"),
      sum(col("__cr")).as("__nr"))
    // B-bounded profile × one-row totals: both structurally small
    val stats = profile.crossJoin(broadcast(totals))
      .select(col("__bk"),
        ((col("__ct") + 1L).cast("double") /
          (col("__nt") + lit(buckets.toLong)).cast("double")).as("__pt"),
        ((col("__cr") + 1L).cast("double") /
          (col("__nr") + lit(buckets.toLong)).cast("double")).as("__pr"))
    feats.join(broadcast(stats), "__bk")
      .withColumn("__term",
        log(col("__pt") / col("__pr")).cast("decimal(28,12)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("__term")).cast("double"), 6).as("dsir_score"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi"):
    * upweight the training-mixture domains the GLOBAL model predicts
    * worst relative to a domain-fit model — the excess-loss signal that
    * drives DoReMi's exponentiated-gradient mixture update, here in its
    * batch closed form: with a constant per-domain excess ℓ_d the T EG
    * steps collapse to one softmax, `α_d ∝ exp(η·ℓ_d)`, followed by
    * DoReMi's uniform smoothing `α' = (1−c)·α + c/k`.
    *
    * ℓ_d = mean token surprisal of domain d's text under the add-1
    * corpus-wide unigram LM minus under d's OWN unigram LM (both the
    * [[TextAnalysis.lmSurprisal]] family's arithmetic) — "how much
    * worse does one shared model fit this domain than a dedicated one",
    * the proxy/reference loss gap without training neural models.
    *
    * Output per domain: (domain, n_tokens, excess_surprisal, weight),
    * weights summing to 1 (6 dp). Fully oracle-replayable: exact token
    * counts, `ln`/`exp` correctly-rounded IEEE, per-domain sums
    * DECIMAL(28,12)-quantized order-free, the k-domain normalizer a
    * decimal sum of the quantized raw weights.
    *
    * Scale shape: ONE tokenize pass into the (domain, term) count frame
    * (vocab × k bounded — persisted, read three times), then vocab-keyed
    * equi-joins and k-row aggregations; the corpus never shuffles.
    */
  def domainReweight(docs: DataFrame, domainCol: String = "source",
                     eta: Double = 1.0, smoothing: Double = 0.1,
                     textCol: String = "text"): DataFrame = {
    require(eta > 0, s"eta must be > 0, got $eta")
    require(smoothing >= 0 && smoothing <= 1,
      s"smoothing must be in [0, 1], got $smoothing")
    val counts = TrackedCaches.track(docs
      .filter(col(domainCol).isNotNull)
      .select(col(domainCol).as("domain"),
        explode(TextAnalysis.tokensCol(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("domain"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val g = counts.groupBy(col("term")).agg(sum(col("tf")).as("cg"))
    val gt = g.agg(sum(col("cg")).as("ctot"), count(lit(1)).as("vocab"))
    val dTot = counts.groupBy(col("domain"))
      .agg(sum(col("tf")).as("ct_d"), count(lit(1)).as("vocab_d"))
    val sc = counts
      .join(g, "term")       // vocab-keyed equi-join
      .join(dTot, "domain")  // k-row side — hint-free, AQE broadcasts
      .crossJoin(broadcast(gt)) // one-row global totals
      .withColumn("__nlp_g",
        -log((col("cg") + 1).cast("double") / (col("ctot") + col("vocab"))))
      .withColumn("__nlp_d",
        -log((col("tf") + 1).cast("double") / (col("ct_d") + col("vocab_d"))))
      .groupBy(col("domain"))
      .agg(
        sum((col("tf").cast("double") * col("__nlp_g"))
          .cast("decimal(28,12)")).as("__sg"),
        sum((col("tf").cast("double") * col("__nlp_d"))
          .cast("decimal(28,12)")).as("__sd"),
        sum(col("tf")).as("n_tokens"))
    val ex = sc
      .withColumn("__excess",
        (col("__sg").cast("double") - col("__sd").cast("double")) /
          col("n_tokens").cast("double"))
      .withColumn("__w_raw", exp(lit(eta) * col("__excess")))
    val norm = ex.agg(sum(col("__w_raw").cast("decimal(28,12)")).as("__z"),
      count(lit(1)).as("__k"))
    ex.crossJoin(broadcast(norm)) // one-row normalizer
      .select(col("domain"), col("n_tokens"),
        round(col("__excess"), 6).as("excess_surprisal"),
        round((lit(1.0) - lit(smoothing)) *
          (col("__w_raw") / col("__z").cast("double")) +
          lit(smoothing) / col("__k").cast("double"), 6).as("weight"))
  }

  /** Data-constrained mixture PLANNING (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models"): given per-domain
    * availability and target mixture weights, how many tokens does a
    * training budget draw from each domain, and how many EPOCHS of that
    * domain does the draw imply — epochs > 1 means repetition (with its
    * documented diminishing returns), surfaced as the `deficit` flag.
    * The planning table every mixture decision (q239's learned weights,
    * a hand-tuned recipe) should be checked against BEFORE launching a
    * run that silently epochs a small domain five times.
    *
    * One availability aggregation over the corpus (map-side combinable);
    * the weights are a k-row literal frame; everything derived is plain
    * IEEE arithmetic both engines reproduce. Domains absent from
    * `weights` are unplanned and drop (inner join — deliberate: the
    * caller's weight map IS the mixture).
    */
  def tokenBudgetPlan(docs: DataFrame, groupCol: String,
                      weights: Map[String, Double], budgetTokens: Long,
                      textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(weights.nonEmpty, "need at least one domain weight")
    val spark = docs.sparkSession
    import spark.implicits._
    val avail = docs.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokensCol(col(textCol))).cast("long"))
          .cast("long").as("n_tokens"))
    val wdf = weights.toSeq.sortBy(_._1).toDF("domain", "weight")
    val required = floor(lit(budgetTokens.toDouble) * col("weight") +
      lit(0.5)).cast("long")
    avail.join(wdf, Seq("domain"))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        round(col("weight"), 6).as("weight"),
        required.as("tokens_required"),
        round(required.cast("double") / col("n_tokens").cast("double"), 6)
          .as("epochs"),
        (required > col("n_tokens")).as("deficit"))
  }

  /** Pairwise KL divergence between the sources' add-one-smoothed
    * unigram token distributions — the domain-shift matrix a mixture
    * planner ([[domainReweight]], [[tokenBudgetPlan]]) reads to see
    * which domains are near-duplicates of each other and which carry
    * genuinely distinct text:
    *
    *   KL(a‖b) = Σ_w p_a(w) · ln(p_a(w)/p_b(w)),
    *   p_s(w)  = (c_s(w) + 1) / (tokens_s + |V|)
    *
    * over the GLOBAL vocabulary (smoothing keeps every term finite;
    * a word a source never saw contributes its 1/(tokens+|V|) mass).
    * Each term is 12-dp quantized, so the Σ is an exact long and the
    * DuckDB oracle replays bit-identically. Output `(src_a, src_b,
    * kl)` for a ≠ b, kl ≥ 0 up to quantization.
    *
    * Scale: the dense (source × word) grid is |sources| × |vocab| —
    * sources are a schema-bounded dimension (tens), vocab is Heaps-
    * bounded, so the pairwise frame is |sources|² × |vocab| rows,
    * evenly sharded by the word key. The source-stats frame broadcasts
    * (≤|sources| rows); ratios divide as doubles (never integer cross-
    * products, which would overflow at petabyte token counts).
    *
    * `topV` caps the grid vocabulary at the `topV` corpus-most-frequent
    * words (ties to the lexicographically smaller word, rank core) —
    * the knob for HUNDRED-source mixtures, where |sources|² × |vocab|
    * stops being cheap: the matrix becomes the truncated-support KL
    * (counts AND totals AND |V| all restricted to the kept words, so
    * the smoothed distributions stay proper on that support).
    * Truncation-bias note: divergence concentrated in the tail BELOW
    * the cap is invisible to the capped matrix — pick `topV` well above
    * the head mass you care about. The default (Int.MaxValue) keeps the
    * exact full-vocabulary semantics and plan.
    */
  def sourceKlMatrix(docs: DataFrame, groupCol: String = "source",
                     textCol: String = "text",
                     topV: Int = Int.MaxValue): DataFrame = {
    require(topV >= 1, s"topV must be >= 1, got $topV")
    val words = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(groupCol),
        explode(graft.operators.TextAnalysis.tokensCol(col(textCol)))
          .as("word"))
    val cswAll = words.groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("c"))
    val (vocab, csw) =
      if (topV == Int.MaxValue) (cswAll.select(col("word")).distinct(), cswAll)
      else {
        // corpus-frequency rank over the vocab-scale frame (rank core,
        // never a one-task OVER ()); checkpointed — both the grid and
        // the count restriction re-read it
        val v = Ranking.rangeRank(
            cswAll.groupBy(col("word")).agg(sum(col("c")).as("__cf"))
              .withColumn("__ncf", -col("__cf")),
            Nil, Seq("__ncf", "word"), "__vr")
          .filter(col("__vr") <= topV).select(col("word"))
          .localCheckpoint()
        (v, cswAll.join(v, Seq("word")))
      }
    val vtot = vocab.agg(count(lit(1)).as("v"))
    val ss = csw.groupBy(col(groupCol)).agg(sum(col("c")).as("ts"))
    // dense grid: every (source, word), zero-filled
    val grid = vocab.crossJoin(broadcast(ss))
      .join(csw, Seq(groupCol, "word"), "left")
      .select(col(groupCol), col("word"), col("ts"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.select(col(groupCol).as("src_a"), col("word"),
      col("ts").as("ta"), col("c").as("ca"))
    val b = grid.select(col(groupCol).as("src_b"), col("word"),
      col("ts").as("tb"), col("c").as("cb"))
    val pa = (col("ca") + lit(1L)).cast("double") / (col("ta") + col("v"))
    val pb = (col("cb") + lit(1L)).cast("double") / (col("tb") + col("v"))
    a.join(b, Seq("word"))
      .filter(col("src_a") =!= col("src_b"))
      .crossJoin(broadcast(vtot))
      .select(col("src_a"), col("src_b"),
        ExactSum.quantize12(pa * log(pa / pb)).as("t12"))
      .groupBy(col("src_a"), col("src_b"))
      .agg((sum(col("t12")).cast("double") / lit(1000000000000.0))
        .as("kl"))
  }

  /** Active-learning uncertainty sampling — the labeling-loop step of
    * classifier bootstrapping (DataComp/fastText-filter practice:
    * label a seed set, train, send the model's LEAST-CONFIDENT
    * documents back to annotators): the k docs with the smallest
    * |p − 0.5| under the trained classifier's probabilities, ties to
    * the lowest id. k-bounded TakeOrdered — never a global sort of
    * the corpus.
    */
  def uncertaintySample(scored: DataFrame, k: Int,
                        idCol: String = "doc_id",
                        probCol: String = "p_quality"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    scored.select(col(idCol), col(probCol),
        abs(col(probCol) - lit(0.5)).as("__m"))
      .orderBy(col("__m"), col(idCol))
      .limit(k)
      .select(col(idCol), col(probCol), round(col("__m"), 6).as("margin6"))
  }

  /** Data-recipe EXECUTOR — fractional-epoch replication, the
    * up-sampling complement of the DoReMi down-sampler: given a
    * per-domain weight frame (`(domain, weight)`, e.g.
    * [[domainReweight]]'s output) and a document budget `B`, each
    * domain's epoch factor is e_d = weight_d · B / n_d (micro-epoch
    * quantized), and every document replicates ⌊e⌋ times plus one
    * more when its md5-uniform draw falls below frac(e) — the
    * Pile/LLaMA "repeat high-quality sources at fractional epochs"
    * step, DETERMINISTIC so the emitted stream is engine-replayable
    * and per-domain output counts concentrate on w_d·B exactly in
    * expectation.
    *
    * Output: `(idCol, domain, rep)` — one row per replica, `rep`
    * 1-based. Null-domain docs drop (no weight).
    *
    * Scale: one k-row count agg, one k-row epoch join (hint-free —
    * AQE broadcasts the k-row side), one row-local sequence explode;
    * output rows ∝ B, never corpus². No window, no driver state.
    */
  def replicateRecipe(docs: DataFrame, weights: DataFrame,
                      budgetDocs: Long, idCol: String = "doc_id",
                      domainCol: String = "source"): DataFrame = {
    require(budgetDocs > 0, s"budgetDocs must be > 0, got $budgetDocs")
    val base = docs.filter(col(domainCol).isNotNull)
      .select(col(idCol), col(domainCol).as("domain"))
    val n = base.groupBy(col("domain")).agg(count(lit(1)).as("__n"))
    val e6 = n.join(weights.select(col("domain"), col("weight")),
        Seq("domain"))
      .select(col("domain"),
        floor(col("weight") * lit(budgetDocs.toDouble) /
          col("__n").cast("double") * lit(1e6) + lit(0.5))
          .cast("long").as("__e6"))
    base.join(e6, Seq("domain"))
      .withColumn("__rep", expr("__e6 DIV 1000000") +
        when(graft.functions.TextHashes.md5Uniform(
            col(idCol).cast("string")) <
          (col("__e6") % lit(1000000L)).cast("double") / lit(1e6),
          lit(1L)).otherwise(lit(0L)))
      .filter(col("__rep") > 0L)
      .select(col(idCol), col("domain"),
        explode(expr("sequence(1L, __rep)")).as("rep"))
  }
}
