package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus curation pipeline — the composition
  * every stage in this library exists for, wired in the canonical order:
  *
  *   input → quality filter → exact dedup → near-dup cluster dedup →
  *   benchmark decontamination → weighted source mix
  *
  * [[stages]] returns every intermediate frame (for inspection or
  * persistence); [[report]] folds them into the per-stage attrition
  * table ((stage, n_docs) rows) that data teams actually watch — a
  * sudden attrition shift at one stage is the canonical data-drop
  * incident signal.
  *
  * Scale notes: the stages are the library's own operators, so each
  * keeps its documented plan shape (per-row codegen filters; one
  * key-shuffle dedups; df-capped blocked near-dup join; broadcast eval
  * shingles; row-local mix filter). Stage survivor frames are persisted
  * (MEMORY_AND_DISK, one doc row each): every later stage — and all six
  * counts of [[report]] — re-reads them, and the near-dup stage's
  * connected-components loop would otherwise recompute the whole
  * upstream chain once per iteration.
  */
object Curation {

  final case class Config(
      minTokens: Int = 20,
      minAlphaRatio: Double = 0.5,
      maxDup2gramRatio: Double = 0.3,
      jaccardThreshold: Double = 0.5,
      shingleSize: Int = 3,
      maxDf: Long = 5L,
      deconShingleSize: Int = 8,
      trainFraction: Double = 0.8,
      valFraction: Double = 0.1,
      mixGroupCol: String = "source",
      mixFractions: Map[String, Double] = Map.empty,
      mixDefaultFraction: Double = 1.0)

  def stages(docs: DataFrame, cfg: Config = Config(),
             idCol: String = "doc_id",
             textCol: String = "text"): Seq[(String, DataFrame)] = {
    val docCols = docs.columns.map(col).toSeq
    // each stage frame is re-read by every later stage (and by all six
    // counts of [[report]]) — persist the survivors, which are one doc
    // row each (tiny relative to the work that produced them; spillable)
    def cached(df: DataFrame) =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val s1 = cached(TextAnalysis
      .repetitionFeatures(TextAnalysis.qualityFeatures(docs, textCol), textCol)
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("alpha_ratio") >= cfg.minAlphaRatio &&
        col("dup_2gram_ratio") <= cfg.maxDup2gramRatio)
      .select(docCols: _*))

    // only the one fingerprint the stage keys on — fingerprint()'s full
    // family would add two unused hash passes per surviving doc
    val s2 = cached(Dedup
      .exact(s1.withColumn("__fp", TextAnalysis.fpOrderedCol(col(textCol))),
        Seq("__fp"), idCol)
      .select(docCols: _*))

    val s3 = cached {
      val pairs = Dedup.ngramJaccardPairs(s2, idCol, textCol,
        cfg.jaccardThreshold, cfg.shingleSize, cfg.maxDf)
      val losers = Dedup.connectedComponents(pairs)
        .filter(col("doc") =!= col("cluster"))
        .select(col("doc").as(idCol))
      s2.join(losers, Seq(idCol), "left_anti")
    }

    val s4 = cached {
      // reserved column name: a user's own `split` column must survive
      val labeled = Sampling.deterministicSplit(s3, idCol,
        cfg.trainFraction, cfg.valFraction, outCol = "__split")
      val train = labeled.filter(col("__split") === "train").select(docCols: _*)
      val eval_ = labeled.filter(col("__split") === "test").select(docCols: _*)
      // broadcastEval = false: here the "eval" side is a split of the
      // corpus itself, not an MB-scale benchmark — forcing a broadcast
      // would blow the 8 GB limit at corpus scale
      val contaminated = Decontamination
        .contaminationPairs(train, eval_, idCol, textCol, cfg.deconShingleSize,
          broadcastEval = false)
        .select(col("train_doc").as(idCol)).distinct()
      train.join(contaminated, Seq(idCol), "left_anti")
    }

    val s5 = Sampling.weightedMix(s4, cfg.mixGroupCol, idCol,
      cfg.mixFractions, cfg.mixDefaultFraction)

    Seq("s0_input" -> docs, "s1_quality" -> s1, "s2_exact_dedup" -> s2,
      "s3_near_dedup" -> s3, "s4_decontaminated" -> s4, "s5_mixed" -> s5)
  }

  /** Per-document disposition over a [[stages]] chain (or ANY
    * monotone pipeline expressed as named survivor frames): for each
    * input doc, `dropped_at` = the FIRST stage whose survivor set no
    * longer contains it, or `kept` — the "why did my document vanish"
    * ledger a pipeline debugger asks for. Purely set-derived, so the
    * semantics are the pipeline's own: a doc leaving at
    * `s4_decontaminated` left the TRAINING stream there (held out by
    * the split or dropped as contaminated — both are s4 exits by
    * construction).
    *
    * Scale shape: one id-keyed left join per stage on id-only
    * projections (column-pruned to the key), then a row-local CASE —
    * no stage frame is scanned twice beyond its id column.
    */
  def disposition(built: Seq[(String, DataFrame)],
                  idCol: String = "doc_id"): DataFrame = {
    require(built.nonEmpty, "disposition needs at least the input stage")
    val joined = built.tail.foldLeft(built.head._2.select(col(idCol))) {
      case (acc, (name, df)) =>
        acc.join(df.select(col(idCol)).withColumn(s"__in_$name", lit(1L)),
          Seq(idCol), "left")
    }
    val firstAbsent = built.tail.map(_._1)
      .foldRight(lit("kept")) { (name, rest) =>
        when(col(s"__in_$name").isNull, lit(name)).otherwise(rest) }
    joined.select(col(idCol), firstAbsent.as("dropped_at"))
  }

  /** [[disposition]] over a freshly-built [[stages]] chain, with the
    * stage caches scoped to this call: the ledger is materialized
    * (localCheckpoint — per-doc (id, stage) rows, tiny relative to
    * the corpus) BEFORE the stage frames unpersist, so the caller
    * gets a frame that neither recomputes the pipeline nor pins five
    * caches for the session's lifetime.
    *
    * Cluster caveat: `localCheckpoint` blocks live on executors and
    * are NOT recomputable (the lineage is cut); losing an executor
    * that holds ledger blocks before the caller consumes the frame
    * fails the job (loudly — never silent corruption). On a real
    * cluster, consume/write the ledger promptly, or write it through
    * to storage (`.write.parquet`) when it must survive executor
    * churn — reliable `checkpoint()` needs a checkpoint dir and a
    * full shuffle-write, so the write-through is the cheaper durable
    * variant.
    */
  def dispositionLedger(docs: DataFrame, cfg: Config = Config(),
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    TrackedCaches.scopedRelease {
      val built = stages(docs, cfg, idCol, textCol)
      try disposition(built, idCol).localCheckpoint(eager = true)
      finally unpersist(built)
    }

  /** The curated training set (the last stage's frame). The persisted
    * stage caches back the returned frame — release them with
    * [[unpersist]] once the result has been consumed/written.
    */
  def curate(docs: DataFrame, cfg: Config = Config(),
             idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    stages(docs, cfg, idCol, textCol).last._2

  /** Release every stage frame's cache (no-op on the non-persisted
    * input stage) — a long-lived session curating many batches would
    * otherwise leak four cache entries per run.
    */
  def unpersist(stages: Seq[(String, DataFrame)]): Unit =
    stages.foreach { case (_, df) => df.unpersist() }

  /** Per-stage attrition report: (stage, n_docs), one row per stage.
    * Eager: the six counts run here (each against the persisted stage
    * frames) and the caches are released before returning — the result
    * is a six-row local frame, so laziness buys nothing and would pin
    * the caches for the caller's lifetime.
    */
  def report(docs: DataFrame, cfg: Config = Config(),
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // scopedRelease reclaims the caches the near-dup stage registers
    // internally (shingle arrays, connected-component labels) — invisible
    // to `built` but pinned by this run — WITHOUT touching caches other
    // queries in the session registered before this call.
    val counts = TrackedCaches.scopedRelease {
      val built = stages(docs, cfg, idCol, textCol)
      try built.map { case (name, df) => name -> df.count() }
      finally unpersist(built)
    }
    val sp = docs.sparkSession
    import sp.implicits._
    counts.toDF("stage", "n_docs").orderBy(col("stage"))
  }

  /** One-row corpus report card — the WHOLE-CORPUS roll-up next to
    * [[Profile.corpusCard]]'s per-source datasheet (q221): that one
    * answers "what does each source look like", this one answers "what
    * is the dataset" in one row, including the cross-source fields a
    * per-source frame cannot carry (source CONCENTRATION, global
    * length envelope): sizes (docs/sources/langs/tokens/chars),
    * the doc-length envelope, the exact full-text duplicate rate
    * (1 − |distinct md5(text)|/n, 0.0 on this corpus — the spec
    * exercises the non-zero path on a designed dup fixture), source
    * concentration (top source's doc share), and the blank/null count.
    * Everything is one corpus pass plus three one-row aggregates —
    * exact integers and exact 6-dp ratios, fully SQL-replayable.
    */
  def reportCard(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", sourceCol: String = "source",
                 langCol: String = "lang"): DataFrame = {
    val live =
      docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
    val toks = size(TextAnalysis.tokensCol(col(textCol))).cast("long")
    val base = live.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(sourceCol)).as("n_sources"),
      countDistinct(col(langCol)).as("n_langs"),
      sum(toks).as("total_tokens"),
      sum(length(col(textCol)).cast("long")).as("total_chars"),
      min(toks).as("min_doc_tokens"),
      max(toks).as("max_doc_tokens"),
      countDistinct(md5(col(textCol).cast("binary"))).as("__ndist"))
    val blank = docs.agg(
      sum(when(col(textCol).isNull || trim(col(textCol)) === "", lit(1L))
        .otherwise(lit(0L))).as("blank_docs"))
    val topSrc = live.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")).as("__topc"))
    base.crossJoin(broadcast(blank)).crossJoin(broadcast(topSrc))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("total_tokens"), col("total_chars"),
        col("min_doc_tokens"), col("max_doc_tokens"),
        round(col("total_tokens").cast("double") /
          col("n_docs").cast("double"), 6).as("mean_doc_tokens6"),
        round(lit(1.0) - col("__ndist").cast("double") /
          col("n_docs").cast("double"), 6).as("exact_dup_rate6"),
        round(col("__topc").cast("double") /
          col("n_docs").cast("double"), 6).as("top_source_share6"),
        col("blank_docs"))
  }

  /** The pipeline's LAST MILE: write the curated corpus as
    * shard-balanced, sequence-packed training data, and return the
    * per-shard manifest computed FROM THE WRITTEN FILES — so the
    * manifest gate proves content preservation through the write (the
    * q150 compaction pattern), not just through the plan.
    *
    * Composition (every piece is an existing gated operator):
    *   - [[Sampling.rendezvousShard]] balances docs over `numShards`
    *     with minimal-movement semantics (zero shuffle, row-local);
    *   - [[Packing.packSequences]] greedily packs each shard's docs
    *     into ≤ `budget`-token sequences in deterministic id order
    *     (sequences never span shards — one key shuffle);
    *   - one hive-partitioned parquet write (`shard=N/…` — the layout
    *     a trainer's data loader consumes shard-parallel, and the same
    *     dynamic-pruning lever as the q129 IVF lists);
    *   - manifest per shard, from readback: docs, sequences, tokens,
    *     the max packed-sequence token total (the budget law made
    *     visible), and [[Fingerprint]]'s order-free additive checksum
    *     over (id, text) — STRING-cast, the q157 decimal-hop lesson.
    *
    * Scale shape: two corpus passes (write, manifest readback) plus
    * the packing shuffle; the manifest is numShards rows. At 100 TB
    * the write is the job — everything else rides it.
    */
  def export(docs: DataFrame, dir: String, numShards: Int, budget: Long,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val withTok = docs.filter(col(idCol).isNotNull)
      .select(col(idCol), col(textCol),
        size(TextAnalysis.tokensCol(col(textCol))).cast("long").as("n_tokens"))
    val sharded = Sampling.rendezvousShard(withTok, idCol, numShards)
    val packed = Packing.packSequences(sharded, "shard", idCol,
        "n_tokens", budget)
      .select(col("id").as(idCol), col("group").cast("int").as("shard"),
        col("seq_no"))
    sharded.select(col(idCol), col(textCol), col("n_tokens"))
      .join(packed, Seq(idCol))
      .select(col("shard"), col("seq_no"), col(idCol), col("n_tokens"),
        col(textCol))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val back = spark.read.parquet(dir)
      .withColumn("shard", col("shard").cast("int"))
    val seqTotals = back.groupBy(col("shard"), col("seq_no"))
      .agg(sum(col("n_tokens")).as("__seq_tokens"))
      .groupBy(col("shard"))
      .agg(max(col("__seq_tokens")).cast("long").as("max_seq_tokens"))
    back.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        (max(col("seq_no")) + 1).cast("long").as("n_seqs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        sum(Fingerprint.rowHashCol(Seq(col(idCol), col(textCol))))
          .cast("decimal(38,0)").cast("string").as("checksum"))
      .join(seqTotals, Seq("shard"))
  }
}
