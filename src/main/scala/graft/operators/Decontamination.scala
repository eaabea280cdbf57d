package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share long
  * n-gram spans with an evaluation set — the overlap check every LLM
  * training pipeline runs before a benchmark score means anything
  * (verbatim eval text inside the training corpus inflates the score).
  *
  * Method: exact n-token shingle collision (the published GPT-3/PaLM
  * recipe uses 8-13-gram overlap). Both sides hash shingles to 64-bit
  * keys with the [[graft.functions.TextHashes.HashedShingles]] codegen
  * expression — per-row, zero shuffle, distinct per doc — then collide
  * on the long key.
  *
  * Scale design (100 TB train side, MB-scale eval side): the eval
  * benchmark is structurally tiny, so its exploded shingle set is
  * broadcast — the train side is scanned ONCE with a map-side hash-join
  * probe, no shuffle of the corpus; only the matching (train, eval)
  * rows shuffle into the pair-count aggregate (map-side combine
  * applies). Documents shorter than `shingleSize` tokens have no
  * shingles and drop out on either side. If the "eval" side ever grows
  * past broadcast range, remove the hint and the same plan degrades
  * gracefully to a shuffle join on the shingle key.
  */
object Decontamination {

  /** Pairs (train_doc, eval_doc) sharing ≥ `minShared` distinct
    * `shingleSize`-gram shingles, with the shared count and the fraction
    * of the eval doc's shingles found in the train doc
    * (`overlap_frac` = n_shared / |eval shingles| — exact integer ratio
    * in double, engine-portable).
    */
  /** `broadcastEval = false` drops the broadcast hint for the case where
    * the "eval" side is NOT a tiny benchmark (e.g. a held-out split of
    * the corpus itself — the [[Curation]] pipeline's shape): the same
    * plan becomes a normal shuffle join on the shingle key, which
    * Catalyst/AQE can still broadcast if the side turns out small.
    */
  def contaminationPairs(train: DataFrame, eval: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         shingleSize: Int = 8, minShared: Long = 1L,
                         broadcastEval: Boolean = true): DataFrame = {
    require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    def shingles(df: DataFrame, outId: String) =
      df.select(col(idCol).as(outId),
        graft.functions.TextHashes.hashedShingles(
          TextAnalysis.tokensCol(col(textCol)), shingleSize).as("sh"))
    val evalSh = shingles(eval, "eval_doc")
      .select(col("eval_doc"), size(col("sh")).cast("long").as("n_eval"),
        explode(col("sh")).as("h"))
    val trainSh = shingles(train, "train_doc")
      .select(col("train_doc"), explode(col("sh")).as("h"))
    trainSh.join(if (broadcastEval) broadcast(evalSh) else evalSh, "h")
      .groupBy(col("train_doc"), col("eval_doc"))
      // n_eval is constant per eval_doc; max() just carries it through
      .agg(count(lit(1)).as("n_shared"), max(col("n_eval")).as("n_eval"))
      .filter(col("n_shared") >= minShared)
      .withColumn("overlap_frac", col("n_shared").cast("double") / col("n_eval"))
      .drop("n_eval")
  }

  /** Cross-source contamination matrix: for every unordered pair of
    * corpus sources, how many DISTINCT `shingleSize`-gram shingles they
    * share — the corpus-level duplication structure report (a high cell
    * means two "independent" sources copy from each other or a common
    * origin, and per-source mixing weights double-count that text).
    *
    * Scale shape: shingles reduce to distinct (source, hash) rows first
    * — the join fan-out per shingle is bounded by the number of SOURCES
    * carrying it (handfuls), never by document count; one shingle-keyed
    * shuffle plus the pair aggregation.
    */
  def crossSourceOverlap(docs: DataFrame, sourceCol: String = "source",
                         textCol: String = "text",
                         shingleSize: Int = 3): DataFrame = {
    require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")
    val bySource = docs.select(col(sourceCol).as("src"),
        graft.functions.TextHashes.hashedShingles(
          TextAnalysis.tokensCol(col(textCol)), shingleSize).as("sh"))
      .select(col("src"), explode(col("sh")).as("h"))
      .distinct()
    val a = bySource.select(col("src").as("source_a"), col("h"))
    val b = bySource.select(col("src").as("source_b"), col("h"))
    a.join(b, Seq("h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** SEMANTIC decontamination — the embedding-space complement of
    * [[contaminationPairs]]' n-gram matching: flag every corpus vector
    * whose max cosine similarity to ANY eval-benchmark vector reaches
    * `threshold` (paraphrased benchmark leakage that shares no
    * 13-gram). Cosines use the q18 codegen expression rounded 6 dp
    * (the established DuckDB `list_cosine_similarity DOUBLE[]`
    * contract); the max is a map-side-combinable agg over the
    * (corpus × eval) score stream.
    *
    * Output: `(idCol, max_cos6, contaminated)` — one row per corpus
    * vector, `contaminated` a BIGINT 1/0.
    *
    * Scale: eval benchmarks are MBs against 100 TB — broadcast by
    * default (`broadcastEval = false` degrades to a shuffle join, the
    * [[contaminationPairs]] contract). The stream is corpus × |eval|
    * rows, embarrassingly parallel, no driver state.
    */
  /** IVF-pruned [[semanticFlags]] — the 100 TB scale path when the
    * eval registry grows past the point where corpus × eval is
    * tolerable (consortium-scale registries run 10⁵⁺ vectors): each
    * EVAL vector probes only its `nProbe` nearest coarse cells
    * (per-`coarseCol` mean centroids, the [[Similarity.ivfTopK]]
    * machinery), and only corpus rows of probed cells are scored —
    * `nProbe/|cells|` of the corpus × eval product. Corpus vectors in
    * cells no eval vector probes report `max_cos6 = null` (the index
    * never scored them — an honest "not checked", not a fake 0) and
    * `contaminated = 0`.
    *
    * Probing can miss a contaminated vector whose cell ranks below
    * `nProbe` for every eval vector — measured agreement vs the exact
    * twin is gated (q297) and tracked per SF in docs/SCALING.md.
    *
    * Scale: centroids are a cell-bounded broadcast; the probed frame is
    * `|eval| × nProbe` rows (eval-scale — MBs), broadcast by default
    * with the same `broadcastEval = false` degrade as the exact twin.
    * The corpus is scanned once; no driver state.
    */
  def ivfFlags(corpus: DataFrame, eval: DataFrame, threshold: Double,
               nProbe: Int = 2, coarseCol: String = "label",
               idCol: String = "vec_id", vecCol: String = "embedding",
               portable: Boolean = false,
               broadcastEval: Boolean = true): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val centroids =
      Similarity.coarseCentroids(corpus, coarseCol, vecCol, portable)
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__eid")).orderBy(col("__cd").desc, col("cell"))
    val probed = eval
      .select(col(idCol).as("__eid"), col(vecCol).as("__ev"))
      .join(broadcast(centroids), lit(true))
      .withColumn("__cd",
        graft.functions.VectorMath.cosine(col("__ev"), col("centroid")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("cell"), col("__ev"))
    val scored = corpus
      .select(col(idCol), col(coarseCol).as("cell"), col(vecCol).as("__cv"))
      .join(if (broadcastEval) broadcast(probed) else probed, Seq("cell"))
      .select(col(idCol),
        round(graft.functions.VectorMath.cosine(col("__cv"), col("__ev")),
          6).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("max_cos6"))
    corpus.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), col("max_cos6"),
        when(col("max_cos6") >= threshold, lit(1L)).otherwise(lit(0L))
          .as("contaminated"))
  }

  /** Decontaminated train/eval split — the "make a CLEAN held-out
    * set" step in one call: split documents by the deterministic md5
    * ring (`evalFrac` lowest buckets become eval), then DROP from the
    * train side every document sharing ≥ `minShared` distinct
    * `shingleSize`-gram shingles with any eval document (the
    * [[contaminationPairs]] collision). Output one row per input doc:
    * `(idCol, split)` with split ∈ eval / train / dropped — so
    * attrition is visible, not silent. Docs shorter than the shingle
    * size can never be dropped (no shingles — both engines agree).
    *
    * Scale: the ring split is row-local; the collision scan is the
    * [[contaminationPairs]] plan; the dropped set joins back
    * ∝ contaminated docs. Unlike a benchmark decontamination, the
    * "eval" side here is `evalFrac` OF THE CORPUS — corpus-
    * proportional, not MB-scale — so `broadcastEval` defaults FALSE
    * (a 20 % slice of a 100 TB corpus cannot broadcast; the shuffle
    * join is the honest plan, and AQE still broadcasts it when the
    * slice is genuinely small). Pass true only when the eval side is
    * structurally tiny at every deployment scale.
    */
  def cleanSplit(docs: DataFrame, evalFrac: Double, shingleSize: Int = 8,
                 minShared: Long = 1L, idCol: String = "doc_id",
                 textCol: String = "text",
                 broadcastEval: Boolean = false): DataFrame = {
    require(evalFrac > 0 && evalFrac < 1,
      s"evalFrac must be in (0,1), got $evalFrac")
    val thr = Sampling.hexThreshold(evalFrac)
    val bkt = substring(
      md5(col(idCol).cast("string").cast("binary")), 1, 4)
    val evalSide = docs.filter(bkt < lit(thr))
    val trainSide = docs.filter(!(bkt < lit(thr)))
    val dropped = contaminationPairs(trainSide, evalSide, idCol, textCol,
        shingleSize, minShared, broadcastEval)
      .select(col("train_doc").as(idCol)).distinct()
      .withColumn("__d", lit(1L))
    docs.select(col(idCol),
        when(bkt < lit(thr), lit("eval")).otherwise(lit("train"))
          .as("__raw"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__raw") === "eval", lit("eval"))
          .when(col("__d").isNotNull, lit("dropped"))
          .otherwise(lit("train")).as("split"))
  }

  /** Canary-string scan — the eval-hygiene counterpart of shingle
    * matching: benchmark suites embed unique canary GUIDs (the
    * BIG-bench convention) precisely so a training corpus can be
    * audited for their presence with a plain substring scan. Per
    * canary: how many documents contain it and the total occurrence
    * count. Occurrences come from exact integer arithmetic —
    * `(len(text) − len(replace(text, canary, ''))) / len(canary)` —
    * identical in the DuckDB mirror, no regex escaping concerns.
    * ONE scan of the corpus for ALL canaries: a single projection
    * computes every canary's per-row occurrence count, one combinable
    * aggregate sums them element-wise, and the one-row result unpivots
    * to a row per canary — at 100 TB a C-canary audit costs one pass,
    * not C (the pre-round-13 shape was a C-way union of full scans).
    */
  def canaryHits(docs: DataFrame, canaries: Seq[String],
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(canaries.nonEmpty, "canaryHits needs at least one canary")
    require(canaries.forall(_.nonEmpty), "canaries must be non-empty")
    require(canaries.distinct.size == canaries.size,
      "canaries must be distinct")
    val occ = canaries.map { c =>
      ((length(col(textCol)) -
        length(call_function("replace", col(textCol), lit(c), lit("")))) /
        lit(c.length)).cast("long")
    }
    val aggs = canaries.indices.flatMap { i =>
      Seq(sum(when(col(s"__o$i") > 0L, lit(1L)).otherwise(lit(0L)))
            .as(s"__d$i"),
          sum(col(s"__o$i")).as(s"__h$i"))
    }
    docs.filter(col(textCol).isNotNull)
      .select(occ.zipWithIndex.map { case (o, i) => o.as(s"__o$i") }: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(canaries.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("canary"), col(s"__d$i").as("n_docs"),
          col(s"__h$i").as("n_hits"))
      }: _*)).as("__r"))
      .select(col("__r.canary"), col("__r.n_docs"), col("__r.n_hits"))
  }

  def semanticFlags(corpus: DataFrame, eval: DataFrame,
                    threshold: Double, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    broadcastEval: Boolean = true): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    val ev = eval.select(col(vecCol).as("__ev"))
    val scored = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .crossJoin(if (broadcastEval) broadcast(ev) else ev)
      .select(col(idCol),
        round(graft.functions.VectorMath.cosine(col("__cv"), col("__ev")),
          6).as("__c"))
    scored.groupBy(col(idCol))
      .agg(max(col("__c")).as("max_cos6"))
      .select(col(idCol), col("max_cos6"),
        when(col("max_cos6") >= threshold, lit(1L)).otherwise(lit(0L))
          .as("contaminated"))
  }
}
