package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-side lever of
  * billion-scale ANN: vectors split into `m` subvectors, each subspace
  * k-means-quantized to `ks` codes, so a d-float vector stores as m
  * small codes (64 floats → 8 bytes here) and query-vector dot products
  * are approximated from per-subspace lookup tables (asymmetric
  * distance computation) without touching the raw floats.
  *
  * Everything is DETERMINISTIC and engine-replayable — including the
  * k-means training:
  *   - init: the `ks` corpus rows with the smallest md5-derived 52-bit
  *     keys, selected by the bounded [[graft.functions.TopKAgg]] partial
  *     aggregate (no global window);
  *   - Lloyd iterations: assignment by the `xn² − 2·x·c + cn²` double
  *     tree (dot products fold in element order), ties to the lowest
  *     code; mean updates through per-(s, code, dim) DECIMAL(28,12)
  *     sums — order-free, so the trained codebook is a pure function of
  *     the corpus;
  *   - ADC: per-subspace partial dots DECIMAL(18,12)-quantized before
  *     the order-free per-(query, vector) sum.
  * The q149 oracle replays the WHOLE pipeline (init, every iteration,
  * encode, search) as one generated SQL chain.
  *
  * Scale shape: the codebook is structurally small (m·ks·dsub
  * parameters — broadcast is justified); each iteration is one
  * broadcast join + two map-side-combinable aggregations over the
  * corpus; the codebook frame is collected per iteration (m·ks rows —
  * parameter-bounded, and collecting breaks the iterative lineage the
  * way localCheckpoint does elsewhere). Encoding shuffles once on the
  * vector id. The relational ADC join materializes |queries|·m rows per
  * corpus code row before its partial agg — the oracle-replayable
  * verification shape; a production deployment would fold the LUT into
  * a codegen expression over the packed code array (same numbers,
  * no join).
  */
object Pq {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorMath.dot(a, b)

  /** (vec_id, s, x, xn2): the corpus exploded to double subvectors. */
  private def subvectors(df: DataFrame, m: Int, dsub: Int,
                         idCol: String, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("vec_id"),
        posexplode(array((0 until m).map(s =>
          slice(col(vecCol), s * dsub + 1, dsub).cast("array<double>")): _*))
          .as(Seq("s", "x")))
      .withColumn("xn2", dot(col("x"), col("x")))

  private val cbSchema = StructType(Seq(
    StructField("s", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("cent", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("cn2", DoubleType, nullable = false)))

  /** One assignment pass: each (vec_id, s) row keeps its nearest code
    * under `cb` — `min(struct(dist, code, x))` collapses the ks-way
    * expansion in the map-side partial aggregate.
    */
  private def assign(subn: DataFrame, cb: DataFrame): DataFrame =
    subn.join(broadcast(cb), Seq("s"))
      .withColumn("dist",
        col("xn2") - (lit(2.0) * dot(col("x"), col("cent"))) + col("cn2"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("dist"), col("code"), col("x"))).as("b"))
      .select(col("vec_id"), col("s"), col("b.code").as("code"),
        col("b.x").as("x"), col("b.dist").as("dist"))

  /** Train per-subspace codebooks; returns (s, code, cent, cn2) with
    * `code` ∈ [0, ks) (codes whose cluster empties out drop — the
    * standard Lloyd behavior, identical in the oracle replay).
    */
  def trainCodebooks(corpus: DataFrame, m: Int = 8, ks: Int = 16,
                     iters: Int = 3, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    trainOnSubn(subvectors(corpus, m, subDim(corpus, m, vecCol),
      idCol, vecCol), ks, iters)

  private def trainOnSubn(subn: DataFrame, ks: Int, iters: Int): DataFrame = {
    val spark = subn.sparkSession
    // init: ks rows by ascending md5-52-bit key (TopKAgg on the negated
    // key — bounded partial agg, no global window); position = code.
    // The s = 0 slice is one row per vector — no distinct needed.
    val u = conv(substring(md5(col("vec_id").cast("string").cast("binary")),
      1, 13), 16, 10).cast("double")
    val initIds = subn.filter(col("s") === 0)
      .select(col("vec_id").cast("long").as("vec_id"))
      .agg(graft.functions.TopKAgg.topK(-u, col("vec_id"), ks).as("top"))
      .select(posexplode(col("top")).as(Seq("code", "e")))
      .select(col("e.id").as("vec_id"), col("code").cast("int").as("code"))
    var cb = toLocalCodebook(spark,
      subn.join(initIds, "vec_id")
        .select(col("s"), col("code"), col("x").as("cent"),
          col("xn2").as("cn2")))
    for (_ <- 1 to iters) {
      val cents = assign(subn, cb)
        .select(col("s"), col("code"), posexplode(col("x")).as(Seq("j", "xx")))
        .groupBy(col("s"), col("code"), col("j"))
        .agg(sum(col("xx").cast("decimal(28,12)")).as("sm"),
          count(lit(1)).as("n"))
        .withColumn("comp", col("sm").cast("double") / col("n"))
        .groupBy(col("s"), col("code"))
        .agg(array_sort(collect_list(struct(col("j"), col("comp")))).as("pc"))
        .select(col("s"), col("code"),
          expr("transform(pc, p -> p.comp)").as("cent"))
        .withColumn("cn2", dot(col("cent"), col("cent")))
      cb = toLocalCodebook(spark, cents)
    }
    cb
  }

  /** Collect a parameter-bounded codebook frame and re-emit it as a
    * local literal frame: breaks the per-iteration lineage growth and
    * makes the broadcast side trivially known-small.
    */
  private def toLocalCodebook(spark: org.apache.spark.sql.SparkSession,
                              cb: DataFrame): DataFrame = {
    val rows = cb.select(col("s").cast("int"), col("code").cast("int"),
        col("cent").cast("array<double>"), col("cn2").cast("double"))
      .collect()
      .map(r => Row(r.getInt(0), r.getInt(1), r.getSeq[Double](2), r.getDouble(3)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), cbSchema)
  }

  /** Encode the corpus under trained codebooks: (vec_id, s, code) — the
    * relational (exploded) code layout the ADC join consumes directly.
    */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int = 8,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(subvectors(corpus, m, subDim(corpus, m, vecCol), idCol, vecCol),
        codebooks)
      .select(col("vec_id"), col("s"), col("code"))

  /** Approximate top-k by asymmetric distance: train on the corpus,
    * encode it, score each query against the CODES ONLY (per-subspace
    * partial dots from the lookup join, decimal-quantized before the
    * order-free sum). Output: query_id, neighbor_id, rank, approx_dot.
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
              ks: Int = 16, iters: Int = 3, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val dsub = subDim(corpus, m, vecCol)
    // the subvector frame feeds the init join, every Lloyd assignment,
    // and the final encode (iters + 2 consumers) — computed once and
    // registered with TrackedCaches (released via Dedup.releaseCaches)
    val subn = TrackedCaches.track(
      subvectors(corpus, m, dsub, idCol, vecCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cb = trainOnSubn(subn, ks, iters)
    val codes = assign(subn, cb).select(col("vec_id"), col("s"), col("code"))
    adcScoreTail(codes, cb, queries, m, dsub, k, idCol, vecCol)
  }

  /** The shared ADC scoring tail: LUT from queries × codebooks,
    * per-(s, code) partial dots decimal-quantized before the
    * order-free sum, bounded top-k. Used by [[adcTopK]] (fresh
    * training) and [[adcTopKFromIndex]] (persisted codes) — one code
    * path, so the two are byte-identical by construction.
    */
  private def adcScoreTail(codes: DataFrame, cb: DataFrame,
                           queries: DataFrame, m: Int, dsub: Int, k: Int,
                           idCol: String, vecCol: String): DataFrame = {
    val lut = subvectors(queries, m, dsub, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("s"), col("x"))
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        dot(col("x"), col("cent")).cast("decimal(18,12)").as("pq"))
    val scored = codes.join(lut, Seq("s", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pq")).cast("double").as("score"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("score"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        (round(col("col.score"), 6) + lit(0.0)).as("approx_dot"))
  }

  /** Persist the PQ index — the fourth index family's train-once /
    * search-anywhere split next to MinHash, inverted-postings and IVF:
    * `dir/codebooks` (m × ks rows — parameter-scale; double centroids
    * survive parquet bit-exact) and `dir/codes` (one (vec_id, s, code)
    * row per subspace — the 4-bit-per-subspace compressed corpus, the
    * thing PQ exists to ship instead of raw vectors). `dir/meta` pins
    * (m, dsub) so a reader needs no out-of-band parameters.
    */
  /** The PQ index's swap-managed generation frames — a rebuild
    * publishes all three as one generation; the append adds code FILES
    * only (no swap). */
  private val pqFrames = Seq("codebooks", "codes", "meta")

  def writePqIndex(corpus: DataFrame, dir: String, m: Int = 8,
                   ks: Int = 16, iters: Int = 3, idCol: String = "vec_id",
                   vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexSwap.clean(fs, dir, pqFrames)
    val dsub = subDim(corpus, m, vecCol)
    val subn = TrackedCaches.track(
      subvectors(corpus, m, dsub, idCol, vecCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cb = trainOnSubn(subn, ks, iters)
    cb.write.mode("overwrite")
      .parquet(IndexSwap.stagedPath(dir, "codebooks"))
    assign(subn, cb).select(col("vec_id"), col("s"), col("code"))
      .write.mode("overwrite").parquet(IndexSwap.stagedPath(dir, "codes"))
    import spark.implicits._
    Seq((m, dsub)).toDF("m", "dsub")
      .write.mode("overwrite").parquet(IndexSwap.stagedPath(dir, "meta"))
    // a RETRAIN over a live index publishes one generation — a crash
    // can no longer pair new codebooks with old codes (whose ADC
    // lookups would silently score garbage)
    IndexSwap.swapAll(fs, dir, pqFrames)
  }

  /** [[adcTopK]] answered FROM the persisted index — byte-identical by
    * contract (same scoring tail over the same codebooks and codes;
    * zero training jobs, zero raw-vector reads on the corpus side).
    */
  def adcTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
                       dir: String, queries: DataFrame, k: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, pqFrames)
    val meta = spark.read.parquet(s"$dir/meta").head()
    adcScoreTail(spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/codebooks"), queries,
      meta.getAs[Int]("m"), meta.getAs[Int]("dsub"), k, idCol, vecCol)
  }

  /** Incremental PQ maintenance — the frozen-codebook append every
    * production PQ deployment runs (FAISS `add` semantics): the batch
    * encodes under the PERSISTED codebooks and its code rows append as
    * new files; the codebooks do NOT retrain, so — unlike the exact
    * q312/q320/q327 appends — append ≠ rebuild when the data
    * distribution drifts (a rebuild would move centroids). That drift
    * trade is the documented contract: probing the appended index IS
    * byte-identical to encoding corpus ∪ batch under the ORIGINAL
    * codebooks, which is what the gate pins; periodic re-training is
    * the [[writePqIndex]] call itself.
    */
  def appendPqIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                    batch: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    dedupeBatch: Boolean = true): Unit = {
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, pqFrames)
    val meta = spark.read.parquet(s"$dir/meta").head()
    val m = meta.getAs[Int]("m")
    // encode() re-derives dsub from the batch's own vector length, so a
    // batch with a different embedding dimension would append garbage
    // codes SILENTLY — pin it to the build's persisted dsub instead
    val batchDsub = subDim(batch, m, vecCol)
    require(batchDsub == meta.getAs[Int]("dsub"),
      s"appendPqIndex: batch subvector dim $batchDsub (m = $m) != the " +
        s"index's persisted dsub ${meta.getAs[Int]("dsub")} — the batch's " +
        "embedding dimension does not match the build corpus")
    // ids already encoded drop out (replay-safe append — a re-delivered
    // batch would otherwise duplicate its code rows and double-score in
    // ADC); one column-pruned anti-join against the stored vec ids
    val fresh =
      if (!dedupeBatch) batch
      else batch.join(spark.read.parquet(s"$dir/codes")
          .select(col("vec_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
    // a fully-replayed batch dedupes to empty — a no-op append, not a
    // crash in encode's vector-length derivation
    if (!fresh.isEmpty)
      encode(fresh, spark.read.parquet(s"$dir/codebooks"), m, idCol, vecCol)
        .write.mode("append").parquet(s"$dir/codes")
  }

  /** Staleness audit for the frozen-codebook append — the monitor that
    * makes [[appendPqIndex]]'s documented-inexact contract OPERABLE:
    * the quantization (reconstruction) error each batch vector pays
    * under the persisted codebooks, compared against the build
    * corpus's own error. An in-distribution batch reconstructs about
    * as well as the data the codebooks were trained on (ratio ≈ 1); a
    * drifted batch lands far from every centroid and the ratio blows
    * up — the signal that it is time to pay the [[writePqIndex]]
    * retrain. Per-subvector error is the assignment distance itself
    * (`xn² − 2·x·c + cn²` to the CHOSEN code), floor-quantized to
    * 6-dp MICRO-UNITS (`floor(d·1e6 + 0.5)` — the q157 exact-long
    * pattern; a straight decimal cast diverges cross-engine in the
    * last digit over thousands of rows) before the order-free per-side
    * BIGINT sum, so the whole readout is engine-replayable; the
    * mean-error ratio is double arithmetic over exact operands, and
    * `stale` fires at `ratioThreshold`.
    *
    * One row: (n_build, n_batch, err_build, err_batch, err_ratio,
    * stale). Scale shape: one broadcast-codebook join + one combinable
    * agg per side — the encode pass's own cost, no extra shuffle.
    */
  def stalenessAudit(spark: org.apache.spark.sql.SparkSession, dir: String,
                     buildCorpus: DataFrame, batch: DataFrame,
                     ratioThreshold: Double = 2.0,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, pqFrames)
    val meta = spark.read.parquet(s"$dir/meta").head()
    val m = meta.getAs[Int]("m")
    val dsub = meta.getAs[Int]("dsub")
    require(subDim(buildCorpus, m, vecCol) == dsub &&
      subDim(batch, m, vecCol) == dsub,
      s"stalenessAudit: corpus/batch subvector dims must match the " +
        s"index's persisted dsub $dsub (m = $m)")
    val cb = spark.read.parquet(s"$dir/codebooks")
    def errOf(df: DataFrame, e: String, n: String) =
      assign(subvectors(df, m, dsub, idCol, vecCol), cb)
        .agg(sum(floor(col("dist") * lit(1e6) + lit(0.5)).cast("long"))
            .as(e),
          count(when(col("s") === 0, 1)).as(n))
    errOf(buildCorpus, "__eb", "__nb")
      .crossJoin(errOf(batch, "__ea", "__na"))
      .withColumn("__ratio",
        (col("__ea").cast("double") / col("__na")) /
          (col("__eb").cast("double") / col("__nb")))
      .select(
        col("__nb").as("n_build"), col("__na").as("n_batch"),
        col("__eb").as("err_build_u6"),
        col("__ea").as("err_batch_u6"),
        (round(col("__ratio"), 6) + lit(0.0)).as("err_ratio"),
        (col("__ratio") >= ratioThreshold).cast("long").as("stale"))
  }

  /** IVF-ADC: the composition that makes PQ scale — each query scores
    * codes in its `nProbe` nearest coarse cells only, so search cost is
    * queries × (nProbe/nlist) × corpus instead of queries × corpus
    * (the [[adcTopK]] gate's documented super-linear term). Coarse
    * cells come from `coarseCol` with decimal-exact centroids (the
    * q129-gated IVF path); PQ trains on the raw vectors corpus-wide
    * (no residual encoding — documented divergence from IVFADC's
    * residual variant, which an engine-replayable oracle cannot afford
    * a second training chain for). Same output shape as [[adcTopK]];
    * a query returns fewer than k rows when its probed cells hold
    * fewer vectors — the price of pruning, measured by the recall
    * spec, never silently padded.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nProbe: Int = 2, m: Int = 8, ks: Int = 16, iters: Int = 3,
                 coarseCol: String = "label", idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val dsub = subDim(corpus, m, vecCol)
    val centroids = Similarity.coarseCentroids(corpus, coarseCol, vecCol,
      portable = true)
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    // nlist-bounded centroid frame (one row per coarse cell) — the
    // same structural-smallness argument as the IVF probe path
    val probed = q.join(broadcast(centroids), lit(true))
      .withColumn("cdist",
        graft.functions.VectorMath.cosine(col("qv"), col("centroid")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nProbe)
      .select(col("query_id"), col("cell"))
    val subn = TrackedCaches.track(
      subvectors(corpus, m, dsub, idCol, vecCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cb = trainOnSubn(subn, ks, iters)
    val codes = assign(subn, cb).select(col("vec_id"), col("s"), col("code"))
    val cells = corpus.select(col(idCol).as("vec_id"),
      col(coarseCol).as("cell"))
    val lut = subvectors(queries, m, dsub, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("s"), col("x"))
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        dot(col("x"), col("cent")).cast("decimal(18,12)").as("pq"))
    val scored = codes.join(cells, "vec_id")
      .join(probed, Seq("cell"))
      .join(lut, Seq("query_id", "s", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pq")).cast("double").as("score"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("score"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        (round(col("col.score"), 6) + lit(0.0)).as("approx_dot"))
  }

  /** IVFADC with RESIDUAL encoding — the Jégou et al. §IV.A variant
    * [[ivfAdcTopK]] documents as its divergence: PQ trains on the
    * residuals `x − c(cell(x))` against the coarse decimal-exact
    * centroids, so the code budget describes WITHIN-cell structure
    * instead of re-describing every cell's offset, and recall at equal
    * (m, ks) budget is ≥ the raw-vector variant's (pinned by PqSpec on
    * offset-dominated clustered data). The dot product reconstructs
    * exactly-decomposed as `q·x = q·c + q·(x−c)`: the first term is
    * computed exactly per (query, probed cell), the second is the
    * residual ADC lookup — so `approx_dot` stays an approximation of
    * the same `q·x` the raw variant scores, directly comparable.
    *
    * Scale shape: identical to [[ivfAdcTopK]] plus one broadcast
    * centroid join to residualize the corpus (nlist-bounded side) —
    * the LUT grows to nProbe × m × ks entries per query
    * (cell-specific residual queries), still parameter-bounded.
    */
  def ivfAdcResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                         nProbe: Int = 2, m: Int = 8, ks: Int = 16,
                         iters: Int = 3, coarseCol: String = "label",
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val dsub = subDim(corpus, m, vecCol)
    val centroids = Similarity.coarseCentroids(corpus, coarseCol, vecCol,
      portable = true)
    val cells = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("vec_id"), col(coarseCol).as("cell"))
    // residualize the corpus against its own cell centroid (broadcast:
    // nlist-bounded, one row per coarse cell)
    val resCorpus = corpus.filter(col(vecCol).isNotNull)
      .join(broadcast(centroids), col(coarseCol) === col("cell"))
      .select(col(idCol),
        zip_with(col(vecCol).cast("array<double>"), col("centroid"),
          (a, b) => a - b).as(vecCol))
    val subn = TrackedCaches.track(
      subvectors(resCorpus, m, dsub, idCol, vecCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cb = trainOnSubn(subn, ks, iters)
    val codes = assign(subn, cb).select(col("vec_id"), col("s"), col("code"))
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    // probed cells keep their centroid: the exact q·c term and the
    // cell-specific LUT both need it
    val probed = q.join(broadcast(centroids), lit(true))
      .withColumn("cdist",
        graft.functions.VectorMath.cosine(col("qv"), col("centroid")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nProbe)
      .select(col("query_id"), col("cell"),
        col("qv").cast("array<double>").as("qv"), col("centroid"))
    val qparts = probed
      .select(col("query_id"), col("cell"),
        dot(col("qv"), col("centroid")).as("qc"),
        posexplode(array((0 until m).map(s =>
          slice(col("qv"), s * dsub + 1, dsub)): _*)).as(Seq("s", "x")))
    val lut = qparts.join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("cell"), col("qc"), col("s"), col("code"),
        dot(col("x"), col("cent")).cast("decimal(18,12)").as("pq"))
    // join shape matters at scale: restricting via `probed` FIRST keeps
    // the expansion keyed by (query_id, …) — high cardinality, evenly
    // sharded — where a direct lut join on (cell, s, code) would hash
    // on nlist × m × ks ≈ 10³ distinct keys (measured 2× slower at sf1,
    // 80 s vs 41 s, from the skewed low-key shuffle)
    val scored = codes.join(cells, "vec_id")
      .join(probed.select(col("query_id"), col("cell")), Seq("cell"))
      .join(lut, Seq("query_id", "cell", "s", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg((sum(col("pq")).cast("double") + max(col("qc"))).as("score"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("score"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        (round(col("col.score"), 6) + lit(0.0)).as("approx_dot"))
  }

  /** Ragged input would silently slice short/empty subvectors whose
    * null VecDot distances then sort nulls-first into code 0 — corrupt
    * codebooks with no error — so the dim contract is enforced up
    * front, the same guard `Embeddings.covarianceRelational` uses.
    */
  private def subDim(corpus: DataFrame, m: Int, vecCol: String): Int = {
    val dims = corpus.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).distinct()
      .limit(3).collect().map(_.getInt(0))
    require(dims.nonEmpty, "PQ needs at least one non-null vector")
    require(dims.length == 1,
      s"ragged vectors: saw lengths ${dims.sorted.mkString(", ")}")
    require(dims(0) % m == 0, s"dim ${dims(0)} must divide into $m subspaces")
    dims(0) / m
  }
}
