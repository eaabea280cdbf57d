package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): exact
  * brute-force cosine top-k as the verifiable baseline, plus two scale
  * paths — random-hyperplane LSH bucketing and IVF-style coarse-partition
  * pruning.
  *
  * All vector math is codegen'd higher-order functions (`zip_with` +
  * `aggregate`) accumulating in DOUBLE in array order — deterministic and
  * engine-portable (the oracle recomputes the identical fold). No UDFs.
  *
  * Scale design: brute force is O(|queries| × |corpus|) — correct shape
  * only when the query side is small enough to `broadcast()` (it is: the
  * corpus never shuffles, each corpus partition streams against the
  * broadcast queries, and the only shuffle is the final per-query top-k,
  * which is k-bounded). For corpus×corpus problems use the LSH/IVF paths:
  * candidates come from equi-joins on bucket keys, so the quadratic term
  * is confined to within-bucket work.
  */
object Similarity {

  /** Dot product of two equal-length float vectors, accumulated in double
    * in element order — a native codegen expression
    * ([[graft.functions.VectorMath.VecDot]]); the equivalent
    * `aggregate(zip_with(...))` higher-order-function fold is interpreted
    * and ~10× slower.
    */
  def dotCol(a: Column, b: Column): Column = graft.functions.VectorMath.dot(a, b)

  def normCol(a: Column): Column = graft.functions.VectorMath.norm(a)

  def cosineCol(a: Column, b: Column): Column = graft.functions.VectorMath.cosine(a, b)

  /** Per-query top-k from (query_id, neighbor_id, cosine) scored rows via
    * the bounded [[graft.functions.TopKAgg]] aggregate — each map task
    * pre-reduces to ≤ k rows per query BEFORE the shuffle (the
    * window/row_number formulation shuffles and sorts the full scored
    * set). Element order of the aggregate equals
    * `row_number() OVER (ORDER BY cosine DESC, neighbor_id)`.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("cosine"), col("neighbor_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("col.score"), 6).as("cosine"))

  /** Exact top-k nearest neighbors (cosine) of each query vector.
    * The query side is broadcast (small by contract); rank ties break on
    * neighbor id for determinism. Self-matches are excluded when query ids
    * collide with corpus ids.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // norms factored out per ROW (bit-identical double arithmetic to
    // cosineCol, which would recompute both norms per PAIR - 3 array
    // passes per scored pair instead of 1)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", normCol(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", normCol(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dotCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topKPerQuery(scored, k)
  }

  /** Random-hyperplane (sign) LSH signature: bit `i` is the sign of the
    * dot product with pseudo-random hyperplane `(seed, i)`, components
    * derived deterministically from a splitmix64 of (seed, plane,
    * component) — reproducible across runs and executors with zero driver
    * state, fully code-generated
    * ([[graft.functions.VectorMath.HyperplaneSig]]).
    */
  def hyperplaneSignatureCol(vec: Column, numBits: Int, seed: Int = 0,
                             portable: Boolean = false): Column =
    if (portable) graft.functions.VectorMath.hyperplaneSigMd5(vec, numBits, seed)
    else graft.functions.VectorMath.hyperplaneSig(vec, numBits, seed)

  /** Approximate top-k: multi-table LSH-bucketed search (standard
    * OR-amplification — a single table's all-bits-equal test has recall
    * `p^b`, vanishing for any useful `b`; `L` independent tables lift it
    * to `1-(1-p^b)^L`). Candidates come from equi-joins on
    * (table, signature) keys — no broadcast needed, so this shape also
    * works corpus×corpus, and the per-table explode multiplies data by
    * only `L`. Recall < 1 by construction; verified against
    * [[bruteForceTopK]] in tests rather than an oracle.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numBits: Int = 8,
              numTables: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding",
              portable: Boolean = false): DataFrame = {
    // norm computed once per vector BEFORE the L-way posexplode
    def tabled(df: DataFrame, id: String, vec: String, nrm: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          normCol(col(vecCol)).as(nrm),
          posexplode(array((0 until numTables).map(t =>
            hyperplaneSignatureCol(col(vecCol), numBits, t, portable)): _*))
            .as(Seq("tbl", "sig")))
    val q = tabled(queries, "query_id", "qv", "qn")
    val c = tabled(corpus, "neighbor_id", "cv", "cn")
    val cand = c.join(q, Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(cand.withColumn("cosine",
      dotCol(col("qv"), col("cv")) / (col("qn") * col("cn"))), k)
  }

  /** Per-query agreement of an approximate top-k result against its
    * exact twin — the deterministic DERIVED frame that gates the
    * fast-float production paths (q127) on the driver board: float
    * nondeterminism lives in the last ulp of cosine scores, so the raw
    * neighbor lists are not hash-stable, but "how many of the exact
    * top-k did the approximate path find" is an integer that only moves
    * when recall genuinely changes. Output: (query_id, n_approx, n_hit)
    * with `n_hit = |approx ∩ exact|` per query.
    *
    * Scale: both inputs are already k-bounded per query, so the join and
    * the per-query count are trivially small regardless of corpus size.
    */
  def topKAgreement(approx: DataFrame, exact: DataFrame): DataFrame =
    approx.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_approx"), count(col("__hit")).as("n_hit"))

  /** One-row agreement summary of an approximate pair set against its
    * exact twin, both keyed by (id_a, id_b) — the q128 derived gate:
    * `n_exact` (cross-checked against the oracle's brute-force SQL),
    * `n_extra` (approx pairs NOT in the exact set — structurally 0 for
    * verify-then-emit LSH because both paths filter on the identical
    * codegen cosine expression), and `n_hit` (pairs both found).
    */
  def pairAgreement(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("id_a"), col("id_b")).withColumn("__a", lit(1))
    val e = exact.select(col("id_a"), col("id_b")).withColumn("__e", lit(1))
    a.join(e, Seq("id_a", "id_b"), "full_outer")
      .agg(count(col("__e")).as("n_exact"),
        sum(when(col("__a").isNotNull && col("__e").isNull, 1L)
          .otherwise(0L)).as("n_extra"),
        sum(when(col("__a").isNotNull && col("__e").isNotNull, 1L)
          .otherwise(0L)).as("n_hit"))
  }

  /** Per-cell mean vectors — the coarse quantizer shared by [[ivfTopK]]
    * and [[semDedup]]. Default = the typed VectorAvg UDAF — one shuffle
    * row per cell instead of posexplode's dim rows per vector, but its
    * double accumulation is partition-order-dependent in the last ulp.
    * `portable` = the EXACT relational form: per-(cell, dim) sums through
    * DECIMAL(28,12) (order-free), components back to double by one
    * division — bit-reproducible and replayable in SQL, which is what
    * lets the oracles regenerate identical centroids. Costs a
    * dim-rows-per-vector explode shuffle; centroid building is a tiny
    * fraction of either consumer's cost.
    */
  private[operators] def coarseCentroids(corpus: DataFrame, coarseCol: String,
                              vecCol: String, portable: Boolean): DataFrame =
    if (portable) {
      // cells are few — centroidsFromMoments' interpreted transform
      // runs once per cell
      centroidsFromMoments(cellMoments(corpus, coarseCol, vecCol))
    } else corpus
      .groupBy(col(coarseCol).as("cell"))
      .agg(graft.functions.VectorAvg.vectorAvg(col(vecCol)).as("centroid"))

  /** Probe + rerank shared by [[ivfTopK]] (in-memory index) and
    * [[ivfTopKFromIndex]] (loaded index): each query keeps its `nProbe`
    * nearest centroids, then exact-reranks only the corpus rows of those
    * cells. `cells` carries (neighbor_id, cv, cell).
    */
  private def ivfProbeRerank(centroids: DataFrame, cells: DataFrame,
                             queries: DataFrame, k: Int, nProbe: Int,
                             idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", normCol(col("qv")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    val probed = q.join(broadcast(centroids), lit(true))
      .withColumn("cdist", cosineCol(col("qv"), col("centroid")))
      .withColumn("prank", row_number().over(probeW)).filter(col("prank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val c = cells.withColumn("cn", normCol(col("cv")))
    val scored = c.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dotCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topKPerQuery(scored, k)
  }

  /** IVF-style search: centroids are the per-`coarseCol` mean vectors
    * (computed once, broadcast); each query probes only its
    * `nProbe` nearest coarse partitions, pruning the corpus scan to those
    * partitions — the inverted-file pattern expressed as two broadcast
    * joins plus a partition-pruned rerank.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nProbe: Int = 2,
              coarseCol: String = "label", idCol: String = "vec_id",
              vecCol: String = "embedding", portable: Boolean = false): DataFrame = {
    val centroids = coarseCentroids(corpus, coarseCol, vecCol, portable)
    val cells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(coarseCol).as("cell"))
    ivfProbeRerank(centroids, cells, queries, k, nProbe, idCol, vecCol)
  }

  /** The IVF index's swap-managed generation frames: an APPEND swaps
    * moments+centroids (lists appends new files — no generation
    * hazard); a REBUILD publishes all three as one generation.
    * `ivfAllFrames` is PUBLIC for the same reason as
    * [[Dedup.minhashFrames]]: maintenance tooling must sweep the
    * whole family, never a hand-listed subset. */
  private val ivfFrames = Seq("moments", "centroids")
  val ivfAllFrames = Seq("moments", "centroids", "lists")

  /** Persist the IVF index for repeated-query use: `dir/centroids/` holds
    * the per-cell mean vectors, `dir/lists/` the inverted lists as a
    * HIVE-PARTITIONED layout (`cell=N/...`). The layout is the scale
    * lever: a search from the loaded index joins the list scan against
    * the broadcast probe set on the partition column, so Spark's dynamic
    * partition pruning reads ONLY the probed cells' directories —
    * `nProbe/k` of a 100 TB corpus instead of all of it, with zero index
    * rebuild cost per query batch.
    *
    * Round-trip exactness: centroid components (double) and embeddings
    * (float) are stored bit-exact in parquet, so a loaded-index search
    * returns byte-identical results to [[ivfTopK]] over the same corpus
    * (oracle-gated at q129).
    */
  def writeIvfIndex(corpus: DataFrame, dir: String,
                    coarseCol: String = "label", idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    portable: Boolean = false,
                    quantizeLists: Boolean = false): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(corpus.sparkSession.sparkContext.hadoopConfiguration)
    IndexSwap.clean(fs, dir, ivfAllFrames)
    coarseCentroids(corpus, coarseCol, vecCol, portable)
      .write.mode("overwrite")
      .parquet(IndexSwap.stagedPath(dir, "centroids"))
    // the portable build ALSO persists the per-(cell, component)
    // decimal MOMENTS (Σx, n) the centroids derive from: decimal sums
    // are exactly mergeable, which is what lets [[appendIvfIndex]]
    // update centroids append ≡ rebuild EXACT instead of approximating
    // with frozen centroids (the usual IVF drift trade)
    if (portable)
      cellMoments(corpus, coarseCol, vecCol)
        .write.mode("overwrite")
        .parquet(IndexSwap.stagedPath(dir, "moments"))
    // quantizeLists = the FAISS IVF+SQ8 serving config: the inverted
    // lists store (scale, int8 codes) instead of raw floats — the 4×
    // IO/storage lever at 100 TB (centroids/moments stay raw: the
    // quantizer trains on the raw corpus; only the BULK is compressed).
    // Search dequantizes candidates (exact int→double math), so the
    // quantized search replays in SQL like everything else.
    quantizedListRows(corpus, coarseCol, idCol, vecCol, quantizeLists)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(IndexSwap.stagedPath(dir, "lists"))
    // a rebuild over a live index publishes one generation (crash-safe)
    IndexSwap.swapAll(fs, dir,
      if (portable) ivfAllFrames else Seq("centroids", "lists"))
    // a NON-portable rebuild over a previously-portable index must not
    // leave the old moments frame behind — a later append would merge
    // against stale state (the moments/lists consistency check in
    // [[appendIvfIndex]] backstops the crash window before this delete)
    if (!portable)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/moments"), true)
  }

  /** The list-row projection shared by build and append: raw
    * (neighbor_id, cv, cell) or SQ8-quantized
    * (neighbor_id, scale, quant, cell). */
  private def quantizedListRows(corpus: DataFrame, coarseCol: String,
                                idCol: String, vecCol: String,
                                quantize: Boolean): DataFrame =
    if (!quantize)
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(coarseCol).as("cell"))
    else {
      val sc = graft.functions.VectorMath.maxAbs(col(vecCol))
      corpus
        .withColumn("scale", sc)
        .select(col(idCol).as("neighbor_id"), col("scale"),
          graft.functions.VectorMath.quantize8(col(vecCol), col("scale"))
            .as("quant"),
          col(coarseCol).as("cell"))
    }

  /** Per-(cell, component) exact first moments: (cell, j, s, n). */
  private def cellMoments(corpus: DataFrame, coarseCol: String,
                          vecCol: String): DataFrame =
    corpus
      .select(col(coarseCol).as("cell"),
        posexplode(col(vecCol)).as(Seq("j", "x")))
      .groupBy(col("cell"), col("j"))
      .agg(sum(col("x").cast("decimal(28,12)")).as("s"),
        count(lit(1)).as("n"))

  /** The portable centroid derivation from a moments frame — the
    * exact tail of [[coarseCentroids]]' portable branch.
    */
  private def centroidsFromMoments(moments: DataFrame): DataFrame =
    moments
      .withColumn("comp", col("s").cast("double") / col("n"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("j"), col("comp")))).as("pc"))
      .select(col("cell"), expr("transform(pc, p -> p.comp)").as("centroid"))

  /** Incremental IVF maintenance — the third index family's append
    * path next to the MinHash (q312) and inverted-index (q320) ones,
    * and EXACT like them: cells are coarse-label-derived (per-vector,
    * batch-local), the batch's list rows land as new files under
    * their cell partitions, and the persisted decimal moments merge
    * by plain decimal addition — so the re-derived centroids are
    * bit-identical to a full rebuild's, and probing the appended
    * index ≡ probing build(corpus ∪ batch). Requires a
    * `portable = true` build (the moments frame is the contract).
    * Ids already in the index are dropped from the batch
    * (`dedupeBatch`, default on) — without the guard a failure-REPLAYED
    * batch would merge its moments twice and silently move every
    * touched centroid, the exact corruption the decimal-merge design
    * exists to prevent; with it, replay is a no-op and the append is
    * effectively-once. The moments/centroids rewrites are k·d-row
    * frames (cell count × dimension — parameter-scale), staged and
    * swapped; corpus list files are never rewritten.
    */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                     batch: DataFrame, coarseCol: String = "label",
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     dedupeBatch: Boolean = true): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    IndexSwap.recover(fs, dir, ivfAllFrames)
    require(fs.exists(p(s"$dir/moments")),
      s"$dir was not built with portable = true (no moments frame) — " +
        "appendIvfIndex needs the exactly-mergeable decimal moments")
    // staleness guard: the moments frame must account for EXACTLY the
    // vectors in the lists — a non-portable rebuild that crashed before
    // clearing an older portable build's moments (or any other mixed
    // state) refuses loudly instead of merging against stale moments
    val momentsVecs = spark.read.parquet(s"$dir/moments")
      .filter(col("j") === 0).agg(sum(col("n"))).head().getLong(0)
    val listVecs = spark.read.parquet(s"$dir/lists").count()
    require(momentsVecs == listVecs,
      s"$dir: moments account for $momentsVecs vectors but lists hold " +
        s"$listVecs — stale moments (non-portable rebuild?); rebuild " +
        "with portable = true before appending")
    val fresh =
      if (!dedupeBatch) batch
      else batch.join(spark.read.parquet(s"$dir/lists")
          .select(col("neighbor_id").as(idCol)),
        Seq(idCol), "left_anti")
    val merged = spark.read.parquet(s"$dir/moments")
      .unionByName(cellMoments(fresh, coarseCol, vecCol))
      .groupBy(col("cell"), col("j"))
      .agg(sum(col("s")).cast("decimal(28,12)").as("s"),
        sum(col("n")).as("n"))
    merged.write.mode("overwrite")
      .parquet(IndexSwap.stagedPath(dir, "moments"))
    centroidsFromMoments(
        spark.read.parquet(IndexSwap.stagedPath(dir, "moments")))
      .write.mode("overwrite")
      .parquet(IndexSwap.stagedPath(dir, "centroids"))
    // both frames staged complete → publish as ONE generation (a crash
    // can no longer pair new moments with stale centroids, or lose a
    // frame outright)
    IndexSwap.swapAll(fs, dir, ivfFrames)
    // match the index's list layout: an SQ8 index gets the batch
    // quantized the same way (raw rows would silently mix schemas)
    val quantized = spark.read.parquet(s"$dir/lists")
      .columns.contains("quant")
    quantizedListRows(fresh, coarseCol, idCol, vecCol, quantized)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/lists")
  }

  /** Search a [[writeIvfIndex]] index. The partition-column read-back
    * type can differ from the written type (hive partition values are
    * re-inferred), so `cell` is cast back to the centroid frame's type
    * before the probe join.
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                       queries: DataFrame, k: Int, nProbe: Int = 2,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, ivfAllFrames)
    val centroids = spark.read.parquet(s"$dir/centroids")
    val raw = spark.read.parquet(s"$dir/lists")
    // an SQ8 index (quantizeLists build) dequantizes candidates to
    // double ONCE per list row — exact int→double math, so the
    // quantized search replays in SQL (q339) just like the raw one
    val shaped =
      if (raw.columns.contains("quant"))
        raw.select(col("neighbor_id"),
          expr("transform(quant, q -> q * scale / 127.0)").as("cv"),
          col("cell"))
      else raw
    val lists = shaped
      .withColumn("cell", col("cell").cast(centroids.schema("cell").dataType))
    ivfProbeRerank(centroids, lists, queries, k, nProbe, idCol, vecCol)
  }

  /** The `nlist ∝ n` quantizer sizing as CODE — closing the
    * q331→q337→q348 arc where the LSH bit budget was a hand-set knob:
    * the smallest per-coarse-cell hyperplane bit count `b` such that
    * the EXPECTED refined-cell population n / (nCoarse · 2^b) is at
    * most `targetCellSize`, i.e. cells multiply as the corpus grows so
    * the within-cell quadratic term of every IVF-candidate operator
    * ([[contrastivePairsIvf]], [[selfKnnIvf]], [[semDedup]]) stays
    * bounded at any scale — the standard FAISS nlist ≈ n/target
    * sizing, derived instead of configured.
    *
    * Pure INTEGER arithmetic (a comparison scan, no float log): the
    * result replays exactly in any engine — which is what lets a
    * DuckDB oracle gate a query whose quantizer RESIZES with the data
    * (q356). Clamped to [1, maxBits]; overflow-safe for any corpus
    * countable in a long.
    */
  def sizedPlaneBits(n: Long, nCoarse: Long, targetCellSize: Long,
                     maxBits: Int = 16): Int = {
    require(n >= 0, s"n must be >= 0, got $n")
    require(nCoarse >= 1, s"nCoarse must be >= 1, got $nCoarse")
    require(targetCellSize >= 1,
      s"targetCellSize must be >= 1, got $targetCellSize")
    require(maxBits >= 1 && maxBits <= 62,
      s"maxBits must be in [1, 62], got $maxBits")
    var b = 1
    val need = n / targetCellSize + (if (n % targetCellSize == 0) 0 else 1)
    // shift-based capacity guard: nCoarse << bb would wrap for large
    // nCoarse·2^bb, so compare against the shifted headroom instead of
    // multiplying into overflow
    def covers(bb: Int): Boolean =
      nCoarse > (Long.MaxValue >> bb) || nCoarse * (1L << bb) >= need
    while (b < maxBits && !covers(b)) b += 1
    b
  }

  /** The `label#md5-plane-bucket` refined-cell column shared by every
    * scaled IVF-candidate gate (q337/q348/q349/q356/q357/q359): ONE
    * definition of the cell-key format — separator, seed 0, the
    * portable md5 plane family — so the engine side can never drift
    * from the shared oracle CTEs that replay it.
    */
  def labelPlaneCellCol(numBits: Int, coarseCol: String = "label",
                        vecCol: String = "embedding"): Column =
    concat(col(coarseCol).cast("string"), lit("#"),
      hyperplaneSignatureCol(col(vecCol), numBits, seed = 0,
        portable = true).cast("string"))

  /** [[labelPlaneCellCol]] with the bit budget DERIVED from the corpus
    * ([[sizedPlaneBits]] over two bounded driver-side counts — the
    * q334 convention): returns the frame with the sized `cell2`
    * column plus the chosen bit count.
    */
  def sizedLabelPlaneCells(corpus: DataFrame,
                           targetCellSize: Long = 50L,
                           coarseCol: String = "label",
                           vecCol: String = "embedding"): (DataFrame, Int) = {
    val bits = sizedPlaneBits(corpus.count(),
      corpus.select(countDistinct(col(coarseCol))).head().getLong(0),
      targetCellSize)
    (corpus.withColumn("cell2",
      labelPlaneCellCol(bits, coarseCol, vecCol)), bits)
  }

  /** Per-cell balance card of a persisted IVF index's inverted lists —
    * the INDEX-side health audit next to q348's graph-side hubness
    * (the r14 verdict ask): a skewed list distribution is the IVF
    * scale-killer at 100 TB — every probe of a hot cell is one
    * straggler task, and the p99/p50 list-size ratio IS the straggler
    * factor a capacity planner reads before trusting the index. Works
    * on raw and SQ8 (`quantizeLists`) builds alike — only the list
    * KEYS are touched, never the vectors.
    *
    * One row per cell: (cell, n_vectors) plus the one-row summary
    * replicated across rows — k_cells, p50/p99 list sizes (discrete
    * upper percentiles: the ⌈q·k⌉-th smallest of the k per-cell
    * counts — exact integers, engine-portable), skew_ratio = p99/p50
    * (ONE IEEE division, 6 dp) and `balanced` = ratio ≤ `maxSkew`.
    *
    * Scale shape: per-cell counts are one map-side-combinable
    * aggregate over the list keys (column-pruned — the vector/code
    * columns are never read); the summary sorts the k-row count list
    * inside ONE collected array (k = cell count, parameter-scale),
    * and rejoins as a one-row frame AQE broadcasts. Nothing here is
    * corpus-scale beyond the single count pass.
    */
  def ivfListBalance(spark: org.apache.spark.sql.SparkSession,
                     dir: String, maxSkew: Double = 4.0): DataFrame = {
    require(maxSkew >= 1.0, s"maxSkew must be >= 1, got $maxSkew")
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, ivfAllFrames)
    val per = spark.read.parquet(s"$dir/lists")
      .groupBy(col("cell").cast("string").as("cell"))
      .agg(count(lit(1)).as("n_vectors"))
    val summ = per
      .agg(sort_array(collect_list(col("n_vectors"))).as("__cs"),
        count(lit(1)).as("k_cells"))
      .select(col("k_cells"),
        element_at(col("__cs"),
          ceil(col("k_cells") * lit(0.5)).cast("int")).as("p50_size"),
        element_at(col("__cs"),
          ceil(col("k_cells") * lit(0.99)).cast("int")).as("p99_size"))
      .withColumn("skew_ratio",
        round(col("p99_size").cast("double") /
          col("p50_size").cast("double"), 6))
    per.crossJoin(summ) // one-row summary — AQE broadcasts
      .select(col("cell"), col("n_vectors"), col("k_cells"),
        col("p50_size"), col("p99_size"), col("skew_ratio"),
        (col("skew_ratio") <= maxSkew).cast("long").as("balanced"))
  }

  /** Symmetric int8 quantization of the embedding column — the 4×
    * storage/IO lever for a 100 TB embedding store: per vector, `scale =
    * max |x_i|` and `q_i = round(x_i · 127 / scale)` (half away from
    * zero; zero vector → zeros). Dequantize with `q_i · scale / 127`;
    * per-element error ≤ scale/254. Pure per-row codegen — zero shuffle.
    * Emits the input columns minus `vecCol` plus (scale, quant).
    */
  def quantizeEmbeddings(corpus: DataFrame, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val sc = graft.functions.VectorMath.maxAbs(col(vecCol))
    corpus
      .withColumn("scale", sc)
      .withColumn("quant", graft.functions.VectorMath.quantize8(col(vecCol), col("scale")))
      .drop(vecCol)
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    * then within-cluster cosine. Every vector is assigned to its nearest
    * coarse centroid (the [[coarseCentroids]] quantizer — broadcast, so
    * assignment is a map-side pass over the corpus); within each cluster
    * a vector is `dropped` when some LOWER-id cluster member has cosine ≥
    * `threshold` to it (the paper's keep-first rule made deterministic by
    * id order — no transitive chains, every decision is pairwise local).
    *
    * Scale design: the all-pairs term is confined WITHIN clusters (the
    * point of SemDeDup — k clusters cut the quadratic by ~k), expressed
    * as a cell-keyed equi-join; no corpus×corpus join exists. Returns one
    * row per vector: (id, cell, max_lower_cos, dropped).
    */
  def semDedup(corpus: DataFrame, threshold: Double,
               coarseCol: String = "label", idCol: String = "vec_id",
               vecCol: String = "embedding", portable: Boolean = false): DataFrame = {
    val cents = coarseCentroids(corpus, coarseCol, vecCol, portable)
    val v = corpus.select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", normCol(col("v")))
    // nearest centroid by (cosine DESC, cell ASC) via min(struct(-cos,
    // cell)): the k-way expansion collapses back to one row per vector in
    // the map-side partial aggregate, so the shuffle carries corpus rows,
    // not corpus×k (a row_number window would shuffle and sort the
    // expansion)
    val assigned = v.join(broadcast(cents), lit(true))
      .withColumn("csim", cosineCol(col("v"), col("centroid")))
      .groupBy(col(idCol))
      .agg(min(struct((-col("csim")).as("neg"), col("cell").as("cell"),
        col("v").as("v"), col("vn").as("vn"))).as("best"))
      .select(col(idCol), col("best.v").as("v"), col("best.vn").as("vn"),
        col("best.cell").as("cell"))
    semDedupOnAssigned(assigned, threshold, idCol)
  }

  /** SemDeDup over [[KMeans]] clusters — the paper's own composition
    * (k-means partition, then within-cluster cosine): assignment by the
    * KMeans squared-L2 rule against FITTED centroids (so clustering is
    * decoupled from any label column), then the identical keep-lowest-id
    * verdict. `centroids` is a [[KMeans.fit]] frame (cluster, centroid,
    * cn2) — k rows, parameter-bounded. Output shape matches [[semDedup]]
    * with `cell` = the k-means cluster id.
    */
  def semDedupKMeans(corpus: DataFrame, threshold: Double,
                     centroids: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    semDedupOnAssigned(
      KMeans.assignWithVec(corpus, centroids, idCol, vecCol)
        .select(col("vec_id").as(idCol), col("x").as("v"),
          normCol(col("x")).as("vn"), col("cluster").as("cell")),
      threshold, idCol)

  /** The within-cluster keep-lowest-id verdict shared by [[semDedup]]
    * and [[semDedupKMeans]]; `assigned` carries (idCol, v, vn, cell).
    * Persisted: the assignment subtree is referenced THREE times below
    * (both self-join sides and the final verdict join) and would rerun
    * per reference; registered with TrackedCaches like the shingle
    * arrays (released via Dedup.releaseCaches / Curation.report).
    */
  private def semDedupOnAssigned(assignedPlan: DataFrame, threshold: Double,
                                 idCol: String): DataFrame = {
    val assigned = TrackedCaches.track(assignedPlan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = assigned.select(col("cell"), col(idCol).as("a_id"),
      col("v").as("av"), col("vn").as("an"))
    val b = assigned.select(col("cell"), col(idCol).as("b_id"),
      col("v").as("bv"), col("vn").as("bn"))
    // max cosine from each member to any lower-id member of its cluster;
    // max() is order-free, so the double is deterministic
    val maxLower = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", dotCol(col("av"), col("bv")) / (col("an") * col("bn")))
      .groupBy(col("b_id").as(idCol))
      .agg(max(col("cos")).as("mx"))
    assigned.join(maxLower, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        round(col("mx"), 6).as("max_lower_cos"),
        coalesce(col("mx") >= threshold, lit(false)).as("dropped"))
  }

  /** Embedding-cosine near-duplicate pairs (corpus×corpus, cosine ≥
    * `threshold`). Brute-force variant for oracle-scale verification; at
    * scale use [[cosineNearDupsLsh]].
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", normCol(col("va")))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", normCol(col("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", dotCol(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Contrastive training-pair mining — the embedding-model data-prep
    * step (SimCSE/E5 family): for each anchor vector, `positive` = its
    * exact nearest neighbor under (cosine desc, id asc), and
    * `hard_negative` = the highest-cosine vector AT OR BELOW `tau` —
    * hard enough to be informative, with τ keeping near-duplicates
    * (false negatives) out of the negative slot. One row per anchor:
    * `(anchor_id, pos_id, pos_cos6, neg_id, neg_cos6)`. Documented
    * edge: an anchor whose nearest neighbor already sits ≤ τ emits
    * `pos_id == neg_id` (no HARDER negative exists — the consumer
    * filters on pos_cos6 > τ if it wants strict pairs); an anchor
    * with NO candidate ≤ τ emits a null negative, visible not silent.
    *
    * Exact all-pairs by design at oracle scale (the q17/q18 exact-twin
    * class); both rollups are map-side-combinable `min(struct)` argmax
    * aggregates, so the pair stream collapses below the exchange. The
    * scale path is [[contrastivePairsIvf]] — IVF probing swapped in for
    * candidate generation, rollups unchanged (the q20 precedent).
    */
  def contrastivePairs(corpus: DataFrame, tau: Double,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame =
    contrastivePairsFor(corpus, corpus, tau, idCol, vecCol)

  /** [[contrastivePairs]] over a SEPARATE anchor frame: candidates are
    * always the full corpus, but pairs are mined only for `anchors`
    * rows (self-pairs excluded by id). This is the linear-cost exact
    * twin the q332 agreement gate runs against a bounded anchor panel —
    * |anchors| × |corpus| pairs instead of |corpus|².
    */
  def contrastivePairsFor(anchors: DataFrame, corpus: DataFrame, tau: Double,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    require(tau > -1.0 && tau < 1.0, s"tau must be in (-1, 1), got $tau")
    // the |anchors| × |corpus| theta join runs at the STREAM (anchor)
    // side's parallelism — a single-file anchor scan would score every
    // pair in one task (guide §2.5); identity at production widths
    val a = FrameOps.parallelized(anchors)
      .select(col(idCol).as("anchor_id"), col(vecCol).as("va"))
      .withColumn("na", normCol(col("va")))
    val b = corpus.select(col(idCol).as("bid"), col(vecCol).as("vb"))
      .withColumn("nb", normCol(col("vb")))
    a.join(b, col("anchor_id") =!= col("bid"))
      .withColumn("__c",
        round(dotCol(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .groupBy(col("anchor_id"))
      .agg(
        min(struct((-col("__c")).as("nc"), col("bid").as("id"))).as("p"),
        min(when(col("__c") <= tau,
          struct((-col("__c")).as("nc"), col("bid").as("id")))).as("n"))
      .select(col("anchor_id"),
        col("p.id").as("pos_id"), (-col("p.nc")).as("pos_cos6"),
        col("n.id").as("neg_id"), (-col("n.nc")).as("neg_cos6"))
  }

  /** The contrastive-mining SCALE path — [[contrastivePairs]] with IVF
    * candidate generation instead of the all-pairs theta join: each
    * anchor considers only the corpus rows of its `nProbe` nearest
    * coarse cells (the q20 quantizer), so the scored-pair count drops
    * from n² to ~n²·nProbe/nCells and the quadratic term is confined
    * within probed cells. Positive = argmax cosine over the probed
    * candidates; hard negative = argmax at-or-below τ over the same
    * set — the candidate-restricted reading of the exact operator's
    * semantics (recall < 1 by construction: a true nearest neighbor
    * living outside the probed cells is missed; gated by agreement
    * counts against the exact twin with measured margins, q331).
    *
    * Scale shape: the anchor side here is the CORPUS (unlike
    * [[ivfTopK]]'s small query side), so probing must not shuffle —
    * the cell centroids collapse to ONE collected row (cell count is
    * parameter-bounded) that cross-joins the anchors, and each anchor
    * picks its `nProbe` cells ROW-LOCALLY (array_sort + slice over the
    * centroid array; the dot products run interpreted inside the
    * lambda, over nCells rows per anchor — a vanishing fraction of the
    * within-cell scoring). Total: one equi-join shuffle on `cell` and
    * one map-side-combinable min(struct) agg — same exchange count as
    * the exact path, on an nProbe/nCells fraction of the pairs.
    */
  def contrastivePairsIvf(corpus: DataFrame, tau: Double, nProbe: Int = 2,
                          coarseCol: String = "label",
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          portable: Boolean = false): DataFrame = {
    require(tau > -1.0 && tau < 1.0, s"tau must be in (-1, 1), got $tau")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val centroids = coarseCentroids(corpus, coarseCol, vecCol, portable)
      .agg(collect_list(struct(col("cell"), col("centroid"))).as("__cents"))
    val a = corpus.select(col(idCol).as("anchor_id"), col(vecCol).as("va"))
      .withColumn("na", normCol(col("va")))
      // one-row centroid array — structurally tiny (PlanAudit-listed)
      .crossJoin(broadcast(centroids))
      .select(col("anchor_id"), col("va"), col("na"),
        explode(slice(array_sort(transform(col("__cents"), c =>
            struct((-cosineCol(col("va"), c.getField("centroid"))).as("nc"),
              c.getField("cell").as("cell")))),
          1, nProbe)).as("pr"))
      .select(col("anchor_id"), col("va"), col("na"),
        col("pr.cell").as("cell"))
    val b = corpus.select(col(idCol).as("bid"), col(vecCol).as("vb"),
        col(coarseCol).as("cell"))
      .withColumn("nb", normCol(col("vb")))
    a.join(b, Seq("cell"))
      .filter(col("anchor_id") =!= col("bid"))
      .withColumn("__c",
        round(dotCol(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .groupBy(col("anchor_id"))
      .agg(
        min(struct((-col("__c")).as("nc"), col("bid").as("id"))).as("p"),
        min(when(col("__c") <= tau,
          struct((-col("__c")).as("nc"), col("bid").as("id")))).as("n"))
      .select(col("anchor_id"),
        col("p.id").as("pos_id"), (-col("p.nc")).as("pos_cos6"),
        col("n.id").as("neg_id"), (-col("n.nc")).as("neg_cos6"))
  }

  /** Self-kNN graph over the corpus — every vector's `k` nearest
    * neighbors under (cosine6 desc, id asc) with IVF candidate
    * generation: the building block of graph-based dedup/clustering
    * and the frame hubness audits read. Same probe mechanics as
    * [[contrastivePairsIvf]] (the anchor side IS the corpus, so cells
    * are picked row-locally from the ONE collected centroid row — no
    * probe shuffle), but the rollup is the bounded
    * [[graft.functions.TopKAgg]] instead of the pair argmax: each map
    * task pre-reduces to ≤ k neighbors per anchor before the single
    * cell-keyed exchange. Cosine rounds to 6 dp BEFORE ranking so the
    * (score, id) order replays in any engine. Recall < 1 by
    * construction (the [[ivfTopK]] contract); each neighbor appears
    * at most once per anchor — a corpus row lives in exactly one cell.
    */
  def selfKnnIvf(corpus: DataFrame, k: Int, nProbe: Int = 2,
                 coarseCol: String = "label", idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 portable: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val centroids = coarseCentroids(corpus, coarseCol, vecCol, portable)
      .agg(collect_list(struct(col("cell"), col("centroid"))).as("__cents"))
    val a = corpus.select(col(idCol).as("anchor_id"), col(vecCol).as("va"))
      .withColumn("na", normCol(col("va")))
      // one-row centroid array — structurally tiny (PlanAudit-listed)
      .crossJoin(broadcast(centroids))
      .select(col("anchor_id"), col("va"), col("na"),
        explode(slice(array_sort(transform(col("__cents"), c =>
            struct((-cosineCol(col("va"), c.getField("centroid"))).as("nc"),
              c.getField("cell").as("cell")))),
          1, nProbe)).as("pr"))
      .select(col("anchor_id"), col("va"), col("na"),
        col("pr.cell").as("cell"))
    val b = corpus.select(col(idCol).as("bid"), col(vecCol).as("vb"),
        col(coarseCol).as("cell"))
      .withColumn("nb", normCol(col("vb")))
    a.join(b, Seq("cell"))
      .filter(col("anchor_id") =!= col("bid"))
      .withColumn("__c",
        round(dotCol(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .groupBy(col("anchor_id").as(idCol))
      .agg(graft.functions.TopKAgg.topK(col("__c"), col("bid"), k).as("nn"))
      .select(col(idCol), posexplode(col("nn")).as(Seq("__r", "__x")))
      .select(col(idCol), col("__x.id").as("neighbor_id"),
        (col("__r") + 1).cast("long").as("rank"),
        col("__x.score").as("cosine6"))
  }

  /** Mutual-kNN edge list from a [[selfKnnIvf]] frame: undirected
    * (a, b) kept iff each vector appears in the OTHER's top-k AND
    * cosine6 ≥ `minCos` — the standard kNN-graph construction for
    * graph clustering: mutuality removes the asymmetric edges hub
    * vectors induce (the q348 hubness audit measures exactly that
    * pathology). One self-equi-join on the (anchor, neighbor) pair
    * key — the kNN frame is k·n rows, so the join is linear in the
    * corpus, never quadratic. Cosine is symmetric and already rounded,
    * so filtering one side suffices. `idCol` names the anchor column
    * (mirror [[selfKnnIvf]]'s `idCol`); `neighbor_id`/`cosine6` are
    * fixed by the kNN-frame contract.
    */
  def mutualKnnEdges(knn: DataFrame, minCos: Double,
                     idCol: String = "vec_id"): DataFrame = {
    require(minCos > -1.0 && minCos < 1.0,
      s"minCos must be in (-1, 1), got $minCos")
    val l = knn.select(col(idCol).as("doc_a"),
      col("neighbor_id").as("doc_b"), col("cosine6"))
    val r = knn.select(col(idCol).as("__rb"),
      col("neighbor_id").as("__ra"))
    l.join(r, col("doc_a") === col("__ra") && col("doc_b") === col("__rb"))
      .filter(col("doc_a") < col("doc_b") && col("cosine6") >= minCos)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Scale path for corpus×corpus cosine near-dup: candidates from
    * multi-table hyperplane-LSH buckets (equi-joins only — the quadratic
    * term is confined to within-bucket work, and high-cosine pairs almost
    * surely share at least one of the `numTables` buckets), then exact
    * cosine verification per candidate. Recall < 1 by construction;
    * verified against [[cosineNearDups]] in tests.
    */
  def cosineNearDupsLsh(corpus: DataFrame, threshold: Double,
                        numBits: Int = 8, numTables: Int = 8,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        portable: Boolean = false): DataFrame = {
    val tabled = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      normCol(col(vecCol)).as("n"),
      posexplode(array((0 until numTables).map(t =>
        hyperplaneSignatureCol(col(vecCol), numBits, t, portable)): _*))
        .as(Seq("tbl", "sig")))
    tabled.as("l").join(tabled.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.sig") === col("r.sig") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.v").as("va"), col("r.v").as("vb"),
        col("l.n").as("na"), col("r.n").as("nb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", dotCol(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Simplified (centroid-based) silhouette over labeled embeddings —
    * the standard clustering-quality diagnostic at corpus scale:
    * a(i) = cosine distance to the own-cluster centroid, b(i) = min
    * cosine distance to any OTHER centroid, s(i) = (b − a)/max(a, b)
    * (0 when both distances are 0; null — excluded from means — when no
    * other cluster exists). The full pairwise silhouette is O(n²); the
    * centroid form is the established approximation that needs only
    * n × k distances and is exact enough to rank clusterings.
    *
    * Output per cluster: (labelCol, n_points, mean_silhouette), the
    * per-point scores DECIMAL(28,12)-quantized before the mean so the
    * fold is order-free.
    *
    * Scale shape: centroids are k label-bounded rows (broadcast); the
    * corpus joins them once (n × k scored rows), then two aggs. The
    * `portable` flag routes centroids through the exact decimal
    * relational path (oracle-replayable); default uses the one-pass
    * VectorAvg UDAF.
    */
  def silhouette(corpus: DataFrame, labelCol: String = "label",
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 portable: Boolean = false): DataFrame = {
    val cents = coarseCentroids(corpus, labelCol, vecCol, portable)
    val scored = corpus
      .select(col(idCol).as("id"), col(labelCol).as("cl"), col(vecCol).as("v"))
      .join(broadcast(cents), lit(true))
      .withColumn("dist", lit(1.0) - cosineCol(col("v"), col("centroid")))
    val ab = scored.groupBy(col("id"), col("cl"))
      .agg(max(when(col("cell") === col("cl"), col("dist"))).as("a"),
        min(when(col("cell") =!= col("cl"), col("dist"))).as("b"))
    val sv = ab.select(col("cl"),
      when(col("b").isNull, lit(null).cast("double"))
        .when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
        .otherwise((col("b") - col("a")) / greatest(col("a"), col("b")))
        .as("s"))
    sv.groupBy(col("cl").as(labelCol))
      .agg(count(lit(1)).as("n_points"),
        round(sum(col("s").cast("decimal(28,12)")).cast("double") /
          count(col("s")), 6).as("mean_silhouette"))
  }

  /** Centroid silhouette of a [[KMeans]] clustering, in the clustering's
    * own metric: each point's cluster is its L2-nearest centroid (the
    * KMeans assignment rule), a(i)/b(i) are the L2 distances to the
    * nearest and second-nearest centroid, s(i) = (b − a)/max(a, b)
    * (0 when both are 0; null — excluded from the mean — when only one
    * centroid exists). `centroids` is a [[KMeans.fit]] frame (cluster,
    * centroid, cn2).
    *
    * Scale shape: one n × k scored expansion collapsed by the bounded
    * [[graft.functions.TopKAgg]] partial aggregate (k = 2 — nearest and
    * runner-up in ONE pass, so the shuffle carries ≤ 2 struct rows per
    * point, never the expansion); distances by the `xn² − 2·x·c + cn²`
    * double tree, bit-identical to the q244 oracle's list fold; the
    * per-point scores DECIMAL(28,12)-quantized before the order-free
    * mean.
    */
  def silhouetteKMeans(corpus: DataFrame, centroids: DataFrame,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val v = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("x"))
      .withColumn("xn2", dotCol(col("x"), col("x")))
    val scored = v.join(broadcast(centroids), lit(true))
      .withColumn("dist2",
        col("xn2") - (lit(2.0) * dotCol(col("x"), col("centroid"))) + col("cn2"))
    // top-2 by score DESC on −dist2 = the 2 smallest dist2, ties to the
    // lowest cluster id — element order equals row_number() OVER
    // (ORDER BY dist2, cluster)
    val two = scored.groupBy(col("id"))
      .agg(graft.functions.TopKAgg.topK(-col("dist2"),
        col("cluster").cast("long"), 2).as("tp"))
      .select(col("id"), col("tp")(0).as("own"),
        when(size(col("tp")) > 1, col("tp")(1)).as("nxt"))
    val sv = two.select(col("own.id").cast("int").as("cluster"),
        sqrt(greatest(-col("own.score"), lit(0.0))).as("a"),
        when(col("nxt").isNull, lit(null).cast("double"))
          .otherwise(sqrt(greatest(-col("nxt.score"), lit(0.0)))).as("b"))
      .select(col("cluster"),
        when(col("b").isNull, lit(null).cast("double"))
          .when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b")))
          .as("s"))
    sv.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        round(sum(col("s").cast("decimal(28,12)")).cast("double") /
          count(col("s")), 6).as("mean_silhouette"))
  }
}
