package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** First-class corpus k-means (Lloyd) over full embedding vectors — the
  * clustering prerequisite of SemDeDup/DataComp-style curation (cluster-
  * balanced sampling, data maps, within-cluster dedup). The per-subspace
  * Lloyd machinery already proven inside [[Pq.trainCodebooks]] (q149's
  * oracle replays it end-to-end), lifted to corpus granularity and
  * exposed as fit / assign.
  *
  * Everything is DETERMINISTIC and engine-replayable:
  *   - init: the `k` corpus rows with the smallest md5-derived 52-bit
  *     keys, chosen by the bounded [[graft.functions.TopKAgg]] partial
  *     aggregate (no global window); position = cluster id;
  *   - assignment: squared-L2 by the `xn² − 2·x·c + cn²` double tree
  *     (dot products fold in element order — bit-identical to the
  *     oracle's list fold), ties to the lowest cluster id;
  *   - update: per-(cluster, dim) DECIMAL(28,12) sums — order-free, so
  *     the fitted centroids are a pure function of the corpus, invariant
  *     under repartitioning (pinned by KMeansSpec);
  *   - clusters that empty out drop (standard Lloyd; identical in the
  *     generated unrolled oracle, q243).
  *
  * Scale shape: the centroid frame is structurally small (k·d
  * parameters — broadcast is justified and allowlisted); each iteration
  * is one broadcast join + a map-side-combinable min(struct) argmin +
  * one decimal mean aggregation over the corpus; the centroid frame is
  * collected per iteration (k rows — parameter-bounded, and re-emitting
  * it as a local literal frame breaks the iterative lineage the way
  * localCheckpoint does elsewhere). The corpus never shuffles on data
  * cardinality: the argmin collapses the k-way expansion in the partial
  * aggregate, so the shuffle carries corpus rows, not corpus×k.
  */
object KMeans {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VectorMath.dot(a, b)

  private val cbSchema = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("centroid", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("cn2", DoubleType, nullable = false)))

  /** (vec_id, x: array<double>, xn2): the corpus as double vectors. */
  private def vecs(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("x"))
      .withColumn("xn2", dot(col("x"), col("x")))

  /** One assignment pass against a parameter-bounded centroid frame:
    * min(struct(dist2, cluster)) keeps each row's nearest cluster in the
    * map-side partial aggregate (ties to the lowest cluster id).
    */
  private def assignVecs(v: DataFrame, cb: DataFrame): DataFrame =
    v.join(broadcast(cb), lit(true))
      .withColumn("dist2",
        col("xn2") - (lit(2.0) * dot(col("x"), col("centroid"))) + col("cn2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist2"), col("cluster"), col("x"))).as("b"))
      .select(col("vec_id"), col("b.cluster").as("cluster"),
        col("b.dist2").as("dist2"), col("b.x").as("x"))

  /** Collect the k-row centroid frame and re-emit it as a local literal
    * frame — breaks per-iteration lineage growth and makes the broadcast
    * side trivially known-small (the [[Pq]] `toLocalCodebook` pattern).
    */
  private def collectCb(cb: DataFrame): Array[Row] =
    cb.select(col("cluster").cast("int"),
        col("centroid").cast("array<double>"), col("cn2").cast("double"))
      .collect()
      .map(r => Row(r.getInt(0), r.getSeq[Double](1), r.getDouble(2)))

  private def fromRows(spark: SparkSession, rows: Array[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), cbSchema)

  private def toLocal(spark: SparkSession, cb: DataFrame): DataFrame =
    fromRows(spark, collectCb(cb))

  /** Train centroids; returns (cluster, centroid, cn2) with
    * `cluster` ∈ [0, k) (empty clusters drop).
    */
  def fit(corpus: DataFrame, k: Int, iters: Int = 3,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    fitHistory(corpus, k, iters, idCol, vecCol)._2.last

  // Session-scoped fitted-codebook memo, keyed by the CANONICALIZED
  // corpus plan + parameters: the battery's k-means consumers (assign,
  // silhouette, semdedup, balanced sample, inertia) each need the same
  // fit, and training is a pure function of (corpus, k, iters) — so a
  // session trains once and every later consumer replays the collected
  // k-row states for free (the TrackedCaches reuse philosophy lifted to
  // driver-side model state; swept by TrackedCaches.release(), so COLD
  // benches retrain per query).
  // LinkedHashMap (insertion-ordered) so the memo is BOUNDED: a long-lived
  // session fitting many distinct corpora evicts oldest-first instead of
  // accumulating analyzed-plan keys without limit.
  private val memoBound = 8
  private val fitMemo = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      Int, Int, String, String), (Seq[Array[Row]], Long)]
  TrackedCaches.onRelease(() => fitMemo.synchronized(fitMemo.clear()))

  /** The Lloyd loop, keeping every centroid state: returns the tracked
    * vector frame and the iters+1 local codebook frames cb₀ (init) …
    * cb_iters (final) — [[fit]] takes the last; [[inertiaHistory]]
    * scores each.
    */
  private def fitHistory(corpus: DataFrame, k: Int, iters: Int,
                         idCol: String, vecCol: String)
      : (DataFrame, Seq[DataFrame]) = {
    val spark = corpus.sparkSession
    val v = TrackedCaches.track(vecs(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // keyed on the canonicalized PLAN OBJECT: structural equality covers
    // LocalRelation data, which the truncating toString would not
    val memoKey = (corpus.queryExecution.analyzed.canonicalized,
      k, iters, idCol, vecCol)
    val hit = fitMemo.synchronized(fitMemo.get(memoKey))
    hit match {
      case Some((states, trainedEpoch)) =>
        // cross-QUERY reuse flags the bench row warm (within-query
        // re-fits — silhouette after assign — are the query's own)
        if (trainedEpoch < TrackedCaches.currentQueryEpoch)
          TrackedCaches.noteMemoReuse()
        return (v, states.map(rows => spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), cbSchema)))
      case None => ()
    }
    // init: k rows by ascending md5-52-bit key (TopKAgg on the negated
    // key — bounded partial agg, no global window); position = cluster.
    val u = conv(substring(md5(col("vec_id").cast("string").cast("binary")),
      1, 13), 16, 10).cast("double")
    val initIds = v
      .select(col("vec_id").cast("long").as("vec_id"))
      .agg(graft.functions.TopKAgg.topK(-u, col("vec_id"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("cluster", "e")))
      .select(col("e.id").as("vec_id"), col("cluster").cast("int").as("cluster"))
    val initRows = collectCb(
      v.join(initIds, "vec_id")
        .select(col("cluster"), col("x").as("centroid"), col("xn2").as("cn2")))
    // Fail fast on misuse instead of silently emitting an empty model: a
    // non-long-castable idCol (string ids) nulls the whole init frame —
    // TopKAgg drops nulls — and every downstream consumer would return
    // empty with no error. Only probed on the (rare) empty-init path, so
    // the happy path pays no extra job.
    if (initRows.isEmpty) {
      val probe = v.agg(count(lit(1)).as("n"),
        count(col("vec_id").cast("long")).as("n_cast")).head()
      if (probe.getLong(0) > 0 && probe.getLong(1) == 0)
        throw new IllegalArgumentException(
          s"KMeans: idCol '$idCol' does not cast to long for any row — " +
            "deterministic init requires long-castable ids")
    }
    var cb = fromRows(spark, initRows)
    val history = Seq.newBuilder[DataFrame]
    history += cb
    for (_ <- 1 to iters) {
      val cents = assignVecs(v, cb)
        .select(col("cluster"), posexplode(col("x")).as(Seq("j", "xx")))
        .groupBy(col("cluster"), col("j"))
        .agg(sum(col("xx").cast("decimal(28,12)")).as("sm"),
          count(lit(1)).as("n"))
        .withColumn("comp", col("sm").cast("double") / col("n"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("j"), col("comp")))).as("pc"))
        .select(col("cluster"),
          expr("transform(pc, p -> p.comp)").as("centroid"))
        .withColumn("cn2", dot(col("centroid"), col("centroid")))
      cb = toLocal(spark, cents)
      history += cb
    }
    val states = history.result()
    // Run the collect() jobs and read the epoch into LOCALS before taking
    // the memo lock: TrackedCaches.release() holds ITS lock while invoking
    // the onRelease hook (which takes this lock), so nesting the
    // TrackedCaches lock — or Spark jobs — inside the memo lock would be
    // an ABBA deadlock against a concurrent release() from another driver
    // thread.
    val collected = states.map(_.collect()) // k-row local frames
    val epoch = TrackedCaches.currentQueryEpoch
    fitMemo.synchronized {
      if (fitMemo.size >= memoBound) fitMemo -= fitMemo.head._1
      fitMemo(memoKey) = (collected, epoch)
    }
    (v, states)
  }

  /** The Lloyd convergence curve — one row per centroid state t ∈
    * [0, iters]: (iteration, n_points, inertia) with inertia_t =
    * Σ min-dist² under the iteration-t centroids, DECIMAL(28,12)-summed
    * (order-free) and rounded 6 dp. Inertia is non-increasing in t —
    * Lloyd's monotonicity, the elbow-method diagnostic that tells a
    * data-map pipeline when k or iters is enough. One bounded
    * aggregation per state over the cached vector frame; driver state
    * is iters+1 (long, long, double) rows.
    */
  def inertiaHistory(corpus: DataFrame, k: Int, iters: Int = 3,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val (v, cbs) = fitHistory(corpus, k, iters, idCol, vecCol)
    val rows = cbs.zipWithIndex.map { case (cb, t) =>
      val r = assignVecs(v, cb)
        .agg(count(lit(1)).as("n"),
          round(sum(col("dist2").cast("decimal(28,12)")).cast("double"), 6)
            .as("inertia"))
        .head()
      Row(t.toLong, r.getLong(0), r.getDouble(1))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("iteration", LongType, nullable = false),
        StructField("n_points", LongType, nullable = false),
        StructField("inertia", DoubleType, nullable = false))))
  }

  /** Assign each corpus row to its nearest centroid (squared L2, ties to
    * the lowest cluster id). Output: (idCol, cluster, dist2).
    */
  def assign(corpus: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignVecs(vecs(corpus, idCol, vecCol), centroids)
      .select(col("vec_id").as(idCol), col("cluster"), col("dist2"))

  /** [[assign]] keeping the double vector — (vec_id, cluster, dist2, x);
    * the within-cluster consumers ([[Similarity.semDedupKMeans]]) need
    * the vector alongside the verdict without a second corpus join.
    */
  private[operators] def assignWithVec(corpus: DataFrame, centroids: DataFrame,
                                       idCol: String, vecCol: String): DataFrame =
    assignVecs(vecs(corpus, idCol, vecCol), centroids)

  /** Persist fitted centroids for train-once / assign-anywhere use
    * (the writeIvfIndex / Bpe.writeMerges precedent): the k-row frame
    * IS the whole model, and centroid doubles survive parquet
    * bit-exact, so a loaded-centroid [[assign]] is byte-identical to
    * assigning under the in-memory fit (q251 shares q243's oracle).
    */
  def writeCentroids(centroids: DataFrame, dir: String): Unit =
    centroids.select(col("cluster").cast("int"),
        col("centroid").cast("array<double>"), col("cn2").cast("double"))
      .repartition(1) // k rows — one footer beats k tiny files
      .write.mode("overwrite").parquet(dir)

  def readCentroids(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
