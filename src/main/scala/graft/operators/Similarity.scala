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
    * in element order.
    */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** Exact top-k nearest neighbors (cosine) of each query vector.
    * The query side is broadcast (small by contract); rank ties break on
    * neighbor id for determinism. Self-matches are excluded when query ids
    * collide with corpus ids.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Random-hyperplane (sign) LSH signature: bit `i` is the sign of the
    * dot product with pseudo-random hyperplane `i`, whose components are
    * derived deterministically from `xxhash64(planeIdx, componentIdx)` —
    * reproducible across runs and executors with zero driver state.
    */
  def hyperplaneSignatureCol(vec: Column, numBits: Int): Column =
    aggregate(
      zip_with(
        transform(sequence(lit(0), lit(numBits - 1)),
          p => aggregate(
            zip_with(vec, sequence(lit(0), size(vec) - 1),
              (x, j) => x.cast("double") *
                ((xxhash64(p, j) % 10000L).cast("double") / 10000.0d)),
            lit(0.0d), (acc, v) => acc + v)),
        sequence(lit(0), lit(numBits - 1)),
        (dot, p) => when(dot > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** Approximate top-k: LSH-bucketed search. Corpus and queries are
    * signed into `numBits`-bit buckets; search runs only within the
    * query's bucket (equi-join on the signature — no broadcast needed, so
    * this shape also works corpus×corpus). Recall < 1 by construction;
    * verified against [[bruteForceTopK]] in tests rather than an oracle.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numBits: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = hyperplaneSignatureCol(col(vecCol), numBits)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"), sig.as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), sig.as("bucket"))
    val scored = c.join(q, Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** IVF-style search: centroids are the per-`coarseCol` mean vectors
    * (computed once, broadcast); each query probes only its
    * `nProbe` nearest coarse partitions, pruning the corpus scan to those
    * partitions — the inverted-file pattern expressed as two broadcast
    * joins plus a partition-pruned rerank.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nProbe: Int = 2,
              coarseCol: String = "label", idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    // Centroid = per-cell mean vector. Aggregates cannot appear inside a
    // transform() lambda, so average per (cell, pos) after posexplode, then
    // reassemble the array in position order (array_sort on (pos, mean)
    // structs orders by pos, the first field).
    val centroids = corpus
      .select(col(coarseCol).as("cell"), posexplode(col(vecCol)))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), x => x.getField("m")).as("centroid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    val probed = q.join(broadcast(centroids), lit(true))
      .withColumn("cdist", cosineCol(col("qv"), col("centroid")))
      .withColumn("prank", row_number().over(probeW)).filter(col("prank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(coarseCol).as("cell"))
    val scored = c.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (corpus×corpus, cosine ≥
    * `threshold`). Brute-force variant for oracle-scale verification; at
    * scale, run [[lshTopK]]-style bucketing first.
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosineCol(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
