package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Diverse exemplar selection by maximal marginal relevance (MMR,
  * Carbonell & Goldstein 1998) over the embedding corpus: greedily
  * pick `k` vectors that are REPRESENTATIVE (close to the corpus
  * centroid) yet mutually DIVERSE —
  *
  *   pick_t = argmax_x  λ·rel(x) − (1−λ)·max_{s ∈ selected} sim(x, s)
  *
  * with rel = cosine to the centroid and sim = cosine between vectors.
  * The standard exemplar/prompt-selection and eval-set seeding step:
  * top-k-by-relevance alone returns k near-duplicates of the corpus
  * mode; the marginal term forces coverage.
  *
  * Exactness: cosines quantize once to 6-dp micros (the q18 DuckDB
  * contract), λ enters as integer tenths, so every score is exact long
  * arithmetic — `score = λ₁₀·relµ − (10−λ₁₀)·max simµ` — and the
  * DuckDB oracle replays the greedy loop as a k-step unrolled CTE
  * chain (the PageRank/BPE house pattern). Ties break to the smaller
  * id.
  *
  * Scale design (100 TB): each of the k steps is ONE map-side-
  * combinable argmax aggregation over the corpus (a `min(struct)` —
  * no sort, no window) plus one bounded single-row fetch; the selected
  * set enters as k literal vectors inside the scoring expression
  * (parameter-bounded, no join). The scored base frame (vector + relµ)
  * is checkpointed once, so the centroid pass and relevance cosines
  * are not replayed per step. Driver state: k (id, vector, score)
  * rows plus the d-double centroid — parameter-bounded (the KMeans
  * codebook precedent).
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no selection ops; this extends the mandated similarity-search
  * family (SURVEY §2B3).
  */
object DiverseSelection {

  /** Greedy MMR: returns the k-row selection `(rank, vec_id, score)`
    * with `score` the exact micro-score at pick time (BIGINT).
    * `lambdaTenths` ∈ [0, 10]: 10 = pure relevance, 0 = pure
    * diversity.
    */
  def mmrSelect(corpus: DataFrame, k: Int = 8, lambdaTenths: Int = 7,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be in [0,10], got $lambdaTenths")
    val spark = corpus.sparkSession
    // null embeddings carry no cosine: drop them up front (and stop
    // early below if k exceeds the remaining candidates) — the
    // greedyCoverage contract
    val v = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("e"))

    // corpus centroid: decimal-exact per-dim means (the q243/q20
    // recipe), collected once — d doubles of driver state
    val cent = v
      .select(posexplode(col("e")).as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(sum(col("x").cast("decimal(28,12)")).as("s"),
        count(lit(1)).as("n"))
      .orderBy(col("j"))
      .collect()
      .map(r => r.getDecimal(1).doubleValue() / r.getLong(2))

    def q6cos(a: Column, b: Column): Column =
      floor(graft.functions.VectorMath.cosine(a, b) * lit(1000000.0)
        + lit(0.5)).cast("long")

    // base frame: vector + relevance micros, checkpointed once (k
    // argmax passes read it; without this every step replays the scan)
    val base = v.select(col("vec_id"), col("e"),
        q6cos(col("e"), typedlit(cent.toSeq)).as("relu"))
      .localCheckpoint()

    var selected = Vector.empty[(Long, Seq[Double], Long)]
    var exhausted = false
    for (t <- 1 to k if !exhausted) {
      val sim: Column =
        if (selected.isEmpty) lit(0L)
        else if (selected.size == 1)
          q6cos(col("e"), typedlit(selected.head._2))
        else greatest(selected.map(s =>
          q6cos(col("e"), typedlit(s._2))): _*)
      val cand = base
        .filter(!col("vec_id").isin(selected.map(_._1): _*))
        .select(col("vec_id"), col("e"),
          (lit(lambdaTenths.toLong) * col("relu") -
            lit((10 - lambdaTenths).toLong) * sim).as("score"))
      val best = cand
        .agg(min(struct((-col("score")).as("ns"), col("vec_id"))).as("b"))
        .select(col("b.vec_id"), (-col("b.ns")).as("score"))
        .head()
      // candidates ran out before k picks (k > corpus size): the argmax
      // aggregate returns a null struct — stop, don't NPE
      if (best.isNullAt(0)) exhausted = true
      else {
        val id = best.getLong(0)
        val emb = cand.filter(col("vec_id") === id)
          .select(col("e")).head().getSeq[Double](0)
        selected :+= ((id, emb, best.getLong(1)))
      }
    }
    val rows = selected.zipWithIndex.map { case ((id, _, sc), i) =>
      Row((i + 1).toLong, id, sc)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("rank", LongType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("score", LongType, nullable = false))))
  }

  /** Greedy maximum-coverage selection over word-shingle sets (the
    * lexical complement of [[mmrSelect]]'s embedding diversity): pick
    * `k` documents, each maximizing the number of DISTINCT `n`-gram
    * shingles not covered by the picks so far — the classic
    * (1 − 1/e)-approximate submodular set-cover greedy, the
    * "seed the corpus with maximal vocabulary coverage" selection.
    * Ties break to the smaller id. Documents shorter than `n` tokens
    * have no shingles and are never picked.
    *
    * Scale design (100 TB): the covered-shingle state is a FRAME
    * (checkpointed per step, shingle-type-bounded), never driver
    * state — each of the k steps is one anti-join of the distinct
    * (doc, shingle) frame against it, one map-side count per doc, and
    * one `min(struct)` argmax. Driver state: k (id, gain) pairs.
    *
    * Output: `(rank, doc_id, gain)` — `gain` the exact new-shingle
    * count at pick time.
    */
  def greedyCoverage(docs: DataFrame, k: Int = 6, n: Int = 3,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(n >= 1, s"n must be >= 1, got $n")
    val spark = docs.sparkSession
    // distinct (doc, shingle): shingles built ROW-LOCALLY (a sliding
    // window over the token array — no positional self-join), one
    // distinct shuffle, checkpointed once for the k passes
    // the sliding-window shingle transform is the heavy per-row stage
    // of the whole operator; a single-file corpus would build it in
    // one task (guide §2.5 — identity at production scan widths)
    val sh = FrameOps.parallelized(docs)
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).cast("long").as("doc_id"),
        explode(expr(
          // guarded: Spark's sequence(1, 0) DESCENDS rather than being
          // empty, so a doc shorter than n tokens must short-circuit
          s"""CASE WHEN size(split(trim(lower($textCol)), '\\\\s+')) < $n
             |  THEN array()
             |  ELSE transform(
             |    sequence(1, size(split(trim(lower($textCol)),
             |      '\\\\s+')) - ${n - 1}),
             |    i -> array_join(slice(split(trim(lower($textCol)),
             |      '\\\\s+'), i, $n), ' ')) END""".stripMargin)).as("sh"))
      .distinct()
      .localCheckpoint()
    var covered = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("sh", StringType))))
    var picks = Vector.empty[(Long, Long)]
    for (t <- 1 to k) {
      val gains = sh
        .filter(!col("doc_id").isin(picks.map(_._1): _*))
        .join(covered, Seq("sh"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("gain"))
      val best = gains
        .agg(min(struct((-col("gain")).as("ng"), col("doc_id"))).as("b"))
        .select(col("b.doc_id"), (-col("b.ng")).as("gain"))
        .head()
      if (!best.isNullAt(0)) {
        val id = best.getLong(0)
        picks :+= ((id, best.getLong(1)))
        covered = covered
          .union(sh.filter(col("doc_id") === id).select(col("sh")))
          .localCheckpoint()
      }
    }
    val rows = picks.zipWithIndex.map { case ((id, g), i) =>
      Row((i + 1).toLong, id, g)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("rank", LongType, nullable = false),
        StructField("doc_id", LongType, nullable = false),
        StructField("gain", LongType, nullable = false))))
  }
}
