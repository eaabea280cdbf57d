package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independently-produced rankings (lexical BM25,
  * embedding ANN, ...) into one list with Reciprocal Rank Fusion —
  * `score(d) = Σ_systems 1 / (k + rank_s(d))` (Cormack et al., the
  * standard fusion in RAG retrieval stacks: rank-based, so the systems'
  * incomparable raw scores never need calibration).
  *
  * Scale design: each input ranking is already top-K-bounded (k rows per
  * query from [[TextAnalysis.bm25Search]] / [[Similarity]]'s ANN paths),
  * so the fusion joins are K-row frames regardless of corpus size — the
  * expensive work happened inside the per-system retrieval, which keeps
  * its own documented plan shape. The fused score is a fixed expression
  * tree over the joined row (no aggregation), so double arithmetic is
  * order-free and engine-portable.
  */
object HybridSearch {

  /** Fuse named rankings on `idCol` by RRF. Each input frame must carry
    * `idCol` and `rankCol` (1-based, dense within the list). Output: one
    * row per id seen in ANY list — `idCol`, one `<name>_rank` column per
    * system (null when absent), `rrf_score` (rounded to 6), `fused_rank` —
    * limited to `topK`. Ties break on id for determinism.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String = "doc_id",
              rankCol: String = "rank", kRrf: Int = 60,
              topK: Int = 10): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two rankings")
    require(rankings.map(_._1).distinct.size == rankings.size,
      s"ranking names must be distinct, got ${rankings.map(_._1)}")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val named = rankings.map { case (name, df) =>
      name -> df.select(col(idCol), col(rankCol).cast("long").as(s"${name}_rank"))
    }
    val joined = named.map(_._2).reduce { (a, b) =>
      a.join(b, Seq(idCol), "full_outer")
    }
    // fixed-order sum of per-system contributions: a missing system
    // contributes 0, matching the RRF literature (absent = rank -> inf)
    val score = named.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(kRrf) + col(s"${name}_rank")), lit(0.0))
    }.reduceLeft(_ + _)
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    joined.withColumn("rrf_score", round(score, 6))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
      .orderBy(col("fused_rank"))
  }
}
