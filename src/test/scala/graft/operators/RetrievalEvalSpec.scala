package graft.operators

import graft.SparkSpecBase

class RetrievalEvalSpec extends SparkSpecBase {

  import spark.implicits._

  // one query, 3 results, judgments: doc 1 rel=2 (rank 1), doc 3 rel=1
  // (rank 3), doc 9 rel=3 (not retrieved). doc 2 (rank 2) unjudged.
  private def results = Seq(
    ("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L)
  ).toDF("query_id", "doc_id", "rank")
  private def qrels = Seq(
    ("q1", 1L, 2), ("q1", 3L, 1), ("q1", 9L, 3)
  ).toDF("query_id", "doc_id", "rel")

  test("hand-computed NDCG / MRR / precision / recall") {
    val r = RetrievalEval.evaluate(results, qrels, k = 3).head()
    assert(r.getAs[Long]("n_rel") == 3L)
    assert(r.getAs[Long]("hits") == 2L)
    assert(r.getAs[Double]("precision_k") == 0.666667) // 2/3
    assert(r.getAs[Double]("recall_k") == 0.666667)    // 2/3
    assert(r.getAs[Double]("mrr") == 1.0)              // first rel at rank 1
    // DCG = 3/log2(2) + 0 + 1/log2(4) = 3.5
    // IDCG = 7/log2(2) + 3/log2(3) + 1/log2(4) = 7 + 1.892789... + 0.5
    val idcg = 7.0 + 3.0 * math.log(2) / math.log(3) + 0.5
    assert(math.abs(r.getAs[Double]("ndcg_k") - 3.5 / idcg) < 2e-6)
  }

  test("no relevant doc retrieved: mrr 0, ndcg 0, recall 0") {
    val res = Seq(("q1", 2L, 1L), ("q1", 5L, 2L)).toDF(
      "query_id", "doc_id", "rank")
    val r = RetrievalEval.evaluate(res, qrels, k = 2).head()
    assert(r.getAs[Long]("hits") == 0L)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("recall_k") == 0.0)
    assert(r.getAs[Double]("ndcg_k") == 0.0)
  }

  test("query with no judgments: recall and ndcg null, mrr 0") {
    val res = Seq(("q2", 4L, 1L)).toDF("query_id", "doc_id", "rank")
    val r = RetrievalEval.evaluate(res, qrels, k = 3)
      .filter($"query_id" === "q2").head()
    assert(r.getAs[Long]("n_rel") == 0L)
    assert(r.isNullAt(r.fieldIndex("recall_k")))
    assert(r.isNullAt(r.fieldIndex("ndcg_k")))
    assert(r.getAs[Double]("mrr") == 0.0)
  }

  test("rows past rank k are ignored") {
    val res = Seq(("q1", 2L, 1L), ("q1", 1L, 2L)).toDF(
      "query_id", "doc_id", "rank")
    val r = RetrievalEval.evaluate(res, qrels, k = 1).head()
    assert(r.getAs[Long]("hits") == 0L) // rel doc at rank 2 cut by k=1
    assert(r.getAs[Double]("mrr") == 0.0)
  }

  test("zero/null-rel judgments only assert non-relevance") {
    val rels = Seq(("q1", 1L, 0), ("q1", 2L, 2)).toDF(
      "query_id", "doc_id", "rel")
    val r = RetrievalEval.evaluate(results, rels, k = 3).head()
    assert(r.getAs[Long]("n_rel") == 1L) // only the rel=2 judgment counts
    assert(r.getAs[Long]("hits") == 1L)
    assert(r.getAs[Double]("mrr") == 0.5) // doc 2 at rank 2
  }
}
