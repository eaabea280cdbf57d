package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DataSelectionSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "tgt", "alpha beta alpha beta gamma"),
    (2L, "tgt", "alpha beta gamma delta"),
    (3L, "raw", "omega psi chi omega psi"),
    (4L, "raw", "omega chi phi"),
    (5L, "raw", "alpha beta gamma alpha beta")) // raw doc that LOOKS target
    .toDF("doc_id", "source", "text")

  test("dsirScores: target-like documents score above raw-like ones") {
    val out = DataSelection.dsirScores(docs, col("source") === "tgt")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("dsir_score"))).toMap
    // n_feats = unigrams + bigrams = 2*len - 1
    assert(out(1L)._1 == 9L)
    assert(out(4L)._1 == 5L)
    // the raw doc built from target vocabulary outscores true raw docs
    assert(out(5L)._2 > out(3L)._2)
    assert(out(5L)._2 > out(4L)._2)
    // target docs sit above the out-of-domain raw docs
    assert(out(1L)._2 > out(3L)._2 && out(2L)._2 > out(4L)._2)
  }

  test("dsirScores is invariant under repartitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      DataSelection.dsirScores(d, col("source") === "tgt")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_feats"),
          r.getAs[Double]("dsir_score"))).toSeq
    assert(run(docs) == run(docs.repartition(5)))
  }

  test("dsirScores: single-token docs yield one unigram feature, no bigram") {
    val tiny = Seq((1L, "tgt", "word"), (2L, "raw", "other"))
      .toDF("doc_id", "source", "text")
    val out = DataSelection.dsirScores(tiny, col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_feats")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }
}
