package graft.operators

import graft.SparkSpecBase

/** MMR selection: hand-traced picks showing the diversity term
  * rejecting a duplicate, pure-relevance degeneracy, tie-break,
  * exact micro-scores, and validation.
  */
class DiverseSelectionSpec extends SparkSpecBase {

  private def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  // v1=(1,0), v2=(1,0) duplicate, v3=(0,1); centroid (2/3, 1/3)
  private def corpus = {
    import spark.implicits._
    Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
  }
  private val relAxis = 2.0 / math.sqrt(5.0) // cos((1,0), centroid)
  private val relPerp = 1.0 / math.sqrt(5.0) // cos((0,1), centroid)

  test("balanced lambda picks the diverse vector over the duplicate") {
    import spark.implicits._
    val out = DiverseSelection.mmrSelect(corpus, k = 3, lambdaTenths = 5)
      .orderBy("rank").as[(Long, Long, Long)].collect()
    // pick1: v1 (rel tie with v2 -> smaller id), score 5·relµ
    assert(out(0) === ((1L, 1L, 5 * q6(relAxis))))
    // pick2: v2 would score 5·relµ − 5·10⁶ (sim 1 to v1) < v3's 5·relPerpµ
    assert(out(1) === ((2L, 3L, 5 * q6(relPerp))))
    // pick3: the duplicate, penalized by full similarity to v1
    assert(out(2) === ((3L, 2L, 5 * q6(relAxis) - 5 * 1000000L)))
  }

  test("pure relevance (lambda=10) takes the duplicate second") {
    import spark.implicits._
    val out = DiverseSelection.mmrSelect(corpus, k = 3, lambdaTenths = 10)
      .orderBy("rank").as[(Long, Long, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 3L))
  }

  test("selection is repartition-invariant") {
    val a = DiverseSelection.mmrSelect(corpus, k = 3, lambdaTenths = 5)
      .collect().toSeq
    val b = DiverseSelection.mmrSelect(corpus.repartition(4), k = 3,
      lambdaTenths = 5).collect().toSeq
    assert(a === b)
  }

  test("input validation") {
    intercept[IllegalArgumentException] {
      DiverseSelection.mmrSelect(corpus, k = 0)
    }
    intercept[IllegalArgumentException] {
      DiverseSelection.mmrSelect(corpus, lambdaTenths = 11)
    }
  }
}
