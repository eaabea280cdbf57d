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

  test("k past the corpus stops cleanly; null embeddings are dropped") {
    import spark.implicits._
    // k=5 over 3 vectors: 3 picks, no NPE from the empty argmax
    val over = DiverseSelection.mmrSelect(corpus, k = 5, lambdaTenths = 5)
      .orderBy("rank").as[(Long, Long, Long)].collect()
    assert(over.length === 3)
    assert(over.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // a null embedding never enters the selection (or the centroid:
    // picks match the null-free corpus exactly)
    val withNull = corpus.union(
      Seq((9L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val a = DiverseSelection.mmrSelect(withNull, k = 3, lambdaTenths = 5)
      .collect().toSeq
    val b = DiverseSelection.mmrSelect(corpus, k = 3, lambdaTenths = 5)
      .collect().toSeq
    assert(a === b)
  }

  test("greedyCoverage: hand-traced picks, zero-gain docs never picked") {
    import spark.implicits._
    // d3 covers 3 shingles, d1 adds 2, d2's only shingle is then
    // already covered -> with k=3 only 2 rows come back
    val docs = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val out = DiverseSelection.greedyCoverage(docs, k = 3, n = 3)
      .orderBy("rank").as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 3L, 3L), (2L, 1L, 2L)))
  }

  test("greedyCoverage: gains are non-increasing (submodularity)") {
    import spark.implicits._
    val docs = (1L to 30L).map(i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}")
        .mkString(" "))).toDF("doc_id", "text")
    val gains = DiverseSelection.greedyCoverage(docs, k = 5, n = 3)
      .orderBy("rank").select("gain").as[Long].collect()
    assert(gains.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("greedyCoverage: docs shorter than n tokens are never picked") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "p q r s"))
      .toDF("doc_id", "text")
    val out = DiverseSelection.greedyCoverage(docs, k = 2, n = 3)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(2L))
    intercept[IllegalArgumentException] {
      DiverseSelection.greedyCoverage(docs, k = 0)
    }
  }
}
