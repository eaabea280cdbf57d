package graft.operators

import graft.SparkSpecBase

/** Multinomial NB: hand-replayed scores (priors, likelihoods,
  * unknown-word mass) and the argmax tie-break.
  */
class NaiveBayesSpec extends SparkSpecBase {

  private def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("classify replays the smoothed model by hand") {
    import spark.implicits._
    // aa: tokens x,x,y,x,y (tot 5)   bb: y,z (tot 2)   V=3, docs 2:1
    val docs = Seq((1L, "aa", "x x y"), (2L, "aa", "x y"),
      (3L, "bb", "y z")).toDF("doc_id", "lang", "text")
    val out = NaiveBayes.classify(docs).orderBy("doc_id")
      .as[(Long, String, String, Long, Long)].collect()

    val priorA = q6(math.log(2.0 / 3)); val priorB = q6(math.log(1.0 / 3))
    val aX = q6(math.log(4.0 / 8)); val aY = q6(math.log(3.0 / 8))
    val aU = q6(math.log(1.0 / 8))
    val bY = q6(math.log(2.0 / 5)); val bZ = q6(math.log(2.0 / 5))
    val bU = q6(math.log(1.0 / 5))

    // doc1 "x x y": aa = prior + 2·lp(x) + lp(y); bb = prior + 2·unk + lp(y)
    val d1a = priorA + 2 * aX + aY
    val d1b = priorB + 2 * bU + bY
    assert(d1a > d1b)
    assert(out(0) === ((1L, "aa", "aa", d1a, 1L)))
    // doc3 "y z": bb knows both words, aa pays unknown mass for z
    val d3a = priorA + aY + aU
    val d3b = priorB + bY + bZ
    assert(d3b > d3a)
    assert(out(2) === ((3L, "bb", "bb", d3b, 1L)))
  }

  test("exact score ties break to the lexicographically first label") {
    import spark.implicits._
    // symmetric model: both labels score every doc identically
    val docs = Seq((1L, "aa", "x"), (2L, "bb", "x"))
      .toDF("doc_id", "lang", "text")
    val out = NaiveBayes.classify(docs).orderBy("doc_id")
      .as[(Long, String, String, Long, Long)].collect()
    assert(out.map(_._3).toSeq === Seq("aa", "aa"))
    assert(out.map(_._5).toSeq === Seq(1L, 0L))
  }

  test("labelAudit surfaces exactly the argmax disagreements with margin") {
    import spark.implicits._
    // all-correct corpus -> empty audit
    val good = Seq((1L, "aa", "x x y"), (2L, "aa", "x y"),
      (3L, "bb", "y z")).toDF("doc_id", "lang", "text")
    assert(NaiveBayes.labelAudit(good).count() === 0)
    // doc3 labeled bb but indistinguishable from aa text: prior wins,
    // margin = q6(ln(2/3)) - q6(ln(1/3)) (likelihoods identical, V=1)
    val noisy = Seq((1L, "aa", "x x x"), (2L, "aa", "x x"),
      (3L, "bb", "x x")).toDF("doc_id", "lang", "text")
    val audit = NaiveBayes.labelAudit(noisy)
      .as[(Long, String, String, Long, Long, Long)].collect()
    assert(audit.length === 1)
    val m = q6(math.log(2.0 / 3)) - q6(math.log(1.0 / 3))
    assert(audit.head._1 === 3L)
    assert(audit.head._3 === "aa")
    assert(audit.head._6 === m)
  }

  test("null and blank documents are excluded") {
    import spark.implicits._
    val docs = Seq((1L, "aa", "x y"), (2L, "aa", null), (3L, "bb", " "))
      .toDF("doc_id", "lang", "text")
    assert(NaiveBayes.classify(docs).count() === 1)
  }
}
