package graft.operators

import graft.SparkSpecBase

/** Windowed PMI and token dispersion: hand-computed counts/ratios. */
class CooccurrenceSpec extends SparkSpecBase {

  private def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("windowedPmi: window-1 pairs and the exact PMI formula") {
    import spark.implicits._
    // "a b a": window 1 -> (a,b) twice; cw a=2, b=1; nw=3; np=2
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val out = Cooccurrence.windowedPmi(docs, window = 1, minCount = 1)
      .as[(String, String, Long, Double)].collect()
    assert(out.length === 1)
    val pmi = math.log((2.0 / 2) / ((2.0 / 3) * (1.0 / 3)))
    assert(out.head === (("a", "b", 2L, q6(pmi).toDouble / 1e6)))
  }

  test("windowedPmi: window 2 adds the self-pair, counts stay exact") {
    import spark.implicits._
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val out = Cooccurrence.windowedPmi(docs, window = 2, minCount = 1)
      .orderBy("a", "b")
      .as[(String, String, Long, Double)].collect()
    // pairs: (a,b)x2 and (a,a)x1; np=3
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq(("a", "a", 1L), ("a", "b", 2L)))
    val pmiAA = math.log((1.0 / 3) / ((2.0 / 3) * (2.0 / 3)))
    assert(out.head._4 === q6(pmiAA).toDouble / 1e6)
  }

  test("windowedPmi: minCount filters and windows never cross docs") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = Cooccurrence.windowedPmi(docs, window = 3, minCount = 1)
      .as[(String, String, Long, Double)].collect()
    // no (b,c) pair across the doc boundary
    assert(out.map(r => (r._1, r._2)).toSet ===
      Set(("a", "b"), ("c", "d")))
    assert(Cooccurrence.windowedPmi(docs, window = 3, minCount = 2)
      .count() === 0)
  }

  test("tokenDispersion: vmr with zero-count docs included") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = Cooccurrence.tokenDispersion(docs).orderBy("word")
      .as[(String, Long, Long, Double)].collect()
    // a: df=1 tot=2 s2=4 -> 4/2 - 2/2 = 1.0 (bursty)
    // b: df=2 tot=2 s2=2 -> 2/2 - 2/2 = 0.0 (even)
    assert(out.toSeq === Seq(("a", 1L, 2L, 1.0), ("b", 2L, 2L, 0.0)))
  }

  test("input validation") {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Cooccurrence.windowedPmi(docs, window = 0) }
    intercept[IllegalArgumentException] {
      Cooccurrence.windowedPmi(docs, minCount = 0) }
  }
}
