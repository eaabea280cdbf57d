package graft.operators

import graft.SparkSpecBase

/** Cavnar–Trenkle rank-profile language ID: hand-computed profiles,
  * the out-of-place distance with missing-trigram penalty, tie-break,
  * and perfect separation on a genuinely discriminative corpus (the
  * synthetic driver corpus has weak lang signal — accuracy there is a
  * property of the data, exact replay is the gate's job).
  */
class LangProfileSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  test("profiles: padded-trigram counts ranked (cnt desc, tri)") {
    import spark.implicits._
    // lang x: "ab ab b" -> words ab,ab,b
    // _ab_ trigrams: _ab, ab_ (x2 each); _b_ (x1)
    val docs = Seq((1L, "x", "ab ab b")).toDF("doc_id", "lang", "text")
    val p = LangProfile.profiles(docs, topN = 10)
      .as[(String, Long, String, Long)].collect().sortBy(_._2)
    assert(p.map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((1L, "_ab", 2L), (2L, "ab_", 2L), (3L, "_b_", 1L)))
  }

  test("classify: out-of-place distance, penalty, tie-break") {
    import spark.implicits._
    // two languages with overlapping but distinct profiles
    val docs = Seq(
      (1L, "aa", "xy xy zz"),   // lang aa favors xy
      (2L, "bb", "zz zz xy")    // lang bb favors zz
    ).toDF("doc_id", "lang", "text")
    val out = LangProfile.classify(docs, topN = 10)
      .orderBy("doc_id")
      .as[(Long, String, String, Long, Long)].collect()
    // doc1 profile == lang aa profile (same text) -> dist 0, correct
    assert(out(0) === ((1L, "aa", "aa", 0L, 1L)))
    assert(out(1) === ((2L, "bb", "bb", 0L, 1L)))
  }

  test("disjoint-vocabulary languages separate perfectly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa", "alpha beta gamma alpha"),
      (2L, "aa", "beta alpha beta"),
      (3L, "bb", "uno dos tres uno"),
      (4L, "bb", "dos uno dos"),
      (5L, "aa", "gamma gamma alpha"),
      (6L, "bb", "tres tres dos")
    ).toDF("doc_id", "lang", "text")
    val out = LangProfile.classify(docs, topN = 20)
    assert(out.agg(sum("correct")).head.getLong(0) === 6L)
  }

  test("missing-trigram penalty dominates any shared-rank offset") {
    import spark.implicits._
    // doc 3's text is pure lang-cc vocabulary; lang aa shares nothing
    // with it, so aa's distance would be |profile|*penalty — cc must
    // win even though aa has the larger training mass
    val docs = Seq(
      (1L, "aa", "mmm nnn ooo mmm nnn ooo mmm"),
      (2L, "cc", "qq rr"),
      (3L, "cc", "rr qq qq")
    ).toDF("doc_id", "lang", "text")
    val out = LangProfile.classify(docs, topN = 20)
      .filter(col("doc_id") === 3L)
      .select("pred_lang", "correct").as[(String, Long)].collect().head
    assert(out === (("cc", 1L)))
  }

  test("input validation") {
    import spark.implicits._
    val docs = Seq((1L, "aa", "x")).toDF("doc_id", "lang", "text")
    intercept[IllegalArgumentException] {
      LangProfile.profiles(docs, topN = 0)
    }
  }
}
