package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpecBase {

  // Corpus with word freqs {bb:2, aab:6, ba:4, aa:12} — chosen (by
  // exhaustive search over tiny {a,b} corpora) so the hard-EM update
  // genuinely CHANGES a segmentation: under the overlap-inflated
  // initial counts "ba" splits as "b a" ('a' counts 40 raw), but after
  // one M-step 'a' is never USED alone (count 0) while "ba" holds its
  // own mass, so "ba" re-segments whole. The iteration loop is not
  // vacuous.
  private def fixtureDocs = {
    import spark.implicits._
    val text = (Seq.fill(2)("bb") ++ Seq.fill(6)("aab") ++
      Seq.fill(4)("ba") ++ Seq.fill(12)("aa")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  private def segMap(iterations: Int) =
    UnigramLm.segmentation(fixtureDocs, maxPieceLen = 3, maxWordLen = 12,
        iterations = iterations)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap

  test("EM update flips the overlap-count segmentation of 'ba'") {
    assert(segMap(0) == Map("bb" -> "bb", "aab" -> "aab",
      "ba" -> "b a", "aa" -> "aa"))
    assert(segMap(2) == Map("bb" -> "bb", "aab" -> "aab",
      "ba" -> "ba", "aa" -> "aa"))
  }

  test("vocab carries final usage counts and rank order (cnt desc, piece)") {
    val v = UnigramLm.vocab(fixtureDocs, maxPieceLen = 3, maxWordLen = 12,
        iterations = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(v.toSeq == Seq((1L, "aa", 12L), (2L, "aab", 6L),
      (3L, "ba", 4L), (4L, "bb", 2L)))
  }

  test("scores are negative, n_pieces matches the segmentation, and " +
    "smoothed lp is monotone in count") {
    val seg = UnigramLm.segmentation(fixtureDocs, maxPieceLen = 3,
      maxWordLen = 12, iterations = 2).collect()
    seg.foreach { r =>
      assert(r.getDouble(4) < 0.0, s"score6 for ${r.getString(0)}")
      assert(r.getLong(3) == r.getString(2).split(" ").length.toLong)
    }
    val v = UnigramLm.vocab(fixtureDocs, maxPieceLen = 3, maxWordLen = 12,
      iterations = 2).orderBy("rank").collect()
    val lps = v.map(r => (r.getLong(2), r.getDouble(3)))
    lps.sliding(2).foreach { case Array((c1, l1), (c2, l2)) =>
      assert(c1 >= c2 && l1 >= l2, "lp must be monotone in cnt")
    }
  }

  test("segmentation is repartition-invariant and words over maxWordLen " +
    "are excluded from the model") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
        (i, s"grafting spark unigram ${"verylongword" * 2} token$i"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      UnigramLm.segmentation(d, maxPieceLen = 4, maxWordLen = 12,
          iterations = 1)
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val a = run(docs)
    assert(a == run(docs.repartition(7)))
    // "verylongwordverylongword" (24 chars) is out of the model
    assert(!a.keySet.exists(_.length > 12))
    assert(a.contains("grafting") && a.contains("unigram"))
    // every segmentation tiles its word exactly
    a.foreach { case (w, s) =>
      assert(s.split(" ").mkString("") == w, s"$w -> $s")
    }
  }
}
