package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class SubstringDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("repeatedSpans: a shared 6-token run yields one merged span in " +
      "each doc, at its own offsets") {
    // the run "a b c d e f" sits at positions 2-7 in doc 0 and 1-6 in
    // doc 1; with k=4 its window starts are 3 per doc, merged into one
    // island each
    val d = docs(
      (0L, "x a b c d e f y z w"),
      (1L, "a b c d e f q r s t"),
      (2L, "p q r s t u v w x y"))
    val out = SubstringDedup.repeatedSpans(d, k = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("n_grams"))).sorted
    // doc 2 shares "q r s t" with doc 1 (positions 2-5 / 7-10); in doc
    // 1 the "a b c d e f" windows (starts 1-3, covering 1-6) TOUCH the
    // "q r s t" window (7-10), so the islands merge them into one span
    assert(out.toSeq == Seq((0L, 2L, 7L, 3L), (1L, 1L, 10L, 4L),
      (2L, 2L, 5L, 1L)))
  }

  test("repeatedSpans: intra-doc repetition alone never qualifies") {
    val d = docs(
      (0L, "a b c d a b c d a b c d"),
      (1L, "w x y z w w w w w w w w"))
    assert(SubstringDedup.repeatedSpans(d, k = 4).count() == 0L)
  }

  test("repeatedSpans: non-touching repeats stay separate islands, " +
      "short docs produce nothing") {
    val d = docs(
      (0L, "a b c d x x x x x a b c d"),
      (1L, "a b c d y y y y y a b c d"),
      (2L, "a b c"))
    val out = SubstringDedup.repeatedSpans(d, k = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).sorted
    assert(out.toSeq == Seq((0L, 1L, 4L), (0L, 10L, 13L),
      (1L, 1L, 4L), (1L, 10L, 13L)))
  }

  test("removeRepeatedSpans: spans cut, order preserved, clean docs " +
      "untouched, fully-repeated docs come back empty") {
    val d = docs(
      (0L, "x a b c d e f y z w"),
      (1L, "a b c d e f q r s t"),
      (2L, "p q r s t u v w x y"),
      (3L, "h i j k l m n o p2 q2"))
    val out = SubstringDedup.removeRepeatedSpans(d, k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean"), r.getAs[Long]("n_tokens_kept"))).toMap
    assert(out(0L) == ("x y z w", 4L))
    // doc 1 loses 1-6 ("a b c d e f") and 7-10 ("q r s t") -> empty
    assert(out(1L) == ("", 0L))
    assert(out(2L) == ("p u v w x y", 6L))
    assert(out(3L) == ("h i j k l m n o p2 q2", 10L))
  }
}
