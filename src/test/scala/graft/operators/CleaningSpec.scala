package graft.operators

import graft.SparkSpecBase

/** C4 line filter: every rule exercised individually, doc-level
  * survival, and the cleaned-text reassembly contract.
  */
class CleaningSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def run(text: String, minKeptLines: Int = 3) = {
    import spark.implicits._
    Cleaning.c4LineFilter(Seq((1L, text)).toDF("doc_id", "text"),
        minKeptLines = minKeptLines)
      .as[(Long, Long, Long, Long, Long, String, String)].collect().head
  }

  test("each C4 rule drops its line") {
    val good = "this line has plenty of words and ends well."
    // short
    assert(run(s"$good\nshort line.")._3 === 1)
    // no terminal punctuation
    assert(run(s"$good\nthis line has enough words but no punctuation")
      ._3 === 1)
    // trailing whitespace after punctuation still terminal
    assert(run(s"$good   \nx.")._3 === 1)
    // brace
    assert(run(s"$good\nthis code line has words but { braces }.")._3 === 1)
    // banned phrases, case-insensitive
    assert(run(s"$good\nthis long sentence cites LOREM IPSUM text.")._3 === 1)
    assert(run(s"$good\nplease enable JavaScript to view this page.")._3 === 1)
    // a second clean line survives; quotes count as terminal
    assert(run(s"$good\nhe said the words were \"entirely fine.\"")._3 === 2)
  }

  test("doc-level survival and cleaned reassembly") {
    val l1 = "first fully valid sentence with enough words."
    val l2 = "second fully valid sentence with enough words!"
    val bad = "nope"
    val r = run(s"$l1\n$bad\n$l2", minKeptLines = 2)
    assert(r._2 === 3 && r._3 === 2 && r._4 === 1)
    assert(r._7 === s"$l1\n$l2")
    assert(r._5 === (l1.length + 1 + l2.length).toLong)
    val r2 = run(s"$l1\n$bad\n$l2", minKeptLines = 3)
    assert(r2._4 === 0, "below minKeptLines the doc is dropped")
  }

  test("no surviving lines yields empty cleaned text, not null") {
    val r = run("nope\nstill nope")
    assert(r._3 === 0 && r._7 === "" && r._5 === 0)
  }

  test("input validation") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Cleaning.c4LineFilter(df, minWords = 0) }
    intercept[IllegalArgumentException] {
      Cleaning.c4LineFilter(df, banned = Nil) }
  }

  test("encodingAnomalies: hand-counted mojibake classes; clean text " +
      "and empty/null docs behave") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain clean text"),
      (2L, "bad\uFFFD dec\uFFFDode"),                 // 2 replacements
      (3L, "ctl \u0085 and \u0092 here"),             // 2 C1 controls
      (4L, "caf\u00C3\u00A9 na\u00C3\u00AFve"),     // 2 latin1-utf8 pairs
      (5L, null.asInstanceOf[String]),
      (6L, "")
    ).toDF("doc_id", "text")
    val out = Cleaning.encodingAnomalies(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.length === 4) // null and empty drop
    assert(out(0) === ((1L, 16L, 0L, 0L, 0L, 0.0)))
    assert(out(1)._3 === 2L && out(1)._4 === 0L && out(1)._5 === 0L)
    assert(out(2)._4 === 2L && out(2)._3 === 0L)
    assert(out(3)._5 === 2L && out(3)._3 === 0L && out(3)._4 === 0L)
    // rate = anomalies / chars, 6 dp exact
    assert(math.abs(out(1)._6 -
      math.floor(2.0 / out(1)._2 * 1e6 + 0.5) / 1e6) < 1e-9)
  }
}
