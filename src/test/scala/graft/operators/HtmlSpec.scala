package graft.operators

import graft.SparkSpecBase

/** HTML extraction contract: script/style/comment removal, tag
  * stripping, entity decode order, title, anchors, link density.
  */
class HtmlSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def text(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.textCol(col("h")).as("t"))
      .as[String].collect().head
  }

  private def row(html: String): (String, String, Long, Double) = {
    import spark.implicits._
    val r = Html.extract(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().head
    (r.getAs[String]("title"), r.getAs[String]("text"),
      r.getAs[Long]("n_links"), r.getAs[Double]("link_density"))
  }

  test("tags become spaces; whitespace collapses; ends trim") {
    assert(text("<html><body><p>one</p><p>two</p></body></html>") ===
      "one two")
    assert(text("  <div>\n  a \t b  </div> ") === "a b")
    // tags must not glue adjacent words together
    assert(text("left<br>right") === "left right")
  }

  test("script/style bodies and comments are removed, case-insensitive") {
    assert(text("<p>keep</p><script>var x = 1;</script><p>tail</p>") ===
      "keep tail")
    assert(text("<SCRIPT type=\"x\">drop < this ></SCRIPT>ok") === "ok")
    assert(text("<style>.c{color:red}</style>body") === "body")
    assert(text("a<!-- hidden\nlines -->b") === "a b")
    // <scriptx> is NOT a script tag (word boundary)
    assert(text("<scriptx>visible</scriptx>") === "visible")
  }

  test("entities decode once per pass, &amp; last") {
    assert(text("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;</p>") ===
      "a <b> \"c\" 'd'")
    assert(text("x&nbsp;y") === "x y")
    // double-encoded text peels exactly one level
    assert(text("&amp;lt;tag&amp;gt;") === "&lt;tag&gt;")
    assert(text("tom &amp; jerry") === "tom & jerry")
  }

  test("title: first element, inner tags stripped, '' when absent") {
    val (t1, _, _, _) =
      row("<html><head><TITLE> A <b>B</b> </TITLE></head>" +
        "<title>second</title><body>x</body></html>")
    assert(t1 === "A B")
    val (t2, _, _, _) = row("<html><body>no title</body></html>")
    assert(t2 === "")
  }

  test("anchors: count, nested tags, density arithmetic") {
    val (_, txt, n, d) = row(
      "<body><a href=\"/x\">one two</a> three <A HREF=\"#\"><i>four</i></A></body>")
    assert(txt === "one two three four")
    assert(n === 2L)
    // anchor text "one two four" = 12 chars; text = 18 chars
    assert(d === math.round(12.0 / 18.0 * 1e6) / 1e6)
  }

  test("no links → density 0; text-empty page → density 0") {
    val (_, _, n0, d0) = row("<p>plain</p>")
    assert(n0 === 0L && d0 === 0.0)
    val (_, txt, _, dEmpty) = row("<script>only code</script>")
    assert(txt === "" && dEmpty === 0.0)
  }
}
