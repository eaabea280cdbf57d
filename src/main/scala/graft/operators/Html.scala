package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction: the content pass that follows
  * [[WebCuration]]'s URL hygiene in every crawl-derived pre-training
  * pipeline (C4 §2.2, RefinedWeb §3.2, FineWeb). Crawled pages arrive
  * as markup; the trainable payload is the visible text, plus the two
  * page-level signals that drive keep/drop decisions before any deep
  * quality model runs: link density (navigation/boilerplate pages are
  * link-dominated) and link count.
  *
  * Everything here is a single per-row projection — chained
  * `regexp_replace`/`regexp_extract_all` + length arithmetic, no UDF,
  * whole-stage codegen, ZERO shuffles — so at 100 TB the pass is
  * embarrassingly parallel and the only cost is the scan itself.
  *
  * Extraction contract (each step chosen to be replayable in any
  * RE2-class engine — no backreferences, no lookaround):
  *   - comments `<!-- … -->` removed ((?s): they span lines);
  *   - `<script>…</script>` / `<style>…</style>` blocks removed
  *     including their contents ((?is), non-greedy bodies);
  *   - `title` = the first `<title>` element's inner text;
  *   - anchors: `n_links` counts `<a …>…</a>` elements; anchor text
  *     is their concatenated inner text (tags stripped);
  *   - body text: every remaining tag `<[^>]*>` replaced by a space
  *     (block boundaries must not glue words together);
  *   - the five ubiquitous entities decoded — `&lt; &gt; &quot; &#39;
  *     &nbsp;` then `&amp;` LAST, so double-encoded text (`&amp;lt;`)
  *     decodes one level per pass, per HTML semantics;
  *   - whitespace runs collapsed to one space, ends trimmed.
  *   - `link_density` = anchor-text chars / text chars (0 when the
  *     page has no text), rounded to 6 — the C4/RefinedWeb page-level
  *     boilerplate signal.
  *
  * Divergence note: `\s` here is the regex class (space/tab/CR/LF/FF;
  * Java additionally folds vertical-tab) — HTML entity-encoded
  * whitespace beyond `&nbsp;` is out of scope by contract.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no markup handling; this extends the mandated text-analysis
  * family (SURVEY §2B4) with the crawl content-extraction stage.
  */
object Html {

  private val commentRe = "(?s)<!--.*?-->"
  private val scriptRe = "(?is)<script\\b[^>]*>.*?</script>"
  private val styleRe = "(?is)<style\\b[^>]*>.*?</style>"
  private val tagRe = "<[^>]*>"
  private val titleRe = "(?is)<title[^>]*>(.*?)</title>"
  private val anchorRe = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Markup with comments and script/style blocks (contents included)
    * removed — the shared first stage of every extractor below. */
  private def cleaned(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, commentRe, " "), scriptRe, " "), styleRe, " ")

  /** Decode the five ubiquitous entities; `&amp;` last so one pass
    * peels exactly one encoding level. */
  private def decodeEntities(c: Column): Column = {
    val pairs = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    pairs.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
  }

  private def collapse(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Strip tags from an already-cleaned fragment, decode entities,
    * collapse whitespace. */
  private def innerText(fragment: Column): Column =
    collapse(decodeEntities(regexp_replace(fragment, tagRe, " ")))

  /** Visible page text: comments/script/style dropped, every other tag
    * replaced by a space, entities decoded, whitespace collapsed. */
  def textCol(html: Column): Column = innerText(cleaned(html))

  /** Inner text of the first `<title>` element ('' when absent). */
  def titleCol(html: Column): Column =
    innerText(regexp_extract(cleaned(html), titleRe, 1))

  /** Inner texts of every `<a …>…</a>` element, in document order. */
  private def anchorTexts(html: Column): Column =
    regexp_extract_all(cleaned(html), lit(anchorRe), lit(1))

  /** Number of `<a …>…</a>` elements on the page. */
  def nLinksCol(html: Column): Column = size(anchorTexts(html))

  /** `(idCol, title, text, n_links, link_density)` — one row per page,
    * link_density = anchor-text length / text length rounded to 6
    * (0.0 for text-empty pages). One projection over a 2-column scan. */
  def extract(df: DataFrame, idCol: String = "doc_id",
              htmlCol: String = "html"): DataFrame = {
    val h = col(htmlCol)
    val anchor = innerText(concat_ws(" ", anchorTexts(h)))
    df.select(col(idCol),
        titleCol(h).as("title"),
        textCol(h).as("text"),
        nLinksCol(h).cast("long").as("n_links"),
        length(anchor).cast("double").as("__alen"),
        length(textCol(h)).cast("double").as("__tlen"))
      .withColumn("link_density",
        when(col("__tlen") === 0d, lit(0.0d))
          .otherwise(round(col("__alen") / col("__tlen"), 6)))
      .drop("__alen", "__tlen")
  }
}
