package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2).
  *
  * The classic pre-training cleanup pass: documents are split into
  * lines, each line is kept only if it looks like real prose —
  *
  *   - at least `minWords` whitespace words,
  *   - ends in terminal punctuation (`.` `!` `?` `"`) after trailing-
  *     space strip,
  *   - contains no `{` (code/markup tell),
  *   - contains none of the `banned` phrases (case-insensitive; C4
  *     bans "lorem ipsum" boilerplate and the "javascript" cookie/JS
  *     warnings),
  *
  * and a document survives only if at least `minKeptLines` lines do
  * (C4 keeps pages with ≥ 3 retained sentences).
  *
  * Everything is ROW-LOCAL array work — `split` → higher-order
  * `filter` → `array_join` inside one projection: zero shuffles, zero
  * joins, whole-stage codegen, embarrassingly parallel at any scale.
  * The cleaned text is returned alongside count stats and an md5 of
  * the retained text (the gate-friendly fingerprint).
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no text cleaning; this extends the mandated text-analysis
  * family (SURVEY §2B4) with the standard line-level filter stage.
  */
object Cleaning {

  /** The C4 line predicate over a (non-split) line column. */
  private def keepLine(line: Column, minWords: Int,
                       banned: Seq[String]): Column = {
    val words = size(filter(split(trim(line), "\\s+"), w => w =!= ""))
    val terminal = rtrim(line).rlike("[.!?\"]$")
    val noBrace = !line.contains("{")
    val clean = banned.map(p => !lower(line).contains(p.toLowerCase))
      .reduce(_ && _)
    (words >= minWords) && terminal && noBrace && clean
  }

  /** Per-document line-filter stats + cleaned text:
    * `(idCol, n_lines, n_kept, keep_doc, kept_chars, kept_md5,
    * cleaned)` — `keep_doc` is 1 iff ≥ `minKeptLines` lines survive,
    * `cleaned` the retained lines re-joined with `\n` (empty string if
    * none survive), `kept_md5` its md5.
    */
  def c4LineFilter(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", minWords: Int = 5,
                   minKeptLines: Int = 3,
                   banned: Seq[String] = Seq("lorem ipsum", "javascript"))
      : DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    require(minKeptLines >= 0,
      s"minKeptLines must be >= 0, got $minKeptLines")
    require(banned.nonEmpty, "banned phrase list must not be empty")
    val lines = split(col(textCol), "\n", -1)
    val kept = filter(lines, l => keepLine(l, minWords, banned))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), lines.as("__lines"), kept.as("__kept"))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        when(size(col("__kept")) >= minKeptLines, lit(1L))
          .otherwise(lit(0L)).as("keep_doc"),
        length(array_join(col("__kept"), "\n")).cast("long")
          .as("kept_chars"),
        md5(array_join(col("__kept"), "\n").cast("binary")).as("kept_md5"),
        array_join(col("__kept"), "\n").as("cleaned"))
  }

  /** Encoding-anomaly (mojibake) counts per document — the corpus-
    * health check that catches broken ingestion before any text model
    * does: U+FFFD replacement characters (a decoder already gave up),
    * C1 control characters U+0080-U+009F (the classic cp1252-read-as-
    * latin1 signature), and the "\u00C3 + high byte" pair (UTF-8 text
    * decoded as Latin-1 — e.g. \u00C3\u00A9 where \u00E9 was meant).
    * Row-local `regexp_count` — whole-stage codegen, zero shuffles.
    * Output: `(idCol, n_chars, n_replacement, n_c1, n_latin1_utf8,
    * anomaly_rate6)` with the rate an exact integer ratio over the
    * char count, 6 dp.
    */
  def encodingAnomalies(df: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    val nRep = regexp_count(c, lit("\uFFFD"))
    val nC1 = regexp_count(c, lit("[\u0080-\u009F]"))
    val nL1 = regexp_count(c, lit("\u00C3[\u0080-\u00BF]"))
    df.filter(c.isNotNull && length(c) > 0)
      .select(col(idCol), length(c).cast("long").as("n_chars"),
        nRep.cast("long").as("n_replacement"),
        nC1.cast("long").as("n_c1"),
        nL1.cast("long").as("n_latin1_utf8"),
        round((nRep + nC1 + nL1).cast("double") /
          length(c).cast("double"), 6).as("anomaly_rate6"))
  }
}
