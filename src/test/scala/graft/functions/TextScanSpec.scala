package graft.functions

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Every scanner must be value-identical to the regex / HOF formulation it
  * replaced — asserted over the whole sf corpus AND hostile edge strings
  * (empty, whitespace-only, untrimmed tabs, unicode, mixed case).
  */
class TextScanSpec extends SparkSpecBase {

  import TextScan._

  // The last group exercises the only two code points in Unicode whose
  // lowercase reaches ASCII: U+212A KELVIN SIGN (→ 'k', joins letter runs)
  // and U+0130 dotted capital I (→ 'i' + combining U+0307, the only
  // lowercase EXPANSION in Unicode).
  private val edge = Seq("", " ", "   ", "\ta b\t", "a", "a b  c",
    "àé 中文 mixed", "A1.b!!", "tab\tsep", "nl\nsep", "'quoted' (paren)",
    "1234 5a6b", "trailing space ", " leading", "ALL CAPS RUN 99",
    "K", "İ", "aKb KK 9K", "İstanbul Iİ",
    "İİ xİy KİK")

  private def corpus = {
    import spark.implicits._
    Tables.documents(spark, sf()).select(col("text"))
      .union(edge.toDF("text"))
  }

  test("wsTokenCount == size(split(trim(text), ws+))") {
    val bad = corpus.select(
      wsTokenCount(col("text")).as("a"),
      size(split(trim(col("text")), "\\s+")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("wsCharCount == aggregate(tokens, sum of lengths)") {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val bad = corpus.select(
      wsCharCount(col("text")).as("a"),
      aggregate(toks, lit(0L), (acc, tk) => acc + length(tk).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("bpeTokenCount == size(regexp_extract_all(lower, bpe pattern))") {
    val bad = corpus.select(
      bpeTokenCount(col("text")).as("a"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("b"))
      .filter(col("a") =!= col("b"))
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("asciiSetCount matches the punct and alpha regex classes") {
    val bad = corpus.select(
      asciiSetCount(col("text"), ".,;:!?'\"()[]{}-").as("a"),
      size(regexp_extract_all(col("text"),
        lit("[.,;:!?'\"()\\[\\]{}-]"), lit(0))).as("b"),
      asciiSetCount(col("text"), "abcdefghijklmnopqrstuvwxyz").as("c"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]"), lit(0))).as("d"))
      .filter(col("a") =!= col("b") || col("c") =!= col("d"))
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("fuzz: 500 seeded random strings agree with the regex formulations") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "ab z09.,;:!?'\"()[]{}-\t\n\f\r  éàß中文ABC" +
      "\u212A\u0130" // the two ASCII-reaching lowercase foldings
    val fuzz = (0 until 500).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = fuzz.toDF("text")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val bad = df.select(col("text"),
      wsTokenCount(col("text")).as("a1"),
      size(split(trim(col("text")), "\\s+")).as("b1"),
      wsCharCount(col("text")).as("a2"),
      aggregate(toks, lit(0L), (acc, tk) => acc + length(tk).cast("long")).as("b2"),
      bpeTokenCount(col("text")).as("a3"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("b3"),
      asciiSetCount(col("text"), ".,;:!?'\"()[]{}-").as("a4"),
      size(regexp_extract_all(col("text"),
        lit("[.,;:!?'\"()\\[\\]{}-]"), lit(0))).as("b4"))
      .filter(col("a1") =!= col("b1") || col("a2") =!= col("b2") ||
        col("a3") =!= col("b3") || col("a4") =!= col("b4"))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
  }

  test("scanners run inside WholeStageCodegen") {
    val q = spark.range(4).select(concat(lit("a b"), col("id").cast("string")).as("t"))
      .select(wsTokenCount(col("t")), wsCharCount(col("t")),
        bpeTokenCount(col("t")), asciiSetCount(col("t"), "ab"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
