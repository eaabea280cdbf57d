package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimilaritySpec extends SparkSpecBase {

  import StringSimilarity.{jaroCol, jaroImpl, jaroWinklerCol, jaroWinklerImpl}

  private def jw(a: String, b: String): Double =
    jaroWinklerImpl(UTF8String.fromString(a), UTF8String.fromString(b))
  private def jr(a: String, b: String): Double =
    jaroImpl(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook vectors match the RapidFuzz/DuckDB values exactly") {
    // each expected double verified against DuckDB's own
    // jaro_winkler_similarity / jaro_similarity (independent impl)
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jr("MARTHA", "MARHTA") == 0.9444444444444445)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jr("DIXON", "DICKSONX") == 0.7666666666666666)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
  }

  test("transpositions are integer-halved (odd mismatch counts truncate)") {
    // matched sequences ABC vs BCA -> 3 mismatched positions, t = 3/2 = 1
    assert(jr("ABCDEF", "BCAXYZ") == 0.5555555555555555)
    assert(jw("ABCDEF", "BCAXYZ") == 0.5555555555555555)
  }

  test("Winkler boost applies only above jaro 0.7") {
    // common 2-byte prefix but jaro 0.527... -> no boost
    assert(jw("abqqqqqq", "abzzzz") == jr("abqqqqqq", "abzzzz"))
    // jaro 0.75 -> boosted by 2-char prefix to 0.8
    assert(jw("ab", "abcdefgh") == 0.8)
    assert(jr("ab", "abcdefgh") == 0.75)
  }

  test("prefix is capped at 4 bytes") {
    // 8 shared leading bytes; only 4 count toward the boost
    val j = jr("abcdefgh", "abcdefxy")
    assert(jw("abcdefgh", "abcdefxy") == j + 4 * 0.1 * (1.0 - j))
  }

  test("empty conventions: both empty 1.0 (textbook; documented DuckDB divergence), one empty 0.0") {
    assert(jw("", "") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
  }

  test("operates on UTF-8 bytes, matching DuckDB (multibyte chars count per byte)") {
    // DuckDB: jaro_similarity('ñandú','nandu') = 0.6761904761904761 —
    // only explainable byte-wise (lengths 7 vs 5)
    assert(jr("ñandú", "nandu") == 0.6761904761904761)
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    import spark.implicits._
    val df = Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("ABCDEF", "BCAXYZ"),
      ("abqqqqqq", "abzzzz"), ("", "x"), ("same", "same"))
      .toDF("a", "b")
    val rows = df.select(jaroWinklerCol(col("a"), col("b")).as("jw")).collect()
    val expected = Seq(jw("MARTHA", "MARHTA"), jw("DWAYNE", "DUANE"),
      jw("ABCDEF", "BCAXYZ"), jw("abqqqqqq", "abzzzz"), 0.0, 1.0)
    assert(rows.map(_.getDouble(0)).toSeq == expected)

    val nulls = Seq((Option("x"), Option.empty[String]),
      (Option.empty[String], Option("y"))).toDF("a", "b")
    assert(nulls.select(jaroWinklerCol(col("a"), col("b")))
      .collect().forall(_.isNullAt(0)))
    assert(nulls.select(jaroCol(col("a"), col("b")))
      .collect().forall(_.isNullAt(0)))
  }

  test("symmetry on random-ish pairs") {
    val pairs = Seq("alpha" -> "alpah", "beta" -> "betamax",
      "gamma ray" -> "gamma-ray", "x" -> "xyzzy", "ab cd" -> "ba dc")
    pairs.foreach { case (a, b) => assert(jw(a, b) == jw(b, a), s"($a,$b)") }
  }

  private def dl(a: String, b: String): Int =
    StringSimilarity.damerauLevenshteinImpl(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("damerauLevenshtein is the FULL variant (transposition across later edits)") {
    // the OSA/full discriminator: CA -> ABC is 2 full (swap CA->AC, then
    // insert B inside the swapped pair), 3 restricted — DuckDB says 2
    assert(dl("CA", "ABC") == 2)
    assert(dl("kitten", "sitting") == 3)  // pure levenshtein case agrees
    assert(dl("abcdef", "abcfed") == 2)   // 'fed' from 'def': 2 swaps
    assert(dl("abcdef", "abcdfe") == 1)   // one adjacent swap = 1 edit
    assert(dl("same", "same") == 0)
  }

  test("damerauLevenshtein edges: empties, bytes, symmetry") {
    assert(dl("", "") == 0)
    assert(dl("", "abc") == 3)
    assert(dl("abc", "") == 3)
    // byte semantics like DuckDB: 'é' is two UTF-8 bytes
    assert(dl("é", "e") == 2)
    val pairs = Seq("alpha" -> "alpah", "ca" -> "abc", "ab" -> "ba")
    pairs.foreach { case (a, b) => assert(dl(a, b) == dl(b, a), s"($a,$b)") }
  }

  test("damerauLevenshtein codegen and interpreted paths agree; nulls propagate") {
    import spark.implicits._
    import StringSimilarity.damerauLevenshteinCol
    val df = Seq(("CA", "ABC"), ("abcdef", "abcdfe"), ("", "xy"))
      .toDF("a", "b")
    assert(df.select(damerauLevenshteinCol(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq == Seq(2, 1, 2))
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    assert(nulls.select(damerauLevenshteinCol(col("a"), col("b")))
      .head().isNullAt(0))
  }
}
