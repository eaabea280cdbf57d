package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpecBase {

  import spark.implicits._

  private val left = Seq(
    (1L, "The quick brown fox jumps"),
    (2L, "completely different text here"),
    (3L, "shared prefix AAAA variant one"))
    .toDF("id", "name")
  private val right = Seq(
    (10L, "The quick brown fox jumped"),   // dist 2 from id 1 ("s" -> "ed")
    (11L, "shared prefix AAAA variant two"), // near id 3 within the block
    (12L, "unrelated content entirely"))
    .toDF("id", "name")

  test("fuzzyJoin finds within-block pairs under the distance threshold") {
    val out = EntityResolution.fuzzyJoin(left, right, "id", "name",
        blockLen = 12, maxLen = 64, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 10L, 2), (3L, 11L, 3)))
  }

  test("pairs in different blocks never meet, whatever their distance") {
    // identical strings except the FIRST char -> different 12-char blocks
    val a = Seq((1L, "Xsame same same")).toDF("id", "name")
    val b = Seq((2L, "Ysame same same")).toDF("id", "name")
    assert(EntityResolution.fuzzyJoin(a, b, "id", "name",
      blockLen = 12, maxDist = 8).isEmpty)
  }

  test("normalization: case and surrounding whitespace do not count as edits") {
    val a = Seq((1L, "  HELLO WORLD  ")).toDF("id", "name")
    val b = Seq((2L, "hello world")).toDF("id", "name")
    val out = EntityResolution.fuzzyJoin(a, b, "id", "name",
      blockLen = 5, maxDist = 0).collect()
    assert(out.length == 1 && out.head.getInt(2) == 0)
  }

  test("maxLen truncation bounds the verify: long tails beyond maxLen are invisible") {
    val a = Seq((1L, "prefix-block " + "a" * 100)).toDF("id", "name")
    val b = Seq((2L, "prefix-block " + "b" * 100)).toDF("id", "name")
    // within the first 64 chars the strings differ at 51 positions -> no
    // match at maxDist 8; at maxLen 13 they are identical
    assert(EntityResolution.fuzzyJoin(a, b, "id", "name",
      blockLen = 12, maxLen = 64, maxDist = 8).isEmpty)
    val out = EntityResolution.fuzzyJoin(a, b, "id", "name",
      blockLen = 12, maxLen = 13, maxDist = 0).collect()
    assert(out.length == 1)
  }

  test("selfPairs emits each unordered pair once and no self-matches") {
    val df = Seq((1L, "duplicate title"), (2L, "duplicate title"),
      (3L, "duplicate titles")).toDF("id", "name")
    val out = EntityResolution.fuzzyJoin(df, df, "id", "name",
        blockLen = 12, maxDist = 1, selfPairs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("fuzzyJoinMulti: a first-char typo escapes prefix blocking but " +
      "the suffix pass catches it; pairs found by both keys emit once") {
    val a = Seq((1L, "xannual report for fiscal year"),
      (2L, "quarterly summary of results")).toDF("id", "name")
    val b = Seq((10L, "aannual report for fiscal year"), // first char differs
      (20L, "quarterly summary of resultz")).toDF("id", "name")
    val prefixOnly = EntityResolution.fuzzyJoin(a, b, "id", "name",
        blockLen = 12, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // single-pass recall gap: (1, 10) differ in char 1 -> different block
    assert(prefixOnly == Set((2L, 20L)))
    val multi = EntityResolution.fuzzyJoinMulti(a, b, "id", "name",
        blockKeys = Seq(EntityResolution.prefixBlock(12),
          EntityResolution.suffixBlock(12)), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // (2, 20) is blocked together by BOTH keys — must still emit once
    assert(multi == Set((1L, 10L, 1), (2L, 20L, 1)))
  }

  test("sortedTokensBlock buckets word reorderings together") {
    val a = Seq((1L, "doe  john")).toDF("id", "name")
    val b = Seq((2L, "john doe")).toDF("id", "name")
    val out = EntityResolution.fuzzyJoinMulti(a, b, "id", "name",
        blockKeys = Seq(EntityResolution.sortedTokensBlock), maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // prefix/suffix blocks both miss ("doe j…" vs "john d…"); the sorted
    // token key maps both to "doe john" (multi-space collapsed), and the
    // 8-edit verify accepts the reordering
    assert(out == Set((1L, 2L)))
  }

  test("jaroWinklerJoin scores within-block pairs with the native expression") {
    import graft.functions.StringSimilarity
    import org.apache.spark.unsafe.types.UTF8String
    def score(a: String, b: String) = StringSimilarity.jaroWinklerImpl(
      UTF8String.fromString(a), UTF8String.fromString(b))
    val out = EntityResolution.jaroWinklerJoin(left, right, "id", "name",
        blockLen = 12, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fox = score("the quick brown fox jumps", "the quick brown fox jumped")
    val variant = score("shared prefix aaaa variant one",
      "shared prefix aaaa variant two")
    assert(fox >= 0.9 && variant >= 0.9)
    // id 2 / id 12 share no block; everything else scores exactly as the
    // expression does on the normalized strings
    assert(out == Set((1L, 10L, fox), (3L, 11L, variant)))
  }

  test("jaroWinklerJoin length prune is output-invariant") {
    import spark.implicits._
    // pairs spanning the prune boundary: same 4-char block, lengths 4 vs
    // 40 (pruned: jw upper bound < 0.9) and 4 vs 5 (kept)
    val a = Seq((1L, "abcd")).toDF("id", "name")
    val b = Seq((2L, "abcd" + "x" * 36), (3L, "abcde")).toDF("id", "name")
    val pruned = EntityResolution.jaroWinklerJoin(a, b, "id", "name",
      blockLen = 4, minSim = 0.9).collect().map(r => (r.getLong(1), r.getDouble(2)))
    // brute force: score every blocked pair without the prune
    import graft.functions.StringSimilarity.jaroWinklerCol
    val brute = a.crossJoin(b.withColumnRenamed("id", "id_b")
        .withColumnRenamed("name", "name_b"))
      .select(col("id_b"), jaroWinklerCol(lower(trim(col("name"))),
        lower(trim(col("name_b")))).as("jw"))
      .filter(col("jw") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pruned.toSet == brute.toSet)
    assert(pruned.map(_._1).toSet == Set(3L))
  }

  test("jaroWinklerJoin selfPairs emits each unordered pair once") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "hello worlds"), (3L, "zzz"))
      .toDF("id", "name")
    val out = EntityResolution.jaroWinklerJoin(df, df, "id", "name",
        blockLen = 5, minSim = 0.9, selfPairs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("damerauJoin: adjacent swaps cost 1 where levenshtein pays 2") {
    import spark.implicits._
    // two swaps after the 12-char block: "...details hte cat adn dog"
    val a = Seq((1L, "prefix block details the cat and dog")).toDF("id", "name")
    val b = Seq((2L, "prefix block details hte cat adn dog")).toDF("id", "name")
    val dlOut = EntityResolution.damerauJoin(a, b, "id", "name",
      blockLen = 12, maxDist = 2).collect()
    assert(dlOut.length == 1 && dlOut.head.getInt(2) == 2)
    // plain levenshtein sees 4 edits -> rejected at the same threshold
    assert(EntityResolution.fuzzyJoin(a, b, "id", "name",
      blockLen = 12, maxDist = 2).isEmpty)
  }
}
