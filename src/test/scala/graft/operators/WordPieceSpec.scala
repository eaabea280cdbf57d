package graft.operators

import graft.SparkSpecBase

/** WordPiece: vocabulary floor/top-K semantics and the greedy
  * longest-match-first walk, hand-replayed on tiny corpora.
  */
class WordPieceSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  test("vocabulary = char floor plus top-K multi-char forms") {
    import spark.implicits._
    // one word "abab" ×3: chars a,b (initial 'a' and '##a','##b');
    // multi-char forms: ab, aba, abab, ##b a? enumerate: i=1: a,ab,aba,abab
    // i=2: ##b,##ba,##bab  i=3: ##a,##ab  i=4: ##b
    val docs = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    val v = WordPiece.vocab(docs, maxPieceLen = 4, maxWordLen = 12,
        topK = 2)
      .as[(Long, String, Long)].collect().toSeq
    val forms = v.map(_._2).toSet
    // char floor always present
    assert(Set("a", "##a", "##b").subsetOf(forms))
    // top-2 multi-char by (cnt desc, form): every multi-char form has
    // cnt 3 (one occurrence per word instance), so lexicographic order
    // picks "##ab", "##ba"
    assert(forms === Set("a", "##a", "##b", "##ab", "##ba"))
    // ids rank by (cnt desc, form): counts — ##a:3, ##ab:3, ##b:6(two
    // positions i=2,i=4... both group to form ##b: 3+3=6), ##ba:3, a:3
    val byForm = v.map(t => t._2 -> (t._1, t._3)).toMap
    assert(byForm("##b")._2 === 6L)
    assert(byForm("##b")._1 === 1L, "##b has the top count")
    assert(v.sortBy(_._1).map(_._2) ===
      Seq("##b", "##a", "##ab", "##ba", "a"))
  }

  test("greedy longest-match-first segmentation with ## continuation") {
    import spark.implicits._
    // Vocab floor gives all chars; topK=1 admits the most frequent
    // multi-char form. Corpus: "aab" ×2, "ab" ×1.
    // Multi-char counts: aa:2, aab:2, ##ab:2+... i=2 of aab -> ##ab (2)
    // plus i=1? "ab" word i=1 -> ab:1. ##b from aab i=3 (2) and ab i=2 (1).
    // top1 multi-char by (cnt desc, form): "##ab" vs "aa" vs "aab" all 2
    // -> lexicographic: "##ab" wins.
    val docs = Seq((1L, "aab aab ab")).toDF("doc_id", "text")
    val seg = WordPiece.segmentation(docs, maxPieceLen = 3,
        maxWordLen = 12, topK = 1)
      .select("word", "segmentation").as[(String, String)]
      .collect().toMap
    // "aab": at pos1 longest in-vocab = "a" (aa/aab not admitted);
    // pos2: "##ab" (len 2) beats "##a" -> a ##ab
    assert(seg("aab") === "a ##ab")
    // "ab": pos1 "a" (no initial multi-char in vocab), pos2 "##b"
    assert(seg("ab") === "a ##b")
  }

  test("encodeIds: positions are contiguous per doc and ids map forms") {
    import spark.implicits._
    val docs = Seq((1L, "abab ab"), (2L, "ab")).toDF("doc_id", "text")
    val out = WordPiece.encodeIds(docs, maxPieceLen = 4, maxWordLen = 12,
        topK = 3)
      .orderBy("doc_id", "pos")
      .as[(Long, Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1)
    // contiguous 0-based positions
    byDoc.foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq === rows.indices.map(_.toLong)) }
    // the same word segments identically everywhere
    val d1 = byDoc(1L).map(r => (r._3, r._4)).toSeq
    val d2 = byDoc(2L).map(r => (r._3, r._4)).toSeq
    assert(d1.takeRight(d2.size) === d2, "shared word 'ab' must match")
    // every piece carries a non-null id and reconstruction holds
    assert(out.forall(_._4 > 0))
    val rebuilt = byDoc(2L).map(_._3).mkString("")
      .replace("##", "")
    assert(rebuilt === "ab")
  }

  test("words longer than maxWordLen are excluded from model and stream") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklm ab")).toDF("doc_id", "text")
    val out = WordPiece.encodeIds(docs, maxPieceLen = 4,
        maxWordLen = 12, topK = 4)
    assert(out.filter(col("piece").contains("m")).count() === 0)
    assert(out.count() > 0)
  }

  test("input validation") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      WordPiece.vocab(docs, maxPieceLen = 5, maxWordLen = 4)
    }
    intercept[IllegalArgumentException] {
      WordPiece.vocab(docs, topK = -1)
    }
  }

  test("decodeIds strips ## continuations and round-trips the corpus") {
    import spark.implicits._
    val docs = Seq((1L, "hashing the hash"), (2L, "hash rehash"))
      .toDF("doc_id", "text")
    val vocab = WordPiece.vocab(docs, maxPieceLen = 4, topK = 6)
    val ids = WordPiece.encodeIds(docs, maxPieceLen = 4, topK = 6)
    // multi-piece words exist (no word fits one ≤4-char piece except
    // "the"), so the ## path is genuinely exercised
    assert(ids.filter(col("piece").startsWith("##")).count() > 0)
    val out = WordPiece.decodeIds(ids, vocab).orderBy("doc_id")
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "hashing the hash"), (2L, "hash rehash")))
    // decode reads token_id only: corrupting one id changes the text
    val swapped = ids.withColumn("token_id",
      when(col("pos") === 0 && col("doc_id") === 2L,
        col("token_id") + 1L).otherwise(col("token_id")))
    val dec2 = WordPiece.decodeIds(swapped, vocab)
      .filter(col("doc_id") === 2L).select("decoded").as[String].head()
    assert(dec2 !== "hash rehash")
  }
}
