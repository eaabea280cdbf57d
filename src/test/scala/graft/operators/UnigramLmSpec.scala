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

  test("model ids rank by (cnt desc, piece) over the FULL candidate set " +
    "and encodeIds matches the written-and-reloaded model apply") {
    val m = UnigramLm.model(fixtureDocs, maxPieceLen = 3, maxWordLen = 12,
      iterations = 2).orderBy("token_id").collect()
    // full candidate set: used pieces lead in vocab-rank order, zero-
    // count pieces (like the no-longer-used 'a') trail
    val byPiece = m.map(r => r.getString(1) ->
      (r.getLong(0), r.getLong(2))).toMap
    assert(byPiece("aa") == (1L, 12L) && byPiece("aab") == (2L, 6L) &&
      byPiece("ba") == (3L, 4L) && byPiece("bb") == (4L, 2L))
    assert(byPiece.contains("a") && byPiece("a")._2 == 0L,
      "zero-count pieces stay in the model")
    assert(m.map(_.getLong(0)).toSeq == (1L to m.length.toLong))

    val dir = java.nio.file.Files
      .createTempDirectory("unigram_model").toString
    UnigramLm.writeModel(UnigramLm.model(fixtureDocs, maxPieceLen = 3,
      maxWordLen = 12, iterations = 2), dir)
    val fromScratch = UnigramLm.encodeIds(fixtureDocs, maxPieceLen = 3,
      maxWordLen = 12, iterations = 2).orderBy("doc_id", "pos").collect()
    val applied = UnigramLm.encodeIdsWithModel(fixtureDocs,
        UnigramLm.readModel(spark, dir), maxPieceLen = 3, maxWordLen = 12)
      .orderBy("doc_id", "pos").collect()
    assert(fromScratch.map(_.toString).toSeq ==
      applied.map(_.toString).toSeq)
    assert(fromScratch.nonEmpty &&
      fromScratch.forall(r => !r.isNullAt(3)), "no OOV on own corpus")
  }

  test("apply under a loaded model: known-alphabet unseen words segment, " +
    "out-of-alphabet words yield ONE null-id UNK position") {
    import spark.implicits._
    val model = UnigramLm.model(fixtureDocs, maxPieceLen = 3,
      maxWordLen = 12, iterations = 2)
    // "abba": unseen word, chars all in {a,b} → segments via model
    // pieces; "cab": 'c' outside the alphabet → UNK (one null row);
    // "aab": training word → trainer's segmentation
    val batch = Seq((9L, "abba cab aab")).toDF("doc_id", "text")
    val rows = UnigramLm.encodeIdsWithModel(batch, model,
        maxPieceLen = 3, maxWordLen = 12)
      .orderBy("pos")
      .collect().map(r => (r.getLong(1), Option(r.getString(2)),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // positions stay contiguous across the UNK: abba -> pieces, then
    // exactly one null position for "cab", then aab's id
    val unkRows = rows.filter(_._2.isEmpty)
    assert(unkRows.length == 1 && unkRows.head._3 == -1L)
    val abba = rows.takeWhile(_._2.nonEmpty)
    assert(abba.flatMap(_._2).mkString("") == "abba")
    assert(rows.last._2.contains("aab") && rows.last._3 == 2L)
    assert(rows.map(_._1).toSeq == (0L until rows.length.toLong))
  }

  test("decodeIds round-trips through ids and skips UNK positions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "abab baba"), (2L, "ab abab"))
      .toDF("doc_id", "text")
    val marked = UnigramLm.encodeIdsMarked(docs, maxPieceLen = 2,
      maxWordLen = 8, iterations = 1)
    val model = UnigramLm.model(docs, maxPieceLen = 2, maxWordLen = 8,
      iterations = 1)
    val out = UnigramLm.decodeIds(marked, model).orderBy("doc_id")
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "abab baba"), (2L, "ab abab")))
    // an UNK position (null token_id — the encodeIdsWithModel OOV
    // contract) is skipped: its word decodes lossily, neighbours intact
    val withUnk = marked.withColumn("token_id",
      when(col("doc_id") === 1L && col("wpos") === 1L && col("pos") >= 3,
        lit(null).cast("long")).otherwise(col("token_id")))
    val lossy = UnigramLm.decodeIds(withUnk, model)
      .filter(col("doc_id") === 1L).select("decoded").as[String].head()
    assert(lossy.startsWith("abab "))
    assert(lossy !== "abab baba")
  }
}
