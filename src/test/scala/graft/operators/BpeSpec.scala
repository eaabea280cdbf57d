package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class BpeSpec extends SparkSpecBase {

  import spark.implicits._

  // the Sennrich et al. 2016 worked example: low×5, lower×2, newest×6,
  // widest×3 — spread across documents so wordFreqs does the counting
  private lazy val sennrich = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("iteration").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("learnMerges reproduces the textbook merge sequence with " +
    "(count DESC, a, b) tie-breaks") {
    // hand trace: counts (e,s)=(s,t)=(t,</w>)=9 tie → lexicographic a
    // picks (e,s); then (es,t)=(t,</w>)=9 → (es,t); then (est,</w>)=9;
    // then (l,o)=(o,w)=7 → (l,o); then (lo,w)=7
    assert(mergeRows(Bpe.learnMerges(sennrich, merges = 5)) == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L)))
  }

  test("merge rewrite is leftmost-greedy non-overlapping: 'aaaa' merges " +
    "twice in one pass") {
    val one = Seq((1L, "aaaa")).toDF("doc_id", "text")
    // a a a a </w>: three (a,a) occurrences but only two non-overlapping
    // merges land → aa aa </w>; iteration 2 then pairs (aa,aa) and
    // (aa,</w>) at count 1, b-tiebreak '</w>' < 'aa'
    assert(mergeRows(Bpe.learnMerges(one, merges = 2)) == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "</w>", "aa</w>", 1L)))
    val stats = Bpe.compressionStats(one, merges = 1).collect().head
    assert(stats.getAs[Long]("n_bpe_tokens") == 3L) // aa aa </w>
  }

  test("non-[a-z0-9] words are excluded from training and stats") {
    val docs = Seq((1L, "don't stop-me low low")).toDF("doc_id", "text")
    val wf = Bpe.wordFreqs(docs).collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    assert(wf == Map("low" -> 2L))
    val stats = Bpe.compressionStats(docs, merges = 1).collect().head
    assert(stats.getAs[Long]("n_words") == 2L)
    assert(stats.getAs[Long]("n_chars") == 6L)
  }

  test("compressionStats: hand-computed fertility on the textbook corpus") {
    val probe = sennrich.union(Seq((9L, "low lower")).toDF("doc_id", "text"))
    // after 5 merges: low → [low </w>] = 2 tokens; lower → [low e r </w>]
    // = 4 tokens; chars 3 + 5 = 8 → 8/6
    val row = Bpe.compressionStats(probe, merges = 5)
      .filter($"doc_id" === 9L).collect().head
    assert(row.getAs[Long]("n_words") == 2L)
    assert(row.getAs[Long]("n_chars") == 8L)
    assert(row.getAs[Long]("n_bpe_tokens") == 6L)
    assert(row.getAs[Double]("chars_per_token") == math.rint(8.0 / 6.0 * 1e6) / 1e6)
  }

  test("learnMerges is invariant under repartitioning") {
    val a = mergeRows(Bpe.learnMerges(sennrich, merges = 4))
    val b = mergeRows(Bpe.learnMerges(sennrich.repartition(7), merges = 4))
    assert(a == b)
  }

  test("merges must be >= 1") {
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(sennrich, merges = 0)
    }
  }

  test("merges beyond achievable stop at exhaustion; stats saturate " +
    "instead of emptying") {
    // 'ab' exhausts after 2 merges (a+b, ab+</w>); asking for 10 must
    // return the 2 achievable rows — and compressionStats must see the
    // fully-merged vocab, not an empty frame erased by the empty-best
    // rewrite (round-7 advice)
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val table = Bpe.learnMerges(tiny, merges = 10).collect()
    assert(table.length == 2)
    val row = Bpe.compressionStats(tiny, merges = 10).collect()
    assert(row.length == 1, "stats emptied out on over-asked merges")
    assert(row.head.getAs[Long]("n_words") == 2L)
    assert(row.head.getAs[Long]("n_bpe_tokens") == 2L) // 1 symbol/word
  }

  test("persisted merges round-trip: encodeFromMerges ≡ compressionStats") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_merges").toString
    Bpe.writeMerges(Bpe.learnMerges(sennrich, merges = 5), dir)
    val fromScratch = Bpe.compressionStats(sennrich, merges = 5)
      .orderBy("doc_id").collect().toSeq
    val fromSaved = Bpe.encodeFromMerges(sennrich,
        Bpe.readMerges(spark, dir))
      .orderBy("doc_id").collect().toSeq
    assert(fromSaved == fromScratch,
      "loaded-merges encode diverged from the training-time rewrite")
  }

  test("encodeFromMerges tokenizes UNSEEN words under the saved vocabulary") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_merges").toString
    Bpe.writeMerges(Bpe.learnMerges(sennrich, merges = 5), dir)
    // 'lowest' never occurs in training; its encode must still apply
    // the learned merges in order (es, est, est</w>, lo, low):
    // l o w e s t </w> → l o w est</w> → lo w est</w> → low est</w>
    // = 2 tokens
    val out = Bpe.encodeFromMerges(
        Seq((9L, "lowest")).toDF("doc_id", "text"),
        Bpe.readMerges(spark, dir)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_bpe_tokens") == 2L,
      s"unseen word mis-encoded: ${out.head}")
  }

  test("encodeIds: hand-traced id sequence under the sorted symbol vocab") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    // final seqs: low→{low,</w>} lower→{low,e,r,</w>} newest→{n,e,w,est</w>}
    // widest→{w,i,d,est</w>}; distinct symbols sorted:
    // </w>=0 d=1 e=2 est</w>=3 i=4 low=5 n=6 r=7 w=8
    val vocab = Bpe.symbolVocab(sennrich, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("</w>" -> 0L, "d" -> 1L, "e" -> 2L, "est</w>" -> 3L,
      "i" -> 4L, "low" -> 5L, "n" -> 6L, "r" -> 7L, "w" -> 8L), vocab)
    // doc 2 = "lower lower" → low e r </w> twice
    val ids = Bpe.encodeIds(sennrich, merges)
      .filter(col("doc_id") === 2L).orderBy("pos").collect()
      .map(_.getAs[Long]("token_id")).toSeq
    assert(ids == Seq(5L, 2L, 7L, 0L, 5L, 2L, 7L, 0L), ids)
  }

  test("encodeIdsWithVocab: OOV symbols yield null ids AT their position, " +
    "never a renumbering") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    val vocab = Bpe.symbolVocab(sennrich, merges)
    // "low xz": low→{low,</w>}=[5,0]; xz→{x,z,</w>} with x,z unseen
    val out = Bpe.encodeIdsWithVocab(
        Seq((9L, "low xz")).toDF("doc_id", "text"), merges, vocab)
      .orderBy("pos").collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(out.toSeq == Seq(
      0L -> Some(5L), 1L -> Some(0L),                   // low </w>
      2L -> None, 3L -> None, 4L -> Some(0L)), out.toSeq) // x z </w>
  }

  // ---- byte-fallback encode ------------------------------------------
  // sennrich vocab: </w>=0 d=1 e=2 est</w>=3 i=4 low=5 n=6 r=7 w=8;
  // missing base symbols get dense ids after 8 in sort order — digits
  // 0-9 → 9..18, then letters a,b,c,f,g,h,j,k,l,m,o,p,q,s,t,u,v,x,y,z
  // → 19..38 (s=32, t=33, x=36, z=38)

  test("byteFallbackVocab: persisted ids never renumber; missing base " +
    "symbols get dense ids after the persisted range") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    val vocab = Bpe.symbolVocab(sennrich, merges)
    val ext = Bpe.byteFallbackVocab(vocab).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    orig.foreach { case (s, id) => assert(ext(s) == id, s"renumbered $s") }
    // 9 persisted + 30 missing base (37 candidates, 7 already present)
    assert(ext.size == 39, ext.size)
    assert(ext("0") == 9L && ext("9") == 18L && ext("a") == 19L &&
      ext("s") == 32L && ext("t") == 33L && ext("x") == 36L &&
      ext("z") == 38L, ext.toSeq.sortBy(_._2).mkString(","))
  }

  test("encodeIdsByteFallback ≡ encodeIdsWithVocab when nothing is OOV") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    val vocab = Bpe.symbolVocab(sennrich, merges)
    val a = Bpe.encodeIdsByteFallback(sennrich, merges, vocab)
      .orderBy("doc_id", "pos").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Bpe.encodeIdsWithVocab(sennrich, merges, vocab)
      .orderBy("doc_id", "pos").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("encodeIdsByteFallback: OOV base characters take fallback ids at " +
    "their positions — q252's null positions, filled, never renumbered") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    val vocab = Bpe.symbolVocab(sennrich, merges)
    val out = Bpe.encodeIdsByteFallback(
        Seq((9L, "low xz")).toDF("doc_id", "text"), merges, vocab)
      .orderBy("pos").collect().map(r => r.getLong(1) -> r.getLong(2))
    // identical shape to the encodeIdsWithVocab spec above: the two
    // null positions carry x=36, z=38; everything else unchanged
    assert(out.toSeq == Seq(0L -> 5L, 1L -> 0L,
      2L -> 36L, 3L -> 38L, 4L -> 0L), out.toSeq)
  }

  test("encodeIdsByteFallback: a multi-char OOV symbol (stale vocab) " +
    "decomposes to its base-unit id RUN at the right positions") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    // a vocab persisted before merge 3 landed: est</w> is missing, so
    // newest → {n,e,w,est</w>} hits the decompose path for its tail
    val stale = Bpe.symbolVocab(sennrich, merges)
      .filter(col("symbol") =!= "est</w>")
    val out = Bpe.encodeIdsByteFallback(
        Seq((9L, "newest")).toDF("doc_id", "text"), merges, stale)
      .orderBy("pos").collect().map(r => r.getLong(1) -> r.getLong(2))
    // n e w (est</w> → e s t </w>) = 6 2 8 2 32 33 0, no nulls
    assert(out.toSeq == Seq(0L -> 6L, 1L -> 2L, 2L -> 8L,
      3L -> 2L, 4L -> 32L, 5L -> 33L, 6L -> 0L), out.toSeq)
  }

  test("encodeIdsByteFallbackExt: mixed case, punctuation and Unicode " +
    "reach the byte fallback — hand-traced <0xNN> ids, zero nulls") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    val vocab = Bpe.symbolVocab(sennrich, merges)
    // ext vocab ids: persisted 0..8, digits 9..18, <0x00>..<0xFF> at
    // 19..274 (19 + NN), letters a.. at 275.. — so L(0x4C)=95,
    // O(0x4F)=98, W(0x57)=106, !(0x21)=52, é = C3 A9 = 214 188
    val out = Bpe.encodeIdsByteFallbackExt(
        Seq((9L, "low LOW é!")).toDF("doc_id", "text"), merges, vocab)
      .orderBy("pos").collect()
    assert(out.forall(!_.isNullAt(2)))
    val ids = out.map(r => r.getLong(1) -> r.getLong(2)).toSeq
    assert(ids == Seq(
      0L -> 5L, 1L -> 0L,                         // low </w>
      2L -> 95L, 3L -> 98L, 4L -> 106L, 5L -> 0L, // L O W </w>
      6L -> 214L, 7L -> 188L, 8L -> 52L, 9L -> 0L), ids) // é ! </w>
  }

  test("encodeIdsByteFallbackExt: token_id is never null on arbitrary " +
    "text (astral Unicode included); <>-bearing tokens are excluded") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    val vocab = Bpe.symbolVocab(sennrich, merges)
    val docs = Seq((1L, "Мир 🌍 a<b>c Low-er 42"))
      .toDF("doc_id", "text")
    val out = Bpe.encodeIdsByteFallbackExt(docs, merges, vocab).collect()
    assert(out.nonEmpty && out.forall(!_.isNullAt(2)))
    // "a<b>c" is filtered by the reserved-character word shape: 4 words
    // remain, each ending in one </w> token (id 0)
    assert(out.count(_.getLong(2) == 0L) == 4, out.length)
  }

  // ---- decode ---------------------------------------------------------

  test("decodeIds inverts encodeIds: every document round-trips to its " +
    "filtered word sequence") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    val out = Bpe.decodeIds(
        Bpe.encodeIds(sennrich, merges), Bpe.symbolVocab(sennrich, merges))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(out == Seq(
      1L -> "low low low low low",
      2L -> "lower lower",
      3L -> "newest newest newest newest newest newest",
      4L -> "widest widest widest"), out)
  }

  test("decodeIds skips null-id positions (lossy stable-vocab encode " +
    "decodes lossily) and is repartition-invariant") {
    val merges = Bpe.learnMerges(sennrich, merges = 5)
    val vocab = Bpe.symbolVocab(sennrich, merges)
    // "low xz": x,z are OOV → null ids at pos 2,3; decode keeps low</w>
    // plus xz's surviving </w> marker → a trailing word boundary only
    val ids = Bpe.encodeIdsWithVocab(
      Seq((9L, "low xz")).toDF("doc_id", "text"), merges, vocab)
    val dec = Bpe.decodeIds(ids, vocab).collect()
    assert(dec.length == 1 && dec.head.getString(1) == "low",
      dec.mkString(","))
    val rep = Bpe.decodeIds(ids.repartition(7), vocab).collect()
    assert(rep.head.getString(1) == dec.head.getString(1),
      "partitioning leaked into decode order")
  }

  test("fertilityBySlice: per-slice rollup reconciles with the per-doc " +
    "stats; null slices drop") {
    val docs = Seq(
      (1L, "low low low low low", "a"), (2L, "lower lower", "a"),
      (3L, "newest newest newest newest newest newest", "b"),
      (4L, "widest widest widest", "b"),
      (5L, "low", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val out = Bpe.fertilityBySlice(docs, merges = 5)
      .orderBy("slice").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("a", "b"), "null slice must drop")
    // reconcile against the gated per-doc frame joined back to slices
    val perDoc = Bpe.compressionStats(docs.filter($"source".isNotNull),
        merges = 5)
      .join(docs.select($"doc_id", $"source".as("slice")), Seq("doc_id"))
      .groupBy($"slice")
      .agg(org.apache.spark.sql.functions.count($"doc_id").as("d"),
        org.apache.spark.sql.functions.sum($"n_words").as("w"),
        org.apache.spark.sql.functions.sum($"n_bpe_tokens").as("t"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    out.foreach { case (s, (d, w, t, f)) =>
      assert(perDoc(s) == ((d, w, t)), s"slice $s mismatch")
      assert(f == BigDecimal(t.toDouble / w.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
