package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSpecBase {

  import spark.implicits._

  test("shared shingles counted, overlap fraction over eval shingles") {
    // shingleSize=2: train "a b c" → {ab, bc}; eval "b c d" → {bc, cd}
    // shared = {bc} → n_shared=1, overlap = 1/2
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "b c d")).toDF("doc_id", "text")
    val out = Decontamination.contaminationPairs(train, eval_, shingleSize = 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("train_doc") == 1L)
    assert(r.getAs[Long]("eval_doc") == 100L)
    assert(r.getAs[Long]("n_shared") == 1L)
    assert(r.getAs[Double]("overlap_frac") == 0.5)
  }

  test("disjoint docs produce no pair; repeated shingles count once") {
    val train = Seq(
      (1L, "x y z"),            // no overlap with eval
      (2L, "a b a b a b")).toDF("doc_id", "text") // {ab, ba} distinct
    val eval_ = Seq((100L, "a b")).toDF("doc_id", "text") // {ab}
    val out = Decontamination.contaminationPairs(train, eval_, shingleSize = 2)
      .collect()
    assert(out.length == 1, "only the overlapping train doc pairs up")
    assert(out.head.getAs[Long]("train_doc") == 2L)
    assert(out.head.getAs[Long]("n_shared") == 1L, "distinct shingles, not occurrences")
    assert(out.head.getAs[Double]("overlap_frac") == 1.0)
  }

  test("docs shorter than the shingle size drop out of both sides") {
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a b")).toDF("doc_id", "text") // 2 toks < 3
    assert(Decontamination.contaminationPairs(train, eval_, shingleSize = 3)
      .isEmpty)
  }

  test("minShared filters weak overlaps") {
    // train/eval share two 2-grams {ab, bc} but minShared=3 rejects
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a b c")).toDF("doc_id", "text")
    assert(Decontamination.contaminationPairs(train, eval_, shingleSize = 2,
      minShared = 3L).isEmpty)
    assert(Decontamination.contaminationPairs(train, eval_, shingleSize = 2,
      minShared = 2L).count() == 1)
  }

  test("semanticFlags: max-cosine thresholding against the eval set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // eval = x-axis; corpus: parallel (cos 1), 45° (cos ~0.7071),
    // orthogonal (cos 0)
    val eval_ = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(2.0f, 0.0f)),
      (2L, Seq(1.0f, 1.0f)),
      (3L, Seq(0.0f, 3.0f))).toDF("vec_id", "embedding")
    val out = Decontamination.semanticFlags(corpus, eval_,
        threshold = 0.9).orderBy("vec_id")
      .as[(Long, Double, Long)].collect()
    assert(out(0) === ((1L, 1.0, 1L)))
    assert(out(1)._2 === 0.707107 && out(1)._3 === 0L)
    assert(out(2) === ((3L, 0.0, 0L)))
    // multi-eval: the MAX governs
    val eval2 = Seq((100L, Seq(1.0f, 0.0f)), (101L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out2 = Decontamination.semanticFlags(corpus, eval2,
        threshold = 0.9).filter(col("vec_id") === 3L)
      .as[(Long, Double, Long)].collect().head
    assert(out2 === ((3L, 1.0, 1L)))
    // shuffle-join path agrees with the broadcast path
    val b = Decontamination.semanticFlags(corpus, eval2, threshold = 0.9,
      broadcastEval = false).orderBy("vec_id").collect()
    val a = Decontamination.semanticFlags(corpus, eval2, threshold = 0.9)
      .orderBy("vec_id").collect()
    assert(a.toSeq === b.toSeq)
    intercept[IllegalArgumentException] {
      Decontamination.semanticFlags(corpus, eval_, threshold = 0.0)
    }
  }

  test("ivfFlags: probed cells score, unprobed cells report null") {
    import spark.implicits._
    // two tight cells on orthogonal axes: cell "a" ≈ x-axis,
    // cell "b" ≈ y-axis; the eval vector is the x-axis, so with
    // nProbe = 1 only cell "a" is scored
    val corpus = Seq(
      (1L, "a", Seq(1.0f, 0.0f)),
      (2L, "a", Seq(0.9f, 0.1f)),
      (3L, "b", Seq(0.0f, 1.0f)),
      (4L, "b", Seq(0.1f, 0.9f))).toDF("vec_id", "label", "embedding")
    val eval_ = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val one = Decontamination.ivfFlags(corpus, eval_, threshold = 0.9,
        nProbe = 1).orderBy("vec_id").collect()
    assert(one(0).getDouble(1) === 1.0 && one(0).getLong(2) === 1L)
    assert(one(1).getLong(2) === 1L) // 0.9938 ≥ 0.9
    // cell "b" was never probed: honest null, flag 0
    assert(one(2).isNullAt(1) && one(2).getLong(2) === 0L)
    assert(one(3).isNullAt(1) && one(3).getLong(2) === 0L)
    // probing every cell reproduces the exact twin's flags
    val all = Decontamination.ivfFlags(corpus, eval_, threshold = 0.9,
        nProbe = 2).orderBy("vec_id")
      .select("vec_id", "max_cos6", "contaminated").collect()
    val exact = Decontamination.semanticFlags(corpus, eval_,
        threshold = 0.9).orderBy("vec_id").collect()
    assert(all.toSeq === exact.toSeq)
    // the shuffle-join path agrees with the broadcast path
    val nb = Decontamination.ivfFlags(corpus, eval_, threshold = 0.9,
        nProbe = 1, broadcastEval = false).orderBy("vec_id").collect()
    assert(nb.toSeq === one.toSeq)
    intercept[IllegalArgumentException] {
      Decontamination.ivfFlags(corpus, eval_, threshold = 0.9, nProbe = 0)
    }
  }

  private def evalSide(id: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    d.take(2).map(b => f"$b%02x").mkString < "8000"
  }

  test("cleanSplit: contaminated train docs drop visibly; short docs " +
      "and clean docs keep their ring split") {
    import spark.implicits._
    val ids = 1L to 30L
    val ev = ids.find(evalSide).get
    val contaminated = ids.filterNot(evalSide).take(1).head
    val short_ = ids.filterNot(evalSide).drop(1).head
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = ids.map { i =>
      val text =
        if (i == ev) s"$shared eval tail"
        else if (i == contaminated) s"prefix words $shared"
        else if (i == short_) "s1 s2 s3" // subset, < 8 tokens
        else s"unique$i a b c d e f g$i"
      (i, text)
    }.toDF("doc_id", "text")
    val out = Decontamination.cleanSplit(docs, evalFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(ev) === "eval")
    assert(out(contaminated) === "dropped")
    assert(out(short_) === "train", "no shingles -> never dropped")
    // every other doc keeps its raw ring side
    ids.filterNot(Set(ev, contaminated, short_)).foreach { i =>
      assert(out(i) === (if (evalSide(i)) "eval" else "train"), s"doc $i")
    }
    intercept[IllegalArgumentException] {
      Decontamination.cleanSplit(docs, evalFrac = 1.0)
    }
  }

  test("canaryHits: exact occurrence counts, absent canary reads zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text CANARY-X more"),
      (2L, "CANARY-X twice CANARY-X"),
      (3L, "nothing here"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Decontamination.canaryHits(docs,
        Seq("CANARY-X", "CANARY-Y")).orderBy("canary")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq === Seq(("CANARY-X", 2L, 3L), ("CANARY-Y", 0L, 0L)))
    intercept[IllegalArgumentException] {
      Decontamination.canaryHits(docs, Nil)
    }
    intercept[IllegalArgumentException] {
      Decontamination.canaryHits(docs, Seq("a", "a"))
    }
  }
}
