package graft.operators

import graft.SparkSpecBase

/** Bigram-LM perplexity: hand-replayed tiny corpus + tercile buckets. */
class NgramLmSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("docNll replays the add-one bigram model by hand") {
    import spark.implicits._
    // doc1: a b b   doc2: b a        V = {a, b} = 2
    // bigrams: (<s>,a) (a,b) (b,b) | (<s>,b) (b,a)
    // contexts: c1(<s>)=2 c1(a)=1 c1(b)=2
    val docs = Seq((1L, "a b b"), (2L, "b a")).toDF("doc_id", "text")
    val out = NgramLm.docNll(docs).orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()

    val lpSA = q6(math.log(2.0 / 4)) // (<s>,a): (1+1)/(2+2)
    val lpAB = q6(math.log(2.0 / 3)) // (a,b):   (1+1)/(1+2)
    val lpBB = q6(math.log(2.0 / 4)) // (b,b):   (1+1)/(2+2)
    val lpSB = q6(math.log(2.0 / 4)) // (<s>,b)
    val lpBA = q6(math.log(2.0 / 4)) // (b,a)

    val nll1 = (lpSA + lpAB + lpBB).toDouble / -1e6 / 3
    val nll2 = (lpSB + lpBA).toDouble / -1e6 / 2
    assert(out(0) === ((1L, 3L, nll1, q6(math.exp(nll1)).toDouble / 1e6)))
    assert(out(1) === ((2L, 2L, nll2, q6(math.exp(nll2)).toDouble / 1e6)))
  }

  test("every token is scored: n_tokens equals the doc token count") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "  x   y  z ")).toDF("doc_id", "text")
    val n = NgramLm.docNll(docs).orderBy("doc_id")
      .select("n_tokens").as[Long].collect()
    assert(n.toSeq === Seq(1L, 3L))
  }

  test("pplBuckets cuts nll terciles with head = lowest perplexity") {
    import spark.implicits._
    // 6 docs: the more repetitive the text, the lower its nll under
    // the corpus model — assert bucket sizes and that the bucket
    // order agrees with the docNll order.
    val docs = Seq(
      (1L, "a a a a a a"), (2L, "a a a a a b"), (3L, "a b a b c c"),
      (4L, "c b a d e f"), (5L, "f e d c b a"), (6L, "a c e b d f")
    ).toDF("doc_id", "text")
    val nll = NgramLm.docNll(docs)
      .orderBy("nll", "doc_id").select("doc_id")
      .as[Long].collect().toSeq
    val buckets = NgramLm.pplBuckets(docs)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(buckets.values.map(_._2).groupBy(identity)
      .view.mapValues(_.size).toMap ===
      Map("head" -> 2, "middle" -> 2, "tail" -> 2))
    assert(nll.map(buckets(_)._1).toSeq === (1L to 6L),
      "rank order must equal the (nll, doc_id) order")
    assert(nll.take(2).forall(buckets(_)._2 == "head"))
    assert(nll.slice(2, 4).forall(buckets(_)._2 == "middle"))
    assert(nll.drop(4).forall(buckets(_)._2 == "tail"))
  }

  private def trainSide(id: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(2).map(b => f"$b%02x").mkString
    hex < "8000"
  }

  test("heldOutNllBySource: no held-out token drops, even unseen words") {
    import spark.implicits._
    // ids split by the md5 ring; give every held-out doc one word the
    // train half cannot know, so the unseen-bigram mass is exercised
    val ids = (1L to 40L)
    val docs = ids.map { i =>
      val text = if (trainSide(i)) "a b a b" else s"a b zz$i b"
      (i, "src" + (i % 2), text)
    }.toDF("doc_id", "lang", "text")
      .withColumnRenamed("lang", "source")
    val heldIds = ids.filterNot(trainSide)
    val out = NgramLm.heldOutNllBySource(docs).collect()
    val totTokens = out.map(_.getLong(2)).sum
    val totDocs = out.map(_.getLong(1)).sum
    assert(totDocs === heldIds.size.toLong)
    // every held doc has exactly 4 tokens — none may silently drop
    assert(totTokens === 4L * heldIds.size)
    out.foreach(r => assert(r.getDouble(3) > 0))
  }

  test("heldOutNllBySource validates trainFrac") {
    import spark.implicits._
    val docs = Seq((1L, "s", "a b")).toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      NgramLm.heldOutNllBySource(docs, trainFrac = 1.0)
    }
  }

  test("knHeldOutNllBySource: no token drops; backoff beats the flat " +
      "add-one penalty on natural-but-new combinations") {
    import spark.implicits._
    val ids = (1L to 40L)
    val docs = ids.map { i =>
      val text = if (trainSide(i)) "a b a b" else s"a b zz$i b"
      (i, "src" + (i % 2), text)
    }.toDF("doc_id", "source", "text")
    val heldIds = ids.filterNot(trainSide)
    val out = NgramLm.knHeldOutNllBySource(docs).collect()
    assert(out.map(_.getLong(1)).sum === heldIds.size.toLong)
    // every held doc has exactly 4 tokens — the floored continuation
    // unigram scores even the zz* words train never saw
    assert(out.map(_.getLong(2)).sum === 4L * heldIds.size)
    out.foreach(r => assert(r.getDouble(3) > 0 &&
      !r.getDouble(3).isInfinite))
    intercept[IllegalArgumentException] {
      NgramLm.knHeldOutNllBySource(docs, trainFrac = 0.0)
    }
  }

  test("null and blank documents are excluded") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, null), (3L, "   "))
      .toDF("doc_id", "text")
    assert(NgramLm.docNll(docs).count() === 1)
  }

  test("knTrigramNll replays the interpolated-KN arithmetic by hand") {
    import spark.implicits._
    // docs "a b" / "a c": trigram types (<s>,<s>,a) c=2, (<s>,a,b) c=1,
    // (<s>,a,c) c=1. Bigram types T=3 ((<s>,a),(a,b),(a,c)), V=3.
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = NgramLm.knTrigramNll(docs).orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    val pu = 2.0 / 7.0 // (n1+1)/(T+V+1) for a, b and c alike (n1 = 1)
    // (<s>,<s>,a): pBi(a|<s>) then the trigram level — operator op order
    val pBiA = (1.0 - 0.75) / 1.0 + ((0.75 * 1.0) / 1.0) * pu
    val p1 = (2.0 - 0.75) / 2.0 + ((0.75 * 1.0) / 2.0) * pBiA
    // (<s>,a,b) and (<s>,a,c) are symmetric: c3=1, c12=2, n3=2;
    // pBi: n1mid=1, nmid(a)=2, ntyp2(a)=2
    val pBiB = (1.0 - 0.75) / 2.0 + ((0.75 * 2.0) / 2.0) * pu
    val p2 = (1.0 - 0.75) / 2.0 + ((0.75 * 2.0) / 2.0) * pBiB
    val s = q6(math.log(p1)) + q6(math.log(p2))
    val nll = s.toDouble / -1e6 / 2
    val ppl6 = q6(math.exp(nll)).toDouble / 1e6
    assert(out(0) === ((1L, 2L, nll, ppl6)))
    assert(out(1) === ((2L, 2L, nll, ppl6)))
    intercept[IllegalArgumentException] {
      NgramLm.knTrigramNll(docs, discount = 1.0)
    }
  }

  // The "francisco" long-tail corpus: `f` is frequent but only ever
  // follows `s` (a bound collocate); `b` follows 42 distinct
  // predecessors (a natural continuation). Docs T1 = "z f" (id 21) and
  // T2 = "z b" (id 22) each use a once-seen continuation of the shared
  // context `z` — add-one scores them IDENTICALLY (same counts
  // everywhere it looks), while KN's continuation weighting strictly
  // prefers T2. 63 docs total puts the add-one tie exactly on the
  // head/middle boundary, so the smoothing choice flips tercile
  // assignments, not just ranks.
  private def franciscoCorpus = {
    import spark.implicits._
    val sf = (1L to 20L).map(i => (i, "s f"))
    val t = Seq((21L, "z f"), (22L, "z b"))
    val p = (23L to 63L).map(i => (i, s"p$i b"))
    (sf ++ t ++ p).toDF("doc_id", "text")
  }

  test("add-one ties the francisco pair; KN orders it by continuation") {
    import spark.implicits._
    val addOne = NgramLm.docNll(franciscoCorpus)
      .filter(col("doc_id").isin(21L, 22L))
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect()
    assert(addOne(0)._3 === addOne(1)._3,
      "add-one cannot distinguish the bound collocate from the natural " +
        "continuation: both are count-1 bigrams of the same context")
    val kn = NgramLm.knTrigramNll(franciscoCorpus)
      .filter(col("doc_id").isin(21L, 22L))
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect()
    assert(kn(1)._3 < kn(0)._3,
      "KN must score the high-continuation token strictly better")
  }

  test("the smoothing choice flips tercile assignments on the long tail") {
    import spark.implicits._
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    val a1 = buckets(NgramLm.pplBuckets(franciscoCorpus))
    val kn = buckets(NgramLm.knPplBuckets(franciscoCorpus))
    // add-one: the tie breaks by id — T1 takes the last head slot
    assert(a1(21L) === "head")
    assert(kn(21L) !== "head",
      "KN demotes the bound-collocate doc out of the head tercile")
    assert(kn(22L) === "head",
      "KN promotes the natural-continuation doc into the head tercile")
  }
}
