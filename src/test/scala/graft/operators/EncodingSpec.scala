package graft.operators

import graft.SparkSpecBase

class EncodingSpec extends SparkSpecBase {

  import spark.implicits._

  // a: {1, 2, 3}, b: {10}; global mean = 16/4 = 4
  private def df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
    ("b", Some(10.0))).toDF("cat", "y")

  test("hand-computed shrinkage and leave-one-out (m = 2)") {
    val out = Encoding.targetEncode(df, "cat", "y", m = 2.0, loo = true)
      .orderBy("cat", "y").collect()
    // enc_a = (6 + 2*4)/(3 + 2) = 2.8; enc_b = (10 + 8)/(1 + 2) = 6.0
    assert(out.filter(_.getString(0) == "a")
      .forall(_.getAs[Double]("enc") == 2.8))
    assert(out.filter(_.getString(0) == "b")
      .forall(_.getAs[Double]("enc") == 6.0))
    // loo for (a, 1): (6 - 1 + 8)/(2 + 2) = 3.25; for the singleton b:
    // (10 - 10 + 8)/(0 + 2) = 4.0 (pure prior)
    assert(out.head.getAs[Double]("enc_loo") == 3.25)
    assert(out.last.getAs[Double]("enc_loo") == 4.0)
  }

  test("m = 0 is the raw category mean; singleton loo is null") {
    val out = Encoding.targetEncode(df, "cat", "y", m = 0.0, loo = true)
      .orderBy("cat", "y").collect()
    assert(out.head.getAs[Double]("enc") == 2.0) // 6/3
    val b = out.last
    assert(b.getAs[Double]("enc") == 10.0)
    assert(b.isNullAt(b.fieldIndex("enc_loo"))) // 0/0 guard
  }

  test("null target: excluded from sums, loo falls back to enc") {
    val d = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None))
      .toDF("cat", "y")
    val out = Encoding.targetEncode(d, "cat", "y", m = 0.0, loo = true)
      .orderBy($"y".asc_nulls_first).collect()
    val nullRow = out.head
    assert(nullRow.getAs[Double]("enc") == 2.0) // mean of {1, 3}
    assert(nullRow.getAs[Double]("enc_loo") == 2.0)
    assert(out.last.getAs[Double]("enc_loo") == 1.0) // (4-3)/1
  }

  test("all-null-target category shrinks fully to the global mean") {
    val d = Seq(("a", Some(2.0)), ("a", Some(6.0)), ("c", None))
      .toDF("cat", "y")
    val out = Encoding.targetEncode(d, "cat", "y", m = 5.0, loo = false)
      .filter($"cat" === "c").head()
    assert(out.getAs[Double]("enc") == 4.0) // (0 + 5*4)/(0 + 5)
  }

  test("null category is a real category") {
    val d = Seq((Some("a"), 1.0), (None, 7.0), (None, 9.0))
      .toDF("cat", "y")
    val out = Encoding.targetEncode(d, "cat", "y", m = 0.0, loo = false)
      .filter($"cat".isNull).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Double]("enc") == 8.0))
  }

  // reference implementation of the md5 bucket/sign family, so the
  // expected rows are computed independently of the Spark expressions
  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
  private def bucketOf(term: String, n: Int): Long =
    java.lang.Long.parseLong(md5hex(term).substring(0, 13), 16) % n
  private def signOf(term: String): Long =
    if (java.lang.Long.parseLong(md5hex(term).substring(13, 14), 16)
      % 2 == 0) 1L else -1L

  test("hashFeatures: exact signed sparse rows vs an independent md5 " +
      "reference") {
    val d = Seq((1L, "alpha beta beta"), (2L, "alpha alpha alpha"))
      .toDF("doc_id", "text")
    val out = Encoding.hashFeatures(d, "doc_id", "text", nBuckets = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = Map(
      (1L, bucketOf("alpha", 64)) -> signOf("alpha") * 1L,
      (1L, bucketOf("beta", 64)) -> signOf("beta") * 2L,
      (2L, bucketOf("alpha", 64)) -> signOf("alpha") * 3L)
    // alpha and beta may collide in 64 buckets — merge like the operator
    val merged = expected.groupBy(_._1).map { case (k, vs) =>
      k -> vs.values.sum }.filter(_._2 != 0L)
    assert(out == merged)
  }

  test("hashFeatures: identical texts produce identical vectors; " +
      "cancelled buckets are dropped") {
    val d = Seq((1L, "x y z x"), (2L, "x y z x")).toDF("doc_id", "text")
    val out = Encoding.hashFeatures(d, "doc_id", "text", nBuckets = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getLong(1) -> r.getLong(2)).toSet }
    assert(out(1L) == out(2L))
    assert(out(1L).forall(_._2 != 0L))
  }

  test("hashFeatureVector: dense rows agree with the sparse form, " +
      "zero-filled elsewhere") {
    val d = Seq((1L, "alpha beta beta"), (2L, "gamma")).toDF("doc_id", "text")
    val sparse = Encoding.hashFeatures(d, "doc_id", "text", nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dense = Encoding.hashFeatureVector(d, "doc_id", "text", nBuckets = 16)
      .collect()
    assert(dense.length == 2)
    dense.foreach { r =>
      val id = r.getLong(0)
      (1 to 16).foreach { j =>
        assert(r.getAs[Double](s"x$j") ==
          sparse.getOrElse((id, j - 1L), 0L).toDouble)
      }
    }
  }

  // the fastText-lite rationale, demonstrated: a junk source built by
  // LENGTH-PRESERVING token substitution has hand features (avg token
  // length, punct/stopword/alpha ratios) IDENTICAL to its clean twin
  // doc-for-doc — a linear model over them cannot beat coin-flip — while
  // the hashed bag-of-words sees the disjoint vocabulary and separates
  test("hashed features separate a vocabulary-distinct junk source the " +
      "hand features provably miss") {
    import org.apache.spark.sql.functions._
    val subst = Map("data" -> "zorp", "query" -> "flurm", "join" -> "qung",
      "scan" -> "snrf", "merge" -> "plomp")
    val vocab = subst.keys.toSeq.sorted
    val good = (0 until 20).map { i =>
      val toks = (0 until 30 + i % 5).map(j => vocab((i * 7 + j * 3) % 5))
      (i.toLong, toks.mkString(" "), 0)
    }
    val junk = good.map { case (id, text, _) =>
      (id + 100L, text.split(" ").map(subst).mkString(" "), 1)
    }
    val docs = (good ++ junk).toDF("doc_id", "text", "label")
    val hand = LogReg.train(
      TextAnalysis.qualityFeatures(docs), "label",
      Seq("avg_token_len", "punct_ratio", "stopword_ratio", "alpha_ratio"),
      iterations = 5, lr = 0.5).head()
    // every (good, junk) pair shares one feature vector with opposite
    // labels: any classifier gets exactly one of the two right
    assert(hand.getAs[Double]("accuracy") == 0.5)
    val hashed = LogReg.train(
      Encoding.hashFeatureVector(docs, "doc_id", "text", nBuckets = 32)
        .join(docs.select(col("doc_id"), col("label")), Seq("doc_id")),
      "label", (1 to 32).map(j => s"x$j"), iterations = 5, lr = 0.5).head()
    assert(hashed.getAs[Double]("accuracy") >= 0.9)
  }
}
