package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {

  private lazy val ids = spark.range(0, 10000).select(col("id"))

  test("split fractions land near targets and are exhaustive") {
    val counts = Sampling.deterministicSplit(ids, "id", 0.8, 0.1)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") - 8000L) < 200, s"train ${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 150, s"val ${counts("val")}")
    assert(math.abs(counts("test") - 1000L) < 150, s"test ${counts("test")}")
  }

  test("assignment is stable under repartitioning and reruns") {
    def splits() = Sampling.deterministicSplit(ids.repartition(7), "id", 0.5, 0.25)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits() == splits())
  }

  test("quota sample keeps at most N per group, deterministically") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val out = Sampling.quotaSample(df, "src", "id", quota = 30)
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 30L), counts.toString)
    // small groups keep everything
    val small = Sampling.quotaSample(df.limit(3), "src", "id", quota = 30)
    assert(small.count() == 3)
    // deterministic under repartitioning
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.quotaSample(df.repartition(7), "src", "id", quota = 30)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("weighted mix: per-group fractions, default, and monotonicity") {
    val docs = spark.range(0, 8000)
      .select(col("id"), concat(lit("g"), pmod(col("id"), lit(4))).as("g"))
    val out = Sampling.weightedMix(docs, "g", "id",
        Map("g0" -> 1.0, "g1" -> 0.5, "g2" -> 0.1), defaultFraction = 0.25)
      .groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("g0") == 2000L, "fraction 1.0 keeps every row")
    assert(math.abs(out("g1") - 1000L) < 150, s"g1 ${out("g1")}")
    assert(math.abs(out("g2") - 200L) < 80, s"g2 ${out("g2")}")
    assert(math.abs(out("g3") - 500L) < 120, s"default g3 ${out("g3")}")
    // raising a fraction later must grow a SUPERSET (reproducible mixes)
    val small = Sampling.weightedMix(docs, "g", "id", Map("g1" -> 0.2),
        defaultFraction = 0.0)
      .select("id").collect().map(_.getLong(0)).toSet
    val large = Sampling.weightedMix(docs, "g", "id", Map("g1" -> 0.6),
        defaultFraction = 0.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
    // and the same ids as the global hashSample at the same fraction
    val viaHash = Sampling.hashSample(docs.filter(col("g") === "g1"), "id", 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small == viaHash)
  }

  test("token budget keeps the greedy best-score prefix, boundary doc included") {
    import spark.implicits._
    // (id, score, text) — token counts 3, 2, 4, 1 in score order a<b<c<d
    val docs = Seq(
      (1L, 0.2, "x y z"), (2L, 0.4, "p q"),
      (3L, 0.6, "a b c d"), (4L, 0.8, "w")).toDF("doc_id", "score", "text")
    val out = Sampling.tokenBudget(docs, "score", "doc_id", budgetTokens = 6L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_before")))).toMap
    // prefix sums before each doc: 0, 3, 5, 9 → kept while < 6: docs 1,2,3
    // (doc 3 overshoots to 9 but starts inside budget — boundary included)
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((3L, 0L)))
    assert(out(2L) == ((2L, 3L)))
    assert(out(3L) == ((4L, 5L)))
  }

  test("hash sample is a subset consistent with the split buckets") {
    val sampled = Sampling.hashSample(ids, "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    val again = Sampling.hashSample(ids, "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(sampled == again)
    assert(math.abs(sampled.size - 3000) < 200, s"got ${sampled.size}")
    // smaller fraction ⊂ larger fraction (threshold monotonicity)
    val small = Sampling.hashSample(ids, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(sampled))
  }

  test("topFractionPerGroup keeps ceil(frac*n) best rows per group, at least one") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // group a: 10 rows (keep ceil(2.5)=3 highest), b: 1 row (keep 1)
    val df = ((1L to 10L).map(i => ("a", i, i * 10.0)) :+ (("b", 99L, 1.0)))
      .toDF("g", "id", "score")
    val out = Sampling.topFractionPerGroup(df, "g", "score", 0.25, "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 8L), ("a", 9L), ("a", 10L), ("b", 99L)))
    // ties break on the tie column: equal scores keep the LOWEST ids
    val tied = (1L to 4L).map(i => ("t", i, 5.0)).toDF("g", "id", "score")
    val kept = Sampling.topFractionPerGroup(tied, "g", "score", 0.5, "id")
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      Sampling.topFractionPerGroup(df, "g", "score", 0.0, "id")
    }
  }

  test("stratifiedKFold: folds balanced to within one row per stratum") {
    import spark.implicits._
    val df = ((1L to 103L).map(i => ("big", i)) ++
      (200L to 206L).map(i => ("small", i))).toDF("g", "id")
    val sizes = Sampling.stratifiedKFold(df, "g", "id", k = 5)
      .groupBy("g", "fold").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // 103 = 5*20 + 3 -> folds 0..2 get 21, folds 3..4 get 20
    assert((0 to 4).map(f => sizes(("big", f))).sorted == Seq(20L, 20L, 21L, 21L, 21L))
    // 7 rows -> sizes 2,2,1,1,1 across the five folds
    assert((0 to 4).map(f => sizes(("small", f))).sorted == Seq(1L, 1L, 1L, 2L, 2L))
    // every fold id is in [0, k)
    assert(sizes.keySet.forall { case (_, f) => f >= 0 && f < 5 })
  }

  test("stratifiedKFold: assignment is a pure function of (stratum, id set)") {
    import spark.implicits._
    val df = (1L to 50L).map(i => ("g", i)).toDF("g", "id")
    def folds(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedKFold(d, "g", "id", k = 3)
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(folds(df) == folds(df.repartition(7)))
  }

  test("weightedSample: matches a local A-ES replay, k-bounded, " +
      "deterministic under repartitioning") {
    import spark.implicits._
    val rows = (1L to 60L).map(i => ("g" + (i % 2), i, (i % 7 + 1).toDouble))
    val df = rows.toDF("src", "id", "w")
    def localKey(id: Long, w: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4503599627370496.0
      -math.log(u) / w
    }
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map { case (_, id, w) => (id, localKey(id, w)) }
        .sortBy { case (id, key) => (key, id) }.take(5)
        .zipWithIndex.map { case ((id, _), r) => (g, id, r + 1L) }
    }.toSet
    val got = Sampling.weightedSample(df, "src", "id", "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    val again = Sampling.weightedSample(df.repartition(7), "src", "id", "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got)
  }

  test("weightedSample: overwhelming weight is always drawn; " +
      "non-positive and null weights cannot draw") {
    import spark.implicits._
    val df = ((1L to 30L).map(i => (i, 1.0)) :+ (99L, 1e12) :+
      (100L, 0.0) :+ (101L, -5.0)).toDF("id", "w")
      .withColumn("w", when(col("id") === 30L, lit(null)).otherwise(col("w")))
      .withColumn("g", lit("all"))
    val got = Sampling.weightedSample(df, "g", "id", "w", k = 10)
      .collect().map(r => r.getLong(1)).toSet
    // -ln(u)/1e12 is smaller than any unit-weight key unless that key's
    // u exceeds 1 - ~4e-11 — unreachable for these fixed ids
    assert(got.contains(99L))
    assert(!got.contains(100L) && !got.contains(101L) && !got.contains(30L))
    assert(got.size == 10)
  }

  test("weightedInterleave: exact hand-computed schedule, 2:1 per epoch") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (10L, "b"), (11L, "b")).toDF("doc_id", "source")
    val out = Sampling.weightedInterleave(df, "source", Seq("doc_id"),
        Map("a" -> 2L))
      .orderBy(col("mix_rank"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("epoch"), r.getAs[Long]("mix_rank")))
    // epoch 0: a×2 then b×1; epoch 1: a×2 then b×1
    assert(out.toSeq == Seq((1L, "a", 0L, 1L), (2L, "a", 0L, 2L),
      (10L, "b", 0L, 3L), (3L, "a", 1L, 4L), (4L, "a", 1L, 5L),
      (11L, "b", 1L, 6L)))
  }

  test("weightedInterleave: an exhausted source drops out of later epochs") {
    import spark.implicits._
    val df = ((1L to 2L).map((_, "a")) ++ (10L to 15L).map((_, "b")))
      .toDF("doc_id", "source")
    val tail = Sampling.weightedInterleave(df, "source", Seq("doc_id"), Map.empty)
      .filter(col("epoch") >= 2L)
      .select(col("source")).distinct().collect().map(_.getString(0))
    assert(tail.toSeq == Seq("b"))
  }

  test("clusterAwareSplit: cluster members share a split, singletons " +
      "fall back to their own id") {
    import spark.implicits._
    val docs = spark.range(0, 2000).select(col("id"))
    // pair up even ids with their successor: rep = the even id
    val clusters = spark.range(0, 2000).filter(col("id") % 2 === 1)
      .select(col("id").as("doc"), (col("id") - 1).as("cluster"))
      .union(spark.range(0, 2000).filter(col("id") % 2 === 0)
        .select(col("id").as("doc"), col("id").as("cluster")))
    val out = Sampling.clusterAwareSplit(docs, "id", clusters)
      .select(col("id"), col("split_key"), col("split"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // every odd doc must land exactly where its even twin landed
    (0L until 2000L by 2).foreach { even =>
      assert(out(even)._1 == even && out(even + 1)._1 == even)
      assert(out(even)._2 == out(even + 1)._2,
        s"pair ($even, ${even + 1}) split apart")
    }
    // and the per-doc split WOULD have separated at least one pair —
    // otherwise this test proves nothing about leakage protection
    val perDoc = Sampling.deterministicSplit(docs, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L until 2000L by 2).exists(e => perDoc(e) != perDoc(e + 1)))
    // docs absent from the cluster frame keep their own id as the key
    val solo = Sampling.clusterAwareSplit(docs,
      "id", clusters.filter(col("doc") < 0))
    assert(solo.filter(col("split_key") =!= col("id")).count() == 0L)
  }

  test("negativeSamples: k per row, never self, stable under " +
      "repartitioning, roughly uniform") {
    val docs = spark.range(0, 500).select(col("id"))
    val out = Sampling.negativeSamples(docs, "id", k = 3)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("sample_no"),
        r.getAs[Long]("negative_id")))
    assert(rows.length == 1500)
    assert(rows.forall { case (id, _, neg) => id != neg }, "self-pair found")
    // per-(id, j) exactly one negative
    assert(rows.map(t => (t._1, t._2)).distinct.length == 1500)
    // deterministic: same assignment from a differently-partitioned input
    val again = Sampling.negativeSamples(docs.repartition(13), "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("sample_no"),
        r.getAs[Long]("negative_id"))).toSet
    assert(again == rows.toSet)
    // uniform-ish: no negative id hogs the distribution (expected 3,
    // md5-uniform — allow a generous ceiling)
    val counts = rows.groupBy(_._3).map(_._2.length)
    assert(counts.max <= 15, s"max concentration ${counts.max}")
  }

  test("negativeSamples: a single-row corpus yields no negatives") {
    val one = spark.range(0, 1).select(col("id"))
    assert(Sampling.negativeSamples(one, "id", k = 2).count() == 0L)
  }

  test("negativeSamples: duplicate id values collapse to the distinct " +
      "id set and never-self holds by VALUE") {
    // 100 distinct ids, each duplicated 3x: identity semantics — one
    // group of k negatives per DISTINCT id, no negative equal to its
    // anchor via a duplicate, same output as the pre-deduped corpus
    val dup = spark.range(0, 300).select((col("id") % 100).as("id"))
    val out = Sampling.negativeSamples(dup, "id", k = 2)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("sample_no"),
        r.getAs[Long]("negative_id")))
    assert(rows.length == 200, "one k-group per distinct id")
    assert(rows.forall { case (id, _, neg) => id != neg }, "self by value")
    val clean = Sampling.negativeSamples(
      spark.range(0, 100).select(col("id")), "id", k = 2)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("sample_no"),
        r.getAs[Long]("negative_id"))).toSet
    assert(rows.toSet == clean, "dup corpus ≡ distinct corpus")
  }

  test("clusterAwareSplit: duplicate member rows min-reduce instead of " +
      "fanning out the corpus") {
    import spark.implicits._
    val docs = spark.range(0, 10).select(col("id"))
    // malformed map: doc 5 claims two representatives (raw pair output)
    val dup = Seq((5L, 3L), (5L, 4L), (6L, 2L)).toDF("doc", "cluster")
    val out = Sampling.clusterAwareSplit(docs, "id", dup)
    assert(out.count() == 10L) // no fan-out
    val k5 = out.filter(col("id") === 5L).select("split_key")
      .collect().map(_.getLong(0))
    assert(k5.toSeq == Seq(3L)) // deterministic min representative
  }

  test("rendezvousShard: matches a local HRW replay and balances shards") {
    val out = Sampling.rendezvousShard(ids.withColumnRenamed("id", "doc_id"),
      "doc_id", numShards = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def local(id: Long, n: Int): Int = (0 until n).maxBy { s =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, s)
    }
    Seq(0L, 1L, 4999L, 9999L).foreach(i => assert(out(i) == local(i, 8)))
    val counts = out.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 8)
    assert(counts.values.forall(c => c > 1000 && c < 1500)) // ~1250 each
  }

  test("rendezvousShard: growing the ring moves keys ONLY to the new " +
    "shard, ~1/(N+1) of them") {
    val df = ids.withColumnRenamed("id", "doc_id")
    val n8 = Sampling.rendezvousShard(df, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n9 = Sampling.rendezvousShard(df, "doc_id", 9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val moved = n8.keys.filter(k => n8(k) != n9(k)).toSeq
    assert(moved.forall(k => n9(k) == 8)) // every move targets the new shard
    assert(moved.size > 700 && moved.size < 1500, s"moved ${moved.size}")
  }

  test("temperatureMix: smallest source kept whole, larger flattened at " +
    "the exact sqrt rate") {
    import spark.implicits._
    val docs = ((1L to 16L).map(i => (i, "big")) ++
      (101L to 104L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(docs, "source", "doc_id", alpha = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Double]("keep_rate"))).toMap
    // small: rate sqrt(4/4) = 1 — every row survives
    assert((101L to 104L).forall(out.contains))
    assert(out(101L)._2 == 1.0)
    // big: rate sqrt(4/16) = 0.5; membership is exactly the md5 ring
    val expectedBig = (1L to 16L).filter { i =>
      graft.functions.TextHashes.md5UniformImpl(
        org.apache.spark.unsafe.types.UTF8String.fromString(i.toString)) <= 0.5
    }.toSet
    assert(out.keySet.filter(_ <= 16L) == expectedBig)
    assert(out(expectedBig.head)._2 == 0.5)
  }

  test("temperatureMix: alpha = 1 preserves natural proportions (keeps " +
    "everything)") {
    import spark.implicits._
    val docs = ((1L to 30L).map(i => (i, "a")) ++
      (31L to 40L).map(i => (i, "b"))).toDF("doc_id", "source")
    assert(Sampling.temperatureMix(docs, "source", "doc_id", alpha = 1.0)
      .count() == 40L)
  }

  test("temperatureMix: kept counts approach the n^alpha law on large " +
    "sources") {
    val docs = spark.range(0, 6400).selectExpr("id AS doc_id",
      "CASE WHEN id < 6000 THEN 'big' ELSE 'small' END AS source")
    val kept = Sampling.temperatureMix(docs, "source", "doc_id")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 400L)
    // big keeps ≈ sqrt(400/6000)·6000 = sqrt(400·6000) ≈ 1549
    assert(math.abs(kept("big") - 1549L) < 120, s"big kept ${kept("big")}")
  }

  test("temperatureMix: nulls drop, invalid alpha throws, repartition " +
    "invariant") {
    import spark.implicits._
    val docs = (Seq((Option(1L), Option("a")), (None, Option("a")),
      (Option(2L), None)) ++ (3L to 12L).map(i => (Option(i), Option("b"))))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureMix(docs, "source", "doc_id")
    assert(!out.select("doc_id").collect().map(_.getLong(0)).contains(2L))
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "source", "doc_id", alpha = 0.0)
    }
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMix(d, "source", "doc_id")
        .orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"))).toSeq
    assert(run(docs) == run(docs.repartition(5)))
  }
}
