package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {

  private lazy val tiny = {
    import spark.implicits._
    Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0.9f, 0.1f, 0f)),   // closest to 0
      (2L, Seq(0f, 1f, 0f)),
      (3L, Seq(0f, 0.9f, 0.1f)),   // closest to 2
      (4L, Seq(-1f, 0f, 0f))       // opposite of 0
    ).toDF("vec_id", "embedding")
  }

  test("cosine column: hand-checked values") {
    import spark.implicits._
    val c = Seq((Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
        (Seq(1f, 2f, 2f), Seq(1f, 2f, 2f)))
      .toDF("a", "b")
      .select(Similarity.cosineCol(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(c(0) == 0.0)
    assert(math.abs(c(1) - 1.0) < 1e-12)
  }

  test("brute force top-k ranks by cosine, excludes self") {
    val out = Similarity.bruteForceTopK(tiny, tiny.where(col("vec_id") === 0), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
    assert(out.forall(_.getAs[Long]("query_id") == 0L))
  }

  test("lsh top-k recall vs brute force on real embeddings (sf0.001)") {
    val emb = Tables.embeddings(spark, sf())
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // this corpus's top-5 neighbors sit at moderate cosine (~0.4), so per-bit
    // collision p ≈ 0.6: recall needs coarse tables (4 bits → p^4 ≈ 0.16,
    // 8 tables → ~0.75). numBits trades recall for bucket size.
    val approx = Similarity.lshTopK(emb, q, k = 5, numBits = 4, numTables = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.4, s"LSH recall $recall too low — bucketing broken?")
  }

  test("portable (md5) plane family keeps comparable recall and matches a reference sig") {
    val emb = Tables.embeddings(spark, sf())
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, q, k = 5, numBits = 4, numTables = 8,
        portable = true)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.4, s"portable LSH recall $recall too low")

    // signature bit layout vs a from-scratch reference (oracle parity)
    val row = emb.where(col("vec_id") === 3)
      .select(col("embedding"),
        Similarity.hyperplaneSignatureCol(col("embedding"), 8, 2, portable = true)
          .as("sig"))
      .head()
    val vec = row.getSeq[Float](0)
    def comp(seed: Int, p: Int, j: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$p:$j".getBytes("UTF-8"))
      val h = (0 until 8).foldLeft(BigInt(0))((a, b) => (a << 8) | BigInt(d(b) & 0xFF))
      ((h mod BigInt(20001)).toLong - 10000L).toDouble / 10000.0
    }
    var expected = 0L
    for (p <- 0 until 8) {
      var dot = 0.0
      for (j <- vec.indices) dot += vec(j).toDouble * comp(2, p, j)
      if (dot > 0) expected |= (1L << p)
    }
    assert(row.getLong(1) == expected)
  }

  test("ivf probing every cell equals brute force exactly") {
    val emb = Tables.embeddings(spark, sf())
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 10 labels in the data → nProbe = 10 probes every inverted list
    val all = Similarity.ivfTopK(emb, q, k = 5, nProbe = 10)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == exact, "IVF with all cells probed must be exhaustive")
  }

  test("ivf partial probe keeps useful recall (data-dependent)") {
    val emb = Tables.embeddings(spark, sf())
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, q, k = 5, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall $recall below 4-of-10-cells floor")
  }

  test("persisted IVF index: loaded-index search equals from-scratch " +
      "search exactly, and the probe join prunes the list scan dynamically") {
    val emb = Tables.embeddings(spark, sf())
    val q = emb.where(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    Similarity.writeIvfIndex(emb, dir)
    val loaded = Similarity.ivfTopKFromIndex(spark, dir, q, k = 5, nProbe = 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(key(loaded) == key(
      Similarity.ivfTopK(emb, q, k = 5, nProbe = 3)))
    // the hive-partitioned lists layout + broadcast probe join must give
    // dynamic partition pruning on the list scan — the reason the index
    // pays for itself at scale (only nProbe cells' directories are read)
    val plan = loaded.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the lists scan:\n$plan")
  }

  test("lsh-blocked cosine near-dups find what brute force finds") {
    // the synthetic corpus has no high-cosine pairs (max ≈ 0.45), so probe
    // at 0.4 with coarse 4-bit tables
    val emb = Tables.embeddings(spark, sf())
    val exact = Similarity.cosineNearDups(emb, threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineNearDupsLsh(emb, threshold = 0.4, numBits = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must never invent pairs (cosine is re-verified)")
    assert(exact.nonEmpty, "corpus should have pairs above 0.4")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall > 0.3, s"0.4-cosine pairs should often share a bucket; recall $recall")
  }

  test("int8 quantization round-trips within scale/254 per element") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf())
    val q = Similarity.quantizeEmbeddings(emb)
      .join(emb, "vec_id")
      .select(col("vec_id"), col("scale"), col("quant"), col("embedding"))
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val scale = r.getDouble(1)
      val quant = r.getSeq[Long](2)
      val orig = r.getSeq[Float](3)
      assert(quant.length == orig.length)
      assert(quant.forall(v => v >= -127 && v <= 127), s"int8 range: $quant")
      val maxErr = quant.zip(orig).map { case (qv, x) =>
        math.abs(qv * scale / 127.0 - x) }.max
      assert(maxErr <= scale / 254.0 + 1e-12, s"round-trip err $maxErr vs ${scale / 254}")
    }
  }

  test("quantization: zero vector yields zeros; negatives round away from zero") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(0f, 0f)),
      (2L, Seq(-1f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeEmbeddings(corpus)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("quant"))).toMap
    assert(out(1L) == Seq(0L, 0L))
    assert(out(2L) == Seq(-127L, 64L)) // 0.5*127/1 = 63.5 -> 64
  }

  test("cosine near-dups: opposite vectors never pair, identical ones do") {
    import spark.implicits._
    val corpus = tiny.union(Seq((5L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineNearDups(corpus, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 5L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("semDedup: lowest id survives, decisions are pairwise within assigned cluster") {
    import spark.implicits._
    // cluster A around (1,0): ids 0,1 near-identical (cos≈1), id 2 at 45°
    // (cos≈0.707 to both); cluster B around (0,1): ids 10,11 identical.
    // label 9 on id 11 is WRONG on purpose: assignment must follow the
    // nearest centroid, not the input label — but with only two centroids
    // far apart, 11 still lands in B's cell.
    val corpus = Seq(
      (0L, Seq(1f, 0f), 0L),
      (1L, Seq(0.999f, 0.001f), 0L),
      (2L, Seq(0.7071f, 0.7071f), 0L),
      (10L, Seq(0f, 1f), 1L),
      (11L, Seq(0f, 1f), 1L)).toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(corpus, threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), r.getBoolean(3))).toMap
    assert(!out(0L)._3)            // lowest id in its cluster: kept
    assert(out(1L)._3)             // near-dup of 0: dropped
    assert(!out(2L)._3)            // 45° away: kept (max_lower_cos < 0.95)
    assert(out(2L)._2.isDefined)   // but it HAS lower neighbors
    assert(!out(10L)._3 && out(11L)._3) // exact dup pair in cluster B
    // no vector vanished: one verdict per input row
    assert(out.size == 5)
  }

  test("semDedup portable and default centroids agree on the verdicts (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.semDedup(emb, threshold = 0.9, portable = true)
      .select("vec_id", "dropped").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val b = Similarity.semDedup(emb, threshold = 0.9, portable = false)
      .select("vec_id", "dropped").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // centroid ulp differences must not flip any verdict on real data
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("silhouette: orthogonal pure clusters score exactly 1, a " +
    "mislabeled point drags its cluster down") {
    import spark.implicits._
    val pure = Seq(
      (1L, "A", Seq(1.0f, 0.0f)), (2L, "A", Seq(1.0f, 0.0f)),
      (3L, "B", Seq(0.0f, 1.0f)), (4L, "B", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.silhouette(pure)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("mean_silhouette"))).toMap
    assert(out == Map("A" -> (2L, 1.0), "B" -> (2L, 1.0)))
    val mixed = pure.union(Seq((5L, "B", Seq(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding"))
    val m = Similarity.silhouette(mixed)
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("mean_silhouette")).toMap
    assert(m("B") < 1.0)
    assert(m("A") > m("B"))
  }

  test("silhouette: single cluster has no other centroid — null mean; " +
    "portable and default paths agree to 6 dp on real data") {
    import spark.implicits._
    val one = Seq((1L, "A", Seq(1.0f, 0.0f)), (2L, "A", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val row = Similarity.silhouette(one).collect().head
    assert(row.isNullAt(row.fieldIndex("mean_silhouette")))
    val emb = graft.sources.Tables.embeddings(spark, sf())
    def run(p: Boolean) = Similarity.silhouette(emb, portable = p)
      .orderBy("label").collect()
      .map(r => (r.get(0), r.getLong(1),
        r.getAs[Double]("mean_silhouette"))).toSeq
    assert(run(true) == run(false))
  }

  test("topKAgreement: identical results give n_hit = n_approx; disjoint give 0") {
    import spark.implicits._
    val a = Seq((0L, 1L), (0L, 2L), (1L, 3L))
      .toDF("query_id", "neighbor_id")
    val same = Similarity.topKAgreement(a, a).orderBy("query_id").collect()
    assert(same.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L, 2L), (1L, 1L, 1L)))
    val other = Seq((0L, 9L), (1L, 8L)).toDF("query_id", "neighbor_id")
    val none = Similarity.topKAgreement(a, other).orderBy("query_id").collect()
    assert(none.map(_.getLong(2)).forall(_ == 0L))
  }

  test("pairAgreement: counts exact/extra/hit over the pair-key union") {
    import spark.implicits._
    val exact = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("id_a", "id_b")
    val approx = Seq((1L, 2L), (2L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val r = Similarity.pairAgreement(approx, exact).collect().head
    assert(r.getLong(r.fieldIndex("n_exact")) == 3L)
    assert(r.getLong(r.fieldIndex("n_extra")) == 1L)
    assert(r.getLong(r.fieldIndex("n_hit")) == 2L)
  }

  test("q127/q128 derived-gate margins hold on real embeddings (sf0.001)") {
    // the driver gate asserts recall flags with measured margin; this spec
    // pins the RAW values so a margin erosion shows up here before the
    // flag ever flips on the board
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val qs = emb.where(col("vec_id") < 20)
    val agree = Similarity.topKAgreement(
      Similarity.ivfTopK(emb, qs, k = 5, nProbe = 2),
      Similarity.bruteForceTopK(emb, qs, k = 5))
      .agg(sum("n_hit").cast("double") / sum("n_approx")).collect().head.getDouble(0)
    assert(agree >= 0.15, s"ivf fast-path recall $agree below spec floor 0.15 " +
      "(driver gate 0.10)")
    val sub = emb.where(col("vec_id") % 4 === 0)
    val pr = Similarity.pairAgreement(
      Similarity.cosineNearDupsLsh(sub, threshold = 0.4, numBits = 4),
      Similarity.cosineNearDups(sub, threshold = 0.4)).collect().head
    assert(pr.getLong(pr.fieldIndex("n_extra")) == 0L,
      "verify-then-emit LSH produced a pair the exact path lacks")
    val recall = pr.getLong(pr.fieldIndex("n_hit")).toDouble /
      math.max(pr.getLong(pr.fieldIndex("n_exact")), 1L)
    assert(recall >= 0.6, s"LSH pair recall $recall below spec floor 0.6 " +
      "(driver gate 0.5)")
  }

  test("appendIvfIndex ≡ rebuild: centroids re-derive bit-identically " +
      "from merged decimal moments; a non-portable build is refused") {
    import spark.implicits._
    def vecs(rows: Seq[(Long, Seq[Float], Long)]) =
      rows.toDF("vec_id", "embedding", "label")
    val a = vecs(Seq((1L, Seq(1f, 0f), 0L), (2L, Seq(0f, 1f), 0L),
      (3L, Seq(1f, 1f), 1L)))
    val b = vecs(Seq((4L, Seq(0.5f, 0.25f), 0L), (5L, Seq(2f, 0f), 1L)))
    val incDir = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val rebDir = java.nio.file.Files.createTempDirectory("ivf_reb").toString
    Similarity.writeIvfIndex(a, incDir, portable = true)
    Similarity.appendIvfIndex(spark, incDir, b)
    Similarity.writeIvfIndex(a.union(b), rebDir, portable = true)
    def cents(d: String) = spark.read.parquet(s"$d/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cents(incDir) == cents(rebDir))
    assert(spark.read.parquet(s"$incDir/lists").count() == 5L)
    // non-portable build has no moments frame -> actionable refusal
    val npDir = java.nio.file.Files.createTempDirectory("ivf_np").toString
    Similarity.writeIvfIndex(a, npDir, portable = false)
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(spark, npDir, b)
    }
    assert(e.getMessage.contains("portable"))
  }

  test("contrastivePairs: strict pair, degenerate pos==neg when the " +
      "nearest neighbor is already below tau, null negative when no " +
      "candidate is") {
    import spark.implicits._
    // unit-circle fixture, tau = 0.7:
    //   v1·v2 = 0.8, v1·v3 = 0.6, v2·v3 = 0.96,
    //   v4: (-0.6, 0.8) -> cos to v1/v2/v3 = -0.6 / 0.0 / 0.28
    val vecs = Seq((1L, Seq(1f, 0f)), (2L, Seq(0.8f, 0.6f)),
      (3L, Seq(0.6f, 0.8f)), (4L, Seq(-0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.contrastivePairs(vecs, tau = 0.7).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1L) == (2L, 3L)) // strict: pos 0.8, hardest <= 0.7 is v3
    assert(out(2L) == (3L, 4L)) // strict: pos 0.96, only v4 (0.0) <= 0.7
    assert(out(4L) == (3L, 3L)) // degenerate: best (0.28) already <= tau
    // null negative: a tight 2-vector corpus has nothing <= tau
    val tight = Seq((1L, Seq(1f, 0f)), (2L, Seq(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val t = Similarity.contrastivePairs(tight, tau = 0.7).collect()
    assert(t.forall(r => r.getLong(1) != r.getLong(0) && r.isNullAt(3)))
  }

  test("SQ8 IVF index: quantized-list search matches the raw index's " +
      "neighbor sets on well-separated data; appends keep the " +
      "quantized layout; per-element dequant error is bounded") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf())
    val a = emb.filter(col("vec_id") % 3 =!= 0L)
    val b = emb.filter(col("vec_id") % 3 === 0L).limit(20)
    val qs = emb.filter(col("vec_id") < 10L)
    val rawDir = java.nio.file.Files.createTempDirectory("ivf_raw").toString
    val sqDir = java.nio.file.Files.createTempDirectory("ivf_sq").toString
    Similarity.writeIvfIndex(a, rawDir, portable = true)
    Similarity.writeIvfIndex(a, sqDir, portable = true,
      quantizeLists = true)
    def keys(d: String) = Similarity
      .ivfTopKFromIndex(spark, d, qs, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = keys(rawDir)
    val sq = keys(sqDir)
    // int8 error is ~scale/254 per element — tiny against the top-5
    // cosine gaps here; allow a small tie-flip budget rather than
    // asserting equality of float rankings
    val agree = (raw intersect sq).size.toDouble / raw.size
    assert(agree >= 0.9, s"SQ8 recall vs raw index: $agree")
    // append matches the index's quantized layout (no schema mix)
    Similarity.appendIvfIndex(spark, sqDir, b)
    val lists = spark.read.parquet(s"$sqDir/lists")
    assert(lists.columns.contains("quant") && !lists.columns.contains("cv"))
    assert(lists.count() == a.count() + b.count())
    // dequant error bound: |x - q*scale/127| <= scale/254 + ulp slack
    val errOk = spark.read.parquet(s"$sqDir/lists")
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding")), "neighbor_id")
      .withColumn("maxerr", expr(
        "aggregate(zip_with(embedding, quant, (x, q) -> " +
          "abs(CAST(x AS DOUBLE) - q * scale / 127.0)), " +
          "CAST(0.0 AS DOUBLE), (acc, e) -> greatest(acc, e))"))
      .filter(col("maxerr") > col("scale") / 254.0 * 1.0001)
      .count()
    assert(errOk == 0L)
  }

  test("contrastivePairsIvf equals the exact twin on a cleanly " +
      "clustered corpus, and restricts candidates to probed cells") {
    import spark.implicits._
    // two tight unit-circle clusters around (1,0) and (0,1); label =
    // cluster, so nProbe=2 probes BOTH cells -> candidate set = all
    // vectors -> IVF must match the exact twin row-for-row
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.995f, 0.0998f), 0),
      (3L, Seq(0.98f, 0.199f), 0),
      (11L, Seq(0f, 1f), 1), (12L, Seq(0.0998f, 0.995f), 1),
      (13L, Seq(0.199f, 0.98f), 1))
      .toDF("vec_id", "embedding", "label")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val exact = asMap(Similarity.contrastivePairs(vecs, tau = 0.5))
    val ivf2 = asMap(Similarity.contrastivePairsIvf(vecs, tau = 0.5,
      nProbe = 2))
    assert(ivf2 == exact)
    // nProbe=1 probes only the own cluster's cell: positives stay
    // in-cluster, and no cross-cluster candidate (the only ones <= tau)
    // is visible -> every negative is null
    val ivf1 = Similarity.contrastivePairsIvf(vecs, tau = 0.5, nProbe = 1)
      .collect()
    assert(ivf1.length == 6)
    assert(ivf1.forall { r =>
      val a = r.getLong(0); val p = r.getLong(1)
      (a < 10L) == (p < 10L) && r.isNullAt(3)
    })
    // portable path (decimal centroids) agrees with the fast path here
    val port = asMap(Similarity.contrastivePairsIvf(vecs, tau = 0.5,
      nProbe = 2, portable = true))
    assert(port == exact)
    // contrastivePairsFor: panel anchors only, candidates = full corpus
    val panel = Similarity.contrastivePairsFor(
      vecs.filter(col("vec_id") < 3), vecs, tau = 0.5)
    assert(panel.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(asMap(panel) == exact.filter(_._1 < 3L))
  }

  test("selfKnnIvf: nProbe covering all cells equals brute-force kNN; " +
      "nProbe=1 confines neighbors to the own cell") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.995f, 0.0998f), 0),
      (3L, Seq(0.98f, 0.199f), 0),
      (11L, Seq(0f, 1f), 1), (12L, Seq(0.0998f, 0.995f), 1),
      (13L, Seq(0.199f, 0.98f), 1))
      .toDF("vec_id", "embedding", "label")
    val knn = Similarity.selfKnnIvf(vecs, k = 2, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(1), r.getDouble(3))).toMap
    // brute-force expectation on the unit circle: nearest = angular
    // neighbor; rank 2 = next one out
    assert(knn((1L, 1L))._1 == 2L)
    assert(knn((1L, 2L))._1 == 3L)
    assert(knn((2L, 1L))._1 == 3L || knn((2L, 1L))._1 == 1L)
    assert(knn((11L, 1L))._1 == 12L)
    assert(knn((13L, 1L))._1 == 12L)
    // every anchor present, exactly k rows each
    assert(knn.size == 12)
    // cosine6 is the rounded cosine and descends with rank
    assert(knn.forall { case ((_, r), (_, c)) => c <= 1.0 && r <= 2L })
    // nProbe=1: neighbors never cross the cluster boundary
    val own = Similarity.selfKnnIvf(vecs, k = 2, nProbe = 1).collect()
    assert(own.forall(r => (r.getLong(0) < 10L) == (r.getLong(1) < 10L)))
    // portable decimal centroids pick the same cells here
    val port = Similarity.selfKnnIvf(vecs, k = 2, nProbe = 2,
        portable = true).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(1), r.getDouble(3))).toMap
    assert(port == knn)
  }

  test("sizedPlaneBits: smallest bit budget covering ceil(n/target) " +
      "cells, monotone in n, clamped") {
    // 10 coarse cells, target 50: 500 rows fit in 10*2^1 = 20 cells
    assert(Similarity.sizedPlaneBits(500L, 10L, 50L) == 1)
    // 2 000 rows need ceil(2000/50) = 40 cells -> b = 2
    assert(Similarity.sizedPlaneBits(2000L, 10L, 50L) == 2)
    // 20 000 rows need 400 cells -> 10*2^6 = 640 -> b = 6
    assert(Similarity.sizedPlaneBits(20000L, 10L, 50L) == 6)
    // exact boundary: 1 000 rows = exactly 20 cells of 50 -> still b=1
    assert(Similarity.sizedPlaneBits(1000L, 10L, 50L) == 1)
    // one row past the boundary doubles the cells
    assert(Similarity.sizedPlaneBits(1001L, 10L, 50L) == 2)
    // never below 1 bit, even when the coarse cells alone suffice
    assert(Similarity.sizedPlaneBits(5L, 10L, 50L) == 1)
    // clamp at maxBits for absurd corpora
    assert(Similarity.sizedPlaneBits(Long.MaxValue / 4, 10L, 50L,
      maxBits = 8) == 8)
    // a huge coarse-cell count must not overflow the capacity product
    // (the shift guard): one bit already covers
    assert(Similarity.sizedPlaneBits(100L, Long.MaxValue / 2, 1L) == 1)
    // nCoarse*2 = MaxValue-1 just misses need = MaxValue at b=1; the
    // shift guard (not a wrapped product) answers b=2
    assert(Similarity.sizedPlaneBits(Long.MaxValue, Long.MaxValue / 2,
      1L, maxBits = 62) == 2)
    // monotone in n across a sweep
    val bs = (1L to 100L).map(i =>
      Similarity.sizedPlaneBits(i * 1000L, 10L, 50L))
    assert(bs == bs.sorted)
    intercept[IllegalArgumentException] {
      Similarity.sizedPlaneBits(10L, 0L, 50L) }
    intercept[IllegalArgumentException] {
      Similarity.sizedPlaneBits(10L, 10L, 0L) }
  }

  test("ivfTopK recall is monotone in nProbe: candidate sets nest and " +
      "a global-top-k member is never displaced by a non-member") {
    import spark.implicits._
    // 4 cells of 3 vectors spread on the unit circle — at low nProbe
    // the probed cells miss true neighbors, so recall strictly climbs
    val vecs = (0 until 12).map { i =>
      val a = i * math.Pi / 2 / 12 * 4
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat), i / 3)
    }.toDF("vec_id", "embedding", "label")
    val qs = vecs.filter(col("vec_id") < 6)
    val exact = Similarity.bruteForceTopK(vecs, qs, k = 3)
    val recalls = (1 to 4).map { np =>
      Similarity.topKAgreement(
          Similarity.ivfTopK(vecs, qs, k = 3, nProbe = np,
            portable = true), exact)
        .agg(org.apache.spark.sql.functions.sum(col("n_hit"))).head.getLong(0)
    }
    assert(recalls == recalls.sorted, s"recall must be monotone: $recalls")
    assert(recalls.last == 18L, "probing every cell is exact")
    assert(recalls.head < recalls.last,
      "the fixture must make low nProbe actually lossy")
  }

  test("ivfListBalance: per-cell counts, discrete p50/p99, skew flag " +
      "fires on a hot cell") {
    import spark.implicits._
    // 4 cells sized 1,1,2,8: sorted [1,1,2,8] -> p50 = 2nd = 1,
    // p99 = 4th = 8, ratio 8.0 > 4.0 default -> unbalanced
    val rows = (1L to 1L).map(i => (i, Seq(1f, 0f), 0)) ++
      (11L to 11L).map(i => (i, Seq(0f, 1f), 1)) ++
      (21L to 22L).map(i => (i, Seq(1f, 1f), 2)) ++
      (31L to 38L).map(i => (i, Seq(1f, 2f), 3))
    val vecs = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("ivfbal").toString
    Similarity.writeIvfIndex(vecs, dir, portable = true)
    val bal = Similarity.ivfListBalance(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(bal.keySet == Set("0", "1", "2", "3"))
    assert(bal("3").getLong(1) == 8L)
    assert(bal.values.forall(r => r.getLong(2) == 4L &&
      r.getLong(3) == 1L && r.getLong(4) == 8L &&
      r.getDouble(5) == 8.0 && r.getLong(6) == 0L))
    // a tolerant threshold flips the flag, counts unchanged
    val ok = Similarity.ivfListBalance(spark, dir, maxSkew = 10.0)
      .collect()
    assert(ok.forall(_.getLong(6) == 1L))
    // the SQ8 build reads identically — only list keys are touched
    val dirQ = java.nio.file.Files.createTempDirectory("ivfbalq").toString
    Similarity.writeIvfIndex(vecs, dirQ, portable = true,
      quantizeLists = true)
    assert(Similarity.ivfListBalance(spark, dirQ).collect().toSeq
      .map(_.toSeq).sortBy(_.head.toString) ==
      bal.values.toSeq.map(_.toSeq).sortBy(_.head.toString))
    intercept[IllegalArgumentException] {
      Similarity.ivfListBalance(spark, dir, maxSkew = 0.5) }
  }

  test("mutualKnnEdges: hub-induced asymmetric edges are dropped, " +
      "threshold filters") {
    import spark.implicits._
    // A at 0°, B at 12°, C at 20° on the unit circle: with k=1,
    // A→B but B→C (8° < 12°) and C→B — only (B, C) is mutual
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.9781f, 0.2079f), 0),
      (3L, Seq(0.9397f, 0.3420f), 0))
      .toDF("vec_id", "embedding", "label")
    val knn = Similarity.selfKnnIvf(vecs, k = 1, nProbe = 1)
    val edges = Similarity.mutualKnnEdges(knn, minCos = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges == Seq((2L, 3L)))
    // a threshold above every cosine empties the edge list
    assert(Similarity.mutualKnnEdges(knn, minCos = 0.9999).count() == 0L)
    intercept[IllegalArgumentException] {
      Similarity.mutualKnnEdges(knn, minCos = 1.5) }
    // a non-default anchor column threads through idCol
    val renamed = Similarity.selfKnnIvf(
      vecs.withColumnRenamed("vec_id", "id"), k = 1, nProbe = 1,
      idCol = "id")
    val viaId = Similarity.mutualKnnEdges(renamed, minCos = 0.5,
        idCol = "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaId == Seq((2L, 3L)))
  }
}
