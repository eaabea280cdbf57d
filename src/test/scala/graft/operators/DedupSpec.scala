package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy cat"),          // near dup of 0
      (3L, "completely different text about spark engines at scale"),
      (4L, "another unrelated document mentioning nothing similar"),
      (5L, "the quick brown fox jumps over the lazy dog today")     // near dup of 0
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps smallest tie key per group") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(0L, 2L, 3L, 4L, 5L))
  }

  test("incremental exact dedup: intra-batch dups and known keys drop") {
    import spark.implicits._
    val batch = Seq(
      (1L, "x"), (2L, "x"),  // intra-batch dup — min id survives
      (3L, "y"),
      (4L, "z")              // already ingested — dropped
    ).toDF("doc_id", "fp")
    // duplicate known keys must be harmless (anti-join multiplicity)
    val known = Seq("z", "z").toDF("fp")
    val out = Dedup.incrementalExact(batch, known, "fp", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("exact summary reports survivor and dup count") {
    val out = Dedup.exactSummary(docs, col("text"), col("doc_id"))
      .where(col("dup_count") > 1).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("survivor_id") == 0L)
    assert(out(0).getAs[Long]("dup_count") == 2L)
  }

  test("shingles: n-grams over tokens; short docs collapse to whole text") {
    import spark.implicits._
    val sh = Seq((0L, "a b c d"), (1L, "a b")).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shinglesCol(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
    assert(sh(0L) == Seq("a b c", "b c d"))
    assert(sh(1L) == Seq("a b"))
  }

  test("minhash finds exact and near dups, skips unrelated") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("minhash jaccard of exact dup is 1.0") {
    val j = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .where(col("doc_a") === 0 && col("doc_b") === 1)
      .head().getAs[Double]("jaccard")
    assert(j == 1.0)
  }

  test("simhash: exact dups at hamming 0; unrelated docs far apart") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").longValue))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0L))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard matches hand-computed value") {
    // doc0 shingles (7): {the quick brown, quick brown fox, brown fox jumps,
    //   fox jumps over, jumps over the, over the lazy, the lazy dog}
    // doc2 replaces dog→cat: intersection 6, union 8 → 0.75
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.3, shingleSize = 3, maxDf = 10)
      .where(col("doc_a") === 0 && col("doc_b") === 2)
      .head().getAs[Double]("jaccard")
    assert(out == 0.75)
  }

  test("ubiquitous shingles are dropped by the df cap, not joined (skew guard)") {
    import spark.implicits._
    // 50 docs sharing one identical text: every shingle has df=50 > maxDf,
    // so blocking produces NO candidates — the hot group is dropped before
    // any quadratic pair generation (precision/recall trade documented on
    // ngramJaccardPairs; near-dup detection for such corpora belongs to
    // exact dedup, which these docs trivially hit)
    val clones = (0L until 50L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(clones, "doc_id", "text",
      threshold = 0.1, shingleSize = 3, maxDf = 5)
    assert(pairs.isEmpty, "hot shingle groups must be capped out")
    // exact dedup catches them instead
    assert(Dedup.exact(clones, Seq("text"), "doc_id").count() == 1)
  }

  test("persisted minhash index: batch-vs-index and within-batch pairs " +
      "equal the from-scratch run restricted to batch-touching pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf())
    val dir = java.nio.file.Files.createTempDirectory("mh_index").toString
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    Dedup.writeMinhashIndex(corpus, dir, "doc_id", "text")
    val fromIndex = Dedup.nearDupsFromIndex(spark, dir, batch,
        "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scratch = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 2 == 1 || b % 2 == 1 }.toSet
    assert(fromIndex == scratch)
    assert(fromIndex.nonEmpty, "corpus should contain near-dup pairs")
    Dedup.releaseCaches()
  }

  test("appendMinhashIndex ≡ rebuild, exactly: kept buckets accumulate, " +
      "a touched bucket crossing the cap drops whole, a build-dropped " +
      "bucket stays dropped against batch arrivals") {
    import spark.implicits._
    def clones(ids: Range, text: String) = ids.map(i => (i.toLong, text))
    // bucket D: 5 identical docs in A (> cap 3 → dropped AT BUILD);
    // bucket K: 2 in A (kept), +2 in B (4 > 3 → must drop ON APPEND);
    // bucket P: a genuine near-dup pair split across A and B
    val pairA = "alpha beta gamma delta epsilon zeta eta theta"
    val pairB = "alpha beta gamma delta epsilon zeta eta iota"
    val a = (clones(0 to 4, "dread dread dread dread dread dread") ++
      clones(10 to 11, "keen keen keen keen keen keen") ++
      Seq((20L, pairA))).toDF("doc_id", "text")
    val b = (clones(5 to 6, "dread dread dread dread dread dread") ++
      clones(12 to 13, "keen keen keen keen keen keen") ++
      Seq((21L, pairB))).toDF("doc_id", "text")
    val probe = Seq((30L, pairA), (31L, "dread dread dread dread dread dread"))
      .toDF("doc_id", "text")
    val incDir = java.nio.file.Files.createTempDirectory("mh_inc").toString
    val rebDir = java.nio.file.Files.createTempDirectory("mh_reb").toString
    Dedup.writeMinhashIndex(a, incDir, "doc_id", "text", maxBucket = 3L)
    Dedup.appendMinhashIndex(spark, incDir, b, "doc_id", "text",
      maxBucket = 3L)
    Dedup.writeMinhashIndex(a.union(b), rebDir, "doc_id", "text",
      maxBucket = 3L)
    def keySet(d: String, sub: String, cols: Int) =
      spark.read.parquet(s"$d/$sub").collect()
        .map(r => (0 until cols).map(r.get).mkString("|")).toSet
    assert(keySet(incDir, "bands", 3) == keySet(rebDir, "bands", 3))
    assert(keySet(incDir, "dropped", 2) == keySet(rebDir, "dropped", 2))
    assert(keySet(incDir, "dropped", 2).nonEmpty,
      "the cap paths must actually fire in this fixture")
    // band keys for BOTH clone groups are gone from both indexes
    val bandDocs = spark.read.parquet(s"$incDir/bands")
      .select("doc").as[Long].collect().toSet
    assert(bandDocs == Set(20L, 21L))
    // probing equal indexes finds equal pairs: the pair doc hits both
    // sides, the dropped-bucket clone finds nothing (documented trade)
    def probePairs(d: String) =
      Dedup.nearDupsFromIndex(spark, d, probe, "doc_id", "text",
          threshold = 0.5, maxBucket = 3L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = probePairs(incDir)
    assert(inc == probePairs(rebDir))
    assert(inc.contains((20L, 30L)) && inc.contains((21L, 30L)))
    assert(!inc.exists { case (x, y) => x == 31L || y == 31L })
    Dedup.releaseCaches()
  }

  test("droppedAudit: a cap-saturated append grows the dropped ledger " +
      "and the rate readout fires") {
    import spark.implicits._
    def clones(ids: Range, text: String) = ids.map(i => (i.toLong, text))
    val a = (clones(10 to 11, "keen keen keen keen keen keen") ++
      Seq((20L, "alpha beta gamma delta epsilon zeta eta theta")))
      .toDF("doc_id", "text")
    val b = clones(12 to 13, "keen keen keen keen keen keen")
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mh_aud").toString
    Dedup.writeMinhashIndex(a, dir, "doc_id", "text", maxBucket = 3L)
    val before = Dedup.droppedAudit(spark, dir).collect().head
    assert(before.getLong(1) == 0L && before.getDouble(2) == 0.0,
      "nothing saturates at build in this fixture")
    assert(before.getLong(0) > 0L)
    // +2 clones push every 'keen' bucket to 4 > 3 — dropped grows
    Dedup.appendMinhashIndex(spark, dir, b, "doc_id", "text",
      maxBucket = 3L)
    val after = Dedup.droppedAudit(spark, dir).collect().head
    assert(after.getLong(1) > 0L, "the saturated append must fire")
    assert(after.getDouble(2) > 0.0 && after.getDouble(2) < 1.0)
    // a pre-`dropped` index (the appendMinhashIndex dropped0 class)
    // audits to zero instead of throwing path-not-found
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/dropped"), true)
    val legacy = Dedup.droppedAudit(spark, dir).collect().head
    assert(legacy.getLong(1) == 0L && legacy.getDouble(2) == 0.0)
    Dedup.releaseCaches()
  }

  test("lineDedup: first corpus occurrence survives per exact line, docs " +
      "reassemble in order, a fully-duplicated doc empties visibly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique one\nshared footer\nunique two"),
      (2L, "unique three\nshared footer"),
      // doc 3 = all lines seen before -> clean_text empty, all removed
      (3L, "shared footer\nunique one"),
      // in-doc repeat: second copy removed even inside one doc
      (4L, "twice\ntwice\nunique four")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ("unique one\nshared footer\nunique two", 3L, 0L))
    assert(out(2L) == ("unique three", 2L, 1L))
    assert(out(3L) == ("", 2L, 2L))
    assert(out(4L) == ("twice\nunique four", 3L, 1L))
    // the hash-key (default) and exact-string shuffle keys are the
    // same operator — key form must not change a single row
    val stringKeyed = Dedup.lineDedup(docs, hashKey = false).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(stringKeyed == out)
  }

  test("containmentPairs: a quoted snippet scores full containment in " +
      "one direction while its Jaccard stays low") {
    import spark.implicits._
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val snippet = "delta epsilon zeta eta theta"
    val docs = Seq((1L, snippet), (2L, long), (3L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
        threshold = 0.9, shingleSize = 3, maxDf = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("cont_a_in_b"), r.getAs[Double]("cont_b_in_a"))).toMap
    // snippet (3 shingles) fully inside long (18 shingles):
    // C(1→2) = 1.0, C(2→1) = 3/18; Jaccard = 3/18 would miss at 0.9
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == ((1.0, 0.166667)))
    val jaccard = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.9, shingleSize = 3, maxDf = 5L)
    assert(jaccard.isEmpty, "Jaccard at 0.9 must miss the nested pair")
    Dedup.releaseCaches()
  }

  test("connectedComponents collapses chained pairs into min-id clusters") {
    import spark.implicits._
    // chain 1-2-3 (transitive via 2), island 5-6, chain 10-11-12-13
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L), (11L, 12L),
      (12L, 13L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("connectedComponents result is independent of pair orientation/partitioning") {
    import spark.implicits._
    val pairs = Seq((3L, 2L), (1L, 2L), (9L, 4L)).toDF("doc_a", "doc_b")
    val a = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponents(pairs.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 9L -> 4L))
  }

  test("connectedComponents throws rather than return partial clusters") {
    import spark.implicits._
    // a 12-long chain cannot converge in 2 rounds of min propagation
    val chain = (0L until 12L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2)
    }
  }

  test("minhash and ngram agree on the high-similarity pairs") {
    val mh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ng = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.7, shingleSize = 3, maxDf = 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == ng)
  }

  test("portable (md5) simhash: exact dups at hamming 0; unrelated docs far apart") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text", portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L)) // exact dup → identical signature
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(0L), sigs(3L)) > 10) // unrelated → far
    assert(hamming(sigs(0L), sigs(2L)) < hamming(sigs(0L), sigs(3L)))
  }

  test("md5 simhash bit layout matches a from-scratch reference (oracle parity)") {
    // reference: top-64 md5 bits per token, +1/-1 votes per bit, sign
    def refSimhash(tokens: Seq[String]): Long = {
      val votes = new Array[Long](64)
      for (t <- tokens) {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        val h = (0 until 8).foldLeft(0L)((acc, b) => (acc << 8) | (d(b) & 0xFFL))
        for (j <- 0 until 64)
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
      }
      (0 until 64).foldLeft(0L)((sig, j) => if (votes(j) > 0) sig | (1L << j) else sig)
    }
    val rows = Dedup.simhashSignatures(docs, "doc_id", "text", portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- texts) {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      assert(rows(id) == refSimhash(toks), s"doc $id")
    }
  }

  test("releaseCaches reclaims internal caches; results stay valid after release") {
    Dedup.releaseCaches() // clean slate
    assert(Dedup.trackedCacheCount == 0)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.7, shingleSize = 3, maxDf = 10)
    val before = pairs.collect().toSet
    val cc = Dedup.connectedComponents(pairs)
    val labelsBefore = cc.collect().toSet
    assert(Dedup.trackedCacheCount > 0) // shingle arrays + cc labels tracked
    Dedup.releaseCaches()
    assert(Dedup.trackedCacheCount == 0)
    // post-release the plans recompute instead of erroring, same values
    assert(pairs.collect().toSet == before)
    assert(cc.collect().toSet == labelsBefore)
    Dedup.releaseCaches() // idempotent
  }

  test("noveltyCurve: hand-computed new-shingle yield per bucket") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), // shingles {a b, b c} — both new
      (1L, "a b d"), // {a b, b d} — only "b d" new
      (2L, "x y z"), // {x y, y z} — both new
      (3L, "a b c")  // exact dup — nothing new
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyCurve(docs, "doc_id", "text",
        shingleSize = 2, bucketSize = 2L)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_new"),
        r.getAs[Long]("cum_new")))
    assert(out.toSeq == Seq((0L, 3L, 3L), (1L, 2L, 5L)), s"got ${out.toSeq}")
  }

  test("weightedJaccardPairs: multiplicity-aware score where set " +
    "Jaccard saturates; threshold and blocking enforced") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana banana rareword"),
      (2L, "apple banana rareword rareword"),
      (3L, "totally different words here"),
      (4L, "apple zebra yak xylophone"))
      .toDF("doc_id", "text")
    val out = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
      threshold = 0.5, shingleSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("wjaccard")).toMap
    // identical token SETS but different multiplicities: Σmin 3,
    // Σmax 4+4−3=5 → 0.6 (set Jaccard would claim 1.0)
    assert(out == Map((1L, 2L) -> 0.6))
    // (1,4)/(2,4) share only 'apple': 1/7 — below threshold, filtered
    assert(!out.contains((1L, 4L)))
  }

  test("weightedJaccardPairs: trigram shingles catch a repeated shared " +
    "phrase with multiset weighting; repartition-invariant") {
    import spark.implicits._
    val phrase = "quick brown fox"
    val docs = Seq(
      (1L, s"$phrase $phrase jumps high"),    // phrase twice
      (2L, s"$phrase sleeps"),                // phrase once
      (3L, "wholly unrelated words entirely never overlap"))
      .toDF("doc_id", "text")
    val out = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
      threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("wjaccard")).toMap
    // doc1 grams (6): qbf, bfq(uick), fqb... includes 'quick brown fox'
    // ×2; doc2 grams (2): 'quick brown fox', 'brown fox sleeps'.
    // Σmin = 1 (the shared gram, min(2,1)); Σmax = 6 + 2 − 1 = 7
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == math.rint(1.0 / 7.0 * 1e6) / 1e6)
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.weightedJaccardPairs(d, "doc_id", "text", 0.1)
        .orderBy("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("detectorEval: hand-computed PRF1 matrix over synthetic pair sets") {
    import spark.implicits._
    val truth = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val perfect = truth
    val half = Seq((1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b") // recall .5
    val noisy = Seq((1L, 2L), (7L, 8L)).toDF("doc_a", "doc_b") // prec .5
    val out = Dedup.detectorEval(truth,
        Seq("perfect" -> perfect, "half" -> half, "noisy" -> noisy))
      .orderBy("detector").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("perfect").getAs[Long]("tp") == 4L)
    assert(out("perfect").getAs[Double]("f1") == 1.0)
    assert(out("half").getAs[Double]("recall") == 0.5)
    assert(out("half").getAs[Double]("precision") == 1.0)
    assert(out("noisy").getAs[Double]("precision") == 0.5)
    assert(out("noisy").getAs[Double]("recall") == 0.25)
    // f1 = 2pr/(p+r) from unrounded components
    assert(out("noisy").getAs[Double]("f1") ==
      math.rint(2.0 * 0.5 * 0.25 / 0.75 * 1e6) / 1e6)
  }

  test("keepBest: highest score survives per cluster (ties to lowest id), " +
    "singletons always survive") {
    import spark.implicits._
    // cluster 1 = {1, 2, 3}: 2 has the best score; cluster 10 = {10, 11}:
    // tie — lowest id 10 wins; 99 is in no cluster
    val scored = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0),
      (10L, 4.0), (11L, 4.0), (99L, 1.0)).toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc", "cluster")
    val out = Dedup.keepBest(scored, clusters).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false,
      10L -> true, 11L -> false, 99L -> true), out.toString)
  }

  test("keepBest: a null-scored member never survives over a scored one; " +
    "an all-null cluster falls back to lowest id") {
    import spark.implicits._
    // cluster 1 = {1 (null), 2 (0.5)}: 2 must win despite struct ordering
    // sorting nulls first; cluster 10 = {10 (null), 11 (null)}: lowest id
    val scored = Seq((1L, Option.empty[Double]), (2L, Some(0.5)),
      (10L, Option.empty[Double]), (11L, Option.empty[Double]))
      .toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc", "cluster")
    val out = Dedup.keepBest(scored, clusters).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 10L -> true, 11L -> false),
      out.toString)
  }

  test("keepBest: NaN scores rank as UNSCORED — a NaN member never beats " +
    "a scored one, and an all-NaN/null cluster falls back to lowest id") {
    import spark.implicits._
    // negated NaN is still NaN, which Spark's total order ranks ABOVE
    // +Infinity — without nanvl a NaN member would lose even to nulls
    // AND an (all-NaN, scored-last) cluster could invert; pin both
    val scored = Seq((1L, Double.NaN), (2L, -99.0),
      (10L, Double.NaN), (11L, Double.NaN)).toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc", "cluster")
    val out = Dedup.keepBest(scored, clusters).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 10L -> true, 11L -> false),
      out.toString)
  }

  test("preferencePairs: chosen/rejected under one total order, ties " +
      "break deterministically, unscored members never pair") {
    import spark.implicits._
    // cluster 1 = {1: 5.0, 2: 9.0, 3: 7.0} -> chosen 2, rejected 1
    // cluster 10 = {10, 11, 12} all 4.0 -> chosen 10 (lowest id),
    //   rejected 12 (highest id under the same order)
    // cluster 20 = {20: 3.0, 21: null} -> null drops; 20 pairs with
    //   itself? no — a one-SCORED-member cluster still emits (20, 20)?
    //   it must NOT: min == max there, chosen == rejected — assert the
    //   caller-visible contract instead: the row exists with margin 0
    //   and equal ids, a degenerate pair the consumer filters on margin
    val scored = Seq((1L, Some(5.0)), (2L, Some(9.0)), (3L, Some(7.0)),
      (10L, Some(4.0)), (11L, Some(4.0)), (12L, Some(4.0)),
      (20L, Some(3.0)), (21L, None: Option[Double]))
      .toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L))
      .toDF("doc", "cluster")
    val out = Dedup.preferencePairs(scored, clusters).orderBy("cluster")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(out(0) === ((1L, 3L, 2L, 1L, 9.0, 5.0, 4.0)))
    assert(out(1) === ((10L, 3L, 10L, 12L, 4.0, 4.0, 0.0)))
    // the null member dropped: n_members counts SCORED members only
    assert(out(2) === ((20L, 1L, 20L, 20L, 3.0, 3.0, 0.0)))
  }

  test("lshCalibration: hand-computed S-curve at b=2 bands, r=2 rows") {
    val out = Dedup.lshCalibration(spark, numHashes = 4, rowsPerBand = 2,
        sPoints = Seq(0.0, 0.5, 1.0))
      .orderBy("s").collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // s=0.5: 1 − (1 − 0.25)² = 0.4375; threshold = (1/2)^(1/2)
    assert(out(0.0) == ((2L, 2L, 0.0, 0.707107)))
    assert(out(0.5) == ((2L, 2L, 0.4375, 0.707107)))
    assert(out(1.0) == ((2L, 2L, 1.0, 0.707107)))
  }

  test("lshCalibration rejects bad inputs") {
    intercept[IllegalArgumentException] {
      Dedup.lshCalibration(spark, 5, 2, Seq(0.5)) } // 5 % 2 != 0
    intercept[IllegalArgumentException] {
      Dedup.lshCalibration(spark, 4, 2, Seq(1.5)) } // out of [0,1]
    intercept[IllegalArgumentException] {
      Dedup.lshCalibration(spark, 4, 2, Seq(0.5, 0.5)) } // duplicate
  }
}
