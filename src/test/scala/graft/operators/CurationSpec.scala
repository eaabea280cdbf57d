package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {

  import spark.implicits._

  // 20 distinct filler tokens so jaccard/8-gram machinery has material
  private def prose(seed: Int): String =
    (0 until 25).map(i => s"tok${seed}x$i").mkString(" ")

  private val cfg = Curation.Config(
    minTokens = 20, minAlphaRatio = 0.0, maxDup2gramRatio = 0.3,
    jaccardThreshold = 0.5, shingleSize = 3, maxDf = 10L,
    deconShingleSize = 8,
    // every doc becomes train: decon tested separately below
    trainFraction = 1.0, valFraction = 0.0,
    mixFractions = Map.empty, mixDefaultFraction = 1.0)

  private def docsOf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "source")

  test("each stage drops exactly its own kind of document") {
    val nearA = prose(1)
    val nearB = prose(1).replace("tok1x0", "zzz") // jaccard >> 0.5 vs nearA
    val docs = docsOf(
      (1L, "too short", "s"),                       // s1: under minTokens
      (2L, ("rep rep " * 20).trim, "s"),            // s1: dup 2-grams
      (3L, prose(7), "s"),
      (4L, prose(7), "s"),                          // s2: exact dup of 3
      (5L, nearA, "s"),
      (6L, nearB, "s"),                             // s3: near dup of 5
      (7L, prose(9), "s"))
    val byStage = Curation.stages(docs, cfg).toMap
    def ids(name: String) = byStage(name).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids("s1_quality") == Set(3L, 4L, 5L, 6L, 7L))
    assert(ids("s2_exact_dedup") == Set(3L, 5L, 6L, 7L), "min id survives exact dup")
    assert(ids("s3_near_dedup") == Set(3L, 5L, 7L), "min id survives the near-dup cluster")
    assert(ids("s4_decontaminated") == Set(3L, 5L, 7L), "trainFraction 1.0 → no eval, no drop")
    assert(ids("s5_mixed") == Set(3L, 5L, 7L), "fraction 1.0 keeps everything")
  }

  test("disposition: every doc reports the FIRST stage that dropped it") {
    val nearA = prose(1)
    val nearB = prose(1).replace("tok1x0", "zzz")
    val docs = docsOf(
      (1L, "too short", "s"),
      (2L, ("rep rep " * 20).trim, "s"),
      (3L, prose(7), "s"),
      (4L, prose(7), "s"),       // exact dup of 3 → s2 exit
      (5L, nearA, "s"),
      (6L, nearB, "s"),          // near dup of 5 → s3 exit
      (7L, prose(9), "s"))
    val out = Curation.dispositionLedger(docs, cfg)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "s1_quality", 2L -> "s1_quality",
      3L -> "kept", 4L -> "s2_exact_dedup",
      5L -> "kept", 6L -> "s3_near_dedup", 7L -> "kept"))
    // generic over any named survivor chain, not just Curation's
    val chain = Seq(
      "in" -> docsOf((1L, "a", "s"), (2L, "b", "s")),
      "only1" -> docsOf((1L, "a", "s")))
    val small = Curation.disposition(chain)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == Map(1L -> "kept", 2L -> "only1"))
  }

  test("decontamination drops the train doc sharing an 8-gram with eval") {
    // choose ids whose md5 split lands one in train, one in test, for
    // the 0.8/0.1 split — derive from the split itself so the test
    // cannot rot if ids change
    val base = (1L to 40L).map(i => (i, prose(100 + i.toInt), "s"))
    val labeled = Sampling.deterministicSplit(docsOf(base: _*), "doc_id", 0.8, 0.1)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainId = labeled.collectFirst { case (id, "train") => id }.get
    val testId = labeled.collectFirst { case (id, "test") => id }.get
    // the contaminated pair shares EXACTLY one 8-token run: the train
    // doc starts with it, the eval doc ends with it, everything else
    // differs — 3-gram jaccard ≈ 0.15 stays far below the near-dup
    // threshold, so the doc must survive s3 and drop at s4 (an earlier
    // version of this spec reused near-identical texts and the near-dup
    // stage removed the doc before decontamination was ever exercised)
    val run = (0 until 8).map(i => s"tok777x$i").mkString(" ")
    val trainText = run + " " + (8 until 25).map(i => s"tok777x$i").mkString(" ")
    val testText = (0 until 17).map(i => s"tok888x$i").mkString(" ") + " " + run
    val docs = docsOf(base.map {
      case (id, _, s) if id == trainId => (id, trainText, s)
      case (id, _, s) if id == testId => (id, testText, s)
      case r => r
    }: _*)
    val byStage = Curation.stages(docs,
      cfg.copy(trainFraction = 0.8, valFraction = 0.1)).toMap
    val s3 = byStage("s3_near_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s3.contains(trainId),
      "precondition: the contaminated doc must REACH decontamination")
    assert(s3.contains(testId))
    val s4 = byStage("s4_decontaminated").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!s4.contains(trainId), "contaminated train doc must drop AT s4")
    assert(!s4.contains(testId), "eval docs are never part of the train set")
    val trainIds = labeled.collect { case (id, "train") => id }.toSet
    assert(s4.subsetOf(trainIds - trainId))
    Curation.unpersist(byStage.toSeq)
  }

  test("report emits one non-increasing count per stage, in order") {
    val docs = docsOf((1L to 30L).map(i => (i, prose(i.toInt), s"s${i % 3}")): _*)
    val rows = Curation.report(docs, cfg).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(rows.map(_._1).toSeq == Seq("s0_input", "s1_quality",
      "s2_exact_dedup", "s3_near_dedup", "s4_decontaminated", "s5_mixed"))
    assert(rows.head._2 == 30L)
    rows.map(_._2).sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("export: manifest preserves content, respects the budget, balances shards") {
    val docs = (1L to 60L).map(i => (i, prose(i.toInt), "src0"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    val manifest = Curation.export(docs, dir, numShards = 4, budget = 60L)
      .collect()
    assert(manifest.length == 4, "every shard must appear in the manifest")
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == 60L)
    // each doc is 25 tokens → ≤ 2 per 60-token sequence; budget law holds
    assert(manifest.forall(_.getAs[Long]("max_seq_tokens") <= 60L))
    // additive checksum: Σ per-shard == the whole-input fingerprint
    // (content preserved THROUGH the write — the export's entire point)
    val total = Fingerprint.datasetFingerprint(docs, Seq("doc_id", "text"))
      .collect().head.getDecimal(1)
    val summed = manifest.map(r => BigDecimal(r.getAs[String]("checksum")))
      .sum
    assert(summed == BigDecimal(total),
      s"checksums lost content: $summed != $total")
    // hive layout: one shard=N directory per shard
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq == (0 until 4).map(s => s"shard=$s"))
    // re-reading one shard's directory yields exactly that shard's docs
    val shard0 = spark.read.parquet(s"$dir/shard=0").count()
    assert(shard0 == manifest.find(_.getAs[Int]("shard") == 0).get
      .getAs[Long]("n_docs"))
  }

  test("reportCard: hand-computed sizes, dup rate, concentration, blanks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "en", "a b c"),
      (2L, "srcA", "en", "a b c"),     // exact dup of 1
      (3L, "srcA", "de", "d e"),
      (4L, "srcB", "en", "f"),
      (5L, "srcB", "en", null.asInstanceOf[String]),
      (6L, "srcB", "en", "   ")
    ).toDF("doc_id", "source", "lang", "text")
    val r = Curation.reportCard(docs).collect().head
    assert(r.getLong(0) === 4L)   // n_docs (live)
    assert(r.getLong(1) === 2L)   // n_sources
    assert(r.getLong(2) === 2L)   // n_langs
    assert(r.getLong(3) === 9L)   // total_tokens 3+3+2+1
    assert(r.getLong(5) === 1L && r.getLong(6) === 3L) // min/max tokens
    assert(r.getDouble(7) === 2.25)      // mean tokens 9/4
    assert(r.getDouble(8) === 0.25)      // dup rate: 3 distinct of 4
    assert(r.getDouble(9) === 0.75)      // srcA carries 3 of 4
    assert(r.getLong(10) === 2L)         // null + blank
  }
}
