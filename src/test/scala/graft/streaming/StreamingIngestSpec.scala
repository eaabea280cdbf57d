package graft.streaming

import graft.SparkSpecBase
import graft.operators.{Dedup, LogReg}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class IngDoc(doc_id: Long, text: String, len_score: Double)

class StreamingIngestSpec extends SparkSpecBase {

  private val tA = "alpha beta gamma delta epsilon zeta eta theta"
  private val tB = "alpha beta gamma delta epsilon zeta eta iota"
  private val evalText =
    "ev1 ev2 ev3 ev4 ev5 ev6 ev7 ev8 ev9 ev10"
  private val novel = "hart fox wolf lynx bear ibex orca crane"

  test("the assembled ingest pipeline applies quality -> decon -> " +
      "near-dup in order: a low-quality dup never reaches the index, " +
      "a contaminated doc is stopped, survivors pair and append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ing").toString
    Dedup.writeMinhashIndex(Seq((10L, tA)).toDF("doc_id", "text"),
      dir, "doc_id", "text")
    // p = sigma(5 * len_score): +1 -> 0.993 keep, -1 -> 0.007 drop
    val model = LogReg.Model(Seq("len_score"), Seq((0.0, 1.0)),
      Array(0.0, 5.0))
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val input = MemoryStream[IngDoc]
    val q = StreamingIngest.pipeline(input.toDF(), model, evalDocs, dir,
      (pairs, batchId) => got(batchId) =
        pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    try {
      input.addData(
        IngDoc(1L, tB, 1.0),                      // survives, pairs w/ seed
        IngDoc(2L, tB, -1.0),                     // QUALITY-dropped dup
        IngDoc(3L, evalText + " tail words", 1.0), // DECON-dropped
        IngDoc(4L, novel, 1.0))                   // survives, novel
      q.processAllAvailable()
      assert(got(0L) == Set((1L, 10L)) || got(0L) == Set((10L, 1L)))
      input.addData(
        IngDoc(5L, novel, 1.0), // pairs with the APPENDED batch-0 doc 4
        IngDoc(6L, tB, 1.0))    // pairs with seed and doc 1 — NEVER doc 2
      q.processAllAvailable()
      assert(got(1L) == Set((4L, 5L), (6L, 10L), (1L, 6L)) ||
        got(1L) == Set((4L, 5L), (10L, 6L), (1L, 6L)))
      assert(!got(1L).exists { case (a, b) => a == 2L || b == 2L },
        "the quality-dropped doc must never have entered the index")
      assert(!got.values.flatten.exists { case (a, b) =>
        a == 3L || b == 3L },
        "the contaminated doc must never have entered the index")
    } finally q.stop()
    Dedup.releaseCaches()
  }

  test("the ledgered pipeline accounts for EVERY arriving doc with the " +
      "batch disposition's stage labels, and the stream ledger equals " +
      "Curation.disposition over the same stage frames") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, coalesce}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingled").toString
    Dedup.writeMinhashIndex(Seq((10L, tA)).toDF("doc_id", "text"),
      dir, "doc_id", "text")
    val model = LogReg.Model(Seq("len_score"), Seq((0.0, 1.0)),
      Array(0.0, 5.0))
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val ledger = scala.collection.mutable.Map.empty[Long, String]
    val input = MemoryStream[IngDoc]
    val q = StreamingIngest.pipeline(input.toDF(), model, evalDocs, dir,
      (pairs, _) => { pairs.collect(); () },
      onLedger = Some((led, _) => led.collect().foreach(r =>
        ledger(r.getLong(0)) = r.getString(1))))
    val arriving = Seq(
      IngDoc(1L, tB, 1.0),                       // kept
      IngDoc(2L, tB, -1.0),                      // s1_quality
      IngDoc(3L, evalText + " tail words", 1.0), // s2_decontaminated
      IngDoc(4L, novel, 1.0))                    // kept
    try {
      input.addData(arriving.take(2))
      q.processAllAvailable()
      input.addData(arriving.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    assert(ledger == Map(1L -> "kept", 2L -> "s1_quality",
      3L -> "s2_decontaminated", 4L -> "kept"),
      "every arriving doc gets exactly one disposition row")
    // the batch twin over the SAME policy frames — row-for-row equal
    val arr = arriving.toDF()
    val bq = arr.filter(coalesce(model.probability >= 0.5, lit(false)))
    val cont = graft.operators.Decontamination.contaminationPairs(
        bq.select(col("doc_id"), col("text")), evalDocs,
        "doc_id", "text", shingleSize = 8)
      .select(col("train_doc").as("doc_id")).distinct()
    val surv = bq.join(cont, Seq("doc_id"), "left_anti")
    val batchLedger = graft.operators.Curation.disposition(Seq(
        ("input", arr), ("s1_quality", bq), ("s2_decontaminated", surv)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batchLedger == ledger.toMap,
      "stream ledger must equal the batch disposition")
    Dedup.releaseCaches()
  }
}
