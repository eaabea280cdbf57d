package graft.streaming

import graft.SparkSpecBase
import graft.operators.Decontamination
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SdcDoc(doc_id: Long, text: String)

class StreamingDeconSpec extends SparkSpecBase {

  private val evalText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  // shares the eval's first 8-gram verbatim
  private val leaky =
    "alpha beta gamma delta epsilon zeta eta theta totally new tail"
  private val clean = "one two three four five six seven eight nine ten"
  private val short3 = "too short here"

  test("streaming flags equal the batch contamination verdicts; short " +
      "docs pass; the gating form drops exactly the contaminated rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val input = MemoryStream[SdcDoc]
    val flagged = StreamingDecon.flag(input.toDF(), evalDocs)
    val q = flagged.writeStream.format("memory").queryName("sdc_flags")
      .outputMode("append").start()
    try {
      input.addData(SdcDoc(1L, leaky), SdcDoc(2L, clean), SdcDoc(3L, short3))
      q.processAllAvailable()
      val got = spark.table("sdc_flags").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_shared"), r.getAs[Boolean]("contaminated")))
        .toMap
      assert(got(1L)._2 && got(1L)._1 >= 1L)
      assert(got(2L) == (0L, false) && got(3L) == (0L, false))
      // batch ground truth: same pairs operator the audit queries gate
      val batchHits = Decontamination.contaminationPairs(
          Seq((1L, leaky), (2L, clean), (3L, short3)).toDF("doc_id", "text"),
          evalDocs)
        .select(col("train_doc")).as[Long].collect().toSet
      assert(got.filter(_._2._2).keySet == batchHits)
    } finally q.stop()
    // gating form: only the clean docs survive
    val input2 = MemoryStream[SdcDoc]
    val q2 = StreamingDecon.keep(input2.toDF(), evalDocs)
      .writeStream.format("memory").queryName("sdc_keep")
      .outputMode("append").start()
    try {
      input2.addData(SdcDoc(1L, leaky), SdcDoc(2L, clean), SdcDoc(3L, short3))
      q2.processAllAvailable()
      val kept = spark.table("sdc_keep").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(2L, 3L))
    } finally q2.stop()
  }

  test("null-text docs pass like shingle-less docs (batch-policy parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val input = MemoryStream[SdcDoc]
    val q = StreamingDecon.flag(input.toDF(), evalDocs)
      .writeStream.format("memory").queryName("sdc_null")
      .outputMode("append").start()
    try {
      input.addData(SdcDoc(1L, null), SdcDoc(2L, leaky))
      q.processAllAvailable()
      val got = spark.table("sdc_null").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_shared"), r.getAs[Boolean]("contaminated")))
        .toMap
      // pre-fix, the null row's n_shared/contaminated were NULL and
      // keep()'s !contaminated filter silently dropped it
      assert(got(1L) == (0L, false))
      assert(got(2L)._2)
    } finally q.stop()
  }
}
