package graft.streaming

import graft.SparkSpecBase
import graft.operators.LogReg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// top-level so Spark's encoder needs no outer-scope instance
private[streaming] case class SqfDoc(doc_id: Long, x: Double, z: Double,
                                     label: Option[Int])

/** Behavioral contract of the streaming quality filter: a batch-trained
  * model applied to a stream scores BIT-IDENTICALLY to the batch
  * scorer, the keep-filter gates on the threshold, and null-feature
  * rows drop instead of passing unscored.
  */
class StreamingQualityFilterSpec extends SparkSpecBase {

  private type Doc = SqfDoc
  private def Doc(id: Long, x: Double, z: Double, label: Option[Int]) =
    SqfDoc(id, x, z, label)

  private def corpus = (1 to 40).map { i =>
    val x = if (i % 2 == 0) 1.0 + i / 40.0 else -1.0 - i / 40.0
    Doc(i.toLong, x, i / 10.0, Some(if (x > 0) 1 else 0))
  }

  test("streaming scores equal the batch scorer's row for row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = corpus.toDF()
    val model = LogReg.fitModel(batch, "label", Seq("x", "z"),
      iterations = 10, lr = 1.0)
    val expected = LogReg.trainAndScore(batch, "label", Seq("x", "z"),
        iterations = 10, lr = 1.0)
      .select("doc_id", "p_quality", "pred_quality").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val input = MemoryStream[Doc]
    val query = StreamingQualityFilter.score(input.toDF(), model)
      .writeStream.format("memory").queryName("sqf_out")
      .outputMode("append").start()
    try {
      input.addData(corpus.take(25): _*)
      query.processAllAvailable()
      input.addData(corpus.drop(25): _*) // a later batch scores the same
      query.processAllAvailable()
      val got = spark.table("sqf_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("p_quality"), r.getAs[Boolean]("pred_quality")))
        .toMap
      assert(got == expected, "streaming scores diverge from batch")
    } finally query.stop()
  }

  test("keep() gates on the threshold; null-feature rows never pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val model = LogReg.fitModel(corpus.toDF(), "label", Seq("x"),
      iterations = 10, lr = 1.0)
    val input = MemoryStream[(Long, Option[Double])]
    val stream = input.toDF().toDF("doc_id", "x")
    val query = StreamingQualityFilter.keep(stream, model, threshold = 0.5)
      .writeStream.format("memory").queryName("sqf_keep")
      .outputMode("append").start()
    try {
      input.addData((1L, Some(2.0)), (2L, Some(-2.0)), (3L, None))
      query.processAllAvailable()
      val kept = spark.table("sqf_keep").collect().map(_.getAs[Long]("doc_id"))
      assert(kept.toSeq == Seq(1L), s"kept ${kept.toSeq}")
      val p = spark.table("sqf_keep").select("p_quality").head().getDouble(0)
      assert(p > 0.5)
    } finally query.stop()
  }
}
