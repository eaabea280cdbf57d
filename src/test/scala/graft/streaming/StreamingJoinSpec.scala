package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// top-level so the encoder constructs them without an outer pointer
// (inner case classes force interpreter-mode deserializers)
private[streaming] case class JoinP(user_id: Long, ts: Timestamp, amount: Double)
private[streaming] case class JoinS(user_id: Long, ts: Timestamp, campaign: String)

class StreamingJoinSpec extends SparkSpecBase {

  private def ts(min: Long) = new Timestamp((min + 100) * 60000L)

  test("stream-stream join pairs each purchase with in-lookback signups only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[JoinP]
    val signups = MemoryStream[JoinS]
    val out = StreamingJoin.joinWithin(purchases.toDF(), signups.toDF(),
      keyCol = "user_id", lookback = "30 minutes",
      watermarkDelay = "0 minutes", payloadCols = Seq("campaign"))
    val query = out.writeStream.format("memory")
      .queryName("ssjoin_out").outputMode("append").start()
    try {
      signups.addData(JoinS(1L, ts(0), "ad_a"), JoinS(2L, ts(0), "ad_b"),
        JoinS(1L, ts(90), "ad_late"))
      purchases.addData(JoinP(1L, ts(20), 9.0), // 20 min after ad_a: in window
        JoinP(2L, ts(45), 5.0),                 // 45 min after ad_b: outside
        JoinP(1L, ts(100), 7.0))                // 10 min after ad_late: in
      query.processAllAvailable()
      val rows = spark.table("ssjoin_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("amount"),
          r.getAs[String]("r_campaign"))).toSet
      assert(rows == Set((1L, 9.0, "ad_a"), (1L, 7.0, "ad_late")), rows.toString)
    } finally query.stop()
  }

  test("a purchase matching two in-window signups emits both pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[JoinP]
    val signups = MemoryStream[JoinS]
    val out = StreamingJoin.joinWithin(purchases.toDF(), signups.toDF(),
      keyCol = "user_id", lookback = "60 minutes",
      watermarkDelay = "0 minutes", payloadCols = Seq("campaign"))
    val query = out.writeStream.format("memory")
      .queryName("ssjoin_multi").outputMode("append").start()
    try {
      signups.addData(JoinS(7L, ts(0), "one"), JoinS(7L, ts(30), "two"))
      purchases.addData(JoinP(7L, ts(40), 1.0))
      query.processAllAvailable()
      val got = spark.table("ssjoin_multi").collect()
        .map(_.getAs[String]("r_campaign")).sorted.toSeq
      assert(got == Seq("one", "two"), got.toString)
    } finally query.stop()
  }
}
