package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSessionizeSpec extends SparkSpecBase {

  import StreamingSessionize._

  // offset from epoch 0: rows at exactly the initial watermark (0) are
  // dropped as late by stateful operators
  private def ts(min: Long) = new Timestamp((min + 100) * 60000L)

  test("session_window stream emits closed sessions after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val stats = sessionWindowStats(input.toDF(), gapMinutes = 30,
      watermarkDelay = "0 minutes")
    val query = stats.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    try {
      input.addData(SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(10), 2.0))
      query.processAllAvailable()
      // advance watermark far past the first session's end
      input.addData(SessionEvent(1L, ts(120), 5.0))
      query.processAllAvailable()
      val rows = spark.table("sess_out").collect()
      assert(rows.length == 1, s"expected one closed session, got ${rows.toSeq}")
      val r = rows(0)
      assert(r.getAs[Long]("n_events") == 2L)
      assert(r.getAs[Double]("sum_value") == 3.0)
    } finally query.stop()
  }

  test("flatMapGroupsWithState closes sessions on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = statefulSessionize(input.toDS(), gapMinutes = 30,
      watermarkDelay = "0 minutes")
    val query = out.writeStream.format("memory")
      .queryName("stateful_out").outputMode("append").start()
    try {
      input.addData(SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(10), 2.0))
      query.processAllAvailable()
      input.addData(SessionEvent(1L, ts(120), 5.0))
      query.processAllAvailable()
      input.addData(SessionEvent(2L, ts(500), 0.0)) // push watermark further
      query.processAllAvailable()
      val rows = spark.table("stateful_out").collect()
      assert(rows.exists(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Long]("n_events") == 2L && r.getAs[Double]("sum_value") == 3.0),
        s"got ${rows.toSeq}")
    } finally query.stop()
  }
}
