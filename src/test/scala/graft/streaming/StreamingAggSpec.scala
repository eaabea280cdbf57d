package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

class StreamingAggSpec extends SparkSpecBase {

  private case class Ev(user_id: Long, ts: Timestamp, value: Double)
  // offset from epoch 0: rows at exactly the initial watermark are late
  private def ts(min: Long) = new Timestamp((min + 100) * 60000L)

  test("tumbling window stats emit after the watermark passes the window end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingAgg.windowedStats(input.toDF(), windowLength = "10 minutes",
      watermarkDelay = "0 minutes")
    val query = out.writeStream.format("memory")
      .queryName("win_out").outputMode("append").start()
    try {
      input.addData(Ev(1L, ts(1), 1.0), Ev(2L, ts(5), 2.0), Ev(1L, ts(12), 4.0))
      query.processAllAvailable()
      input.addData(Ev(1L, ts(100), 0.0)) // advance watermark
      query.processAllAvailable()
      val rows = spark.table("win_out").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime / 60000L ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
      assert(rows(100L) == ((2L, 3.0)), s"first window: $rows")
      assert(rows(110L) == ((1L, 4.0)), s"second window: $rows")
    } finally query.stop()
  }

  test("sliding windows assign an event to every overlapping window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingAgg.windowedStats(input.toDF(), windowLength = "10 minutes",
      slide = Some("5 minutes"), watermarkDelay = "0 minutes")
    val query = out.writeStream.format("memory")
      .queryName("slide_out").outputMode("append").start()
    try {
      input.addData(Ev(1L, ts(7), 1.0))
      query.processAllAvailable()
      input.addData(Ev(1L, ts(100), 0.0))
      query.processAllAvailable()
      // event at minute 107 falls in windows [100,110) and [105,115)
      val starts = spark.table("slide_out").collect()
        .map(_.getAs[Timestamp]("window_start").getTime / 60000L).sorted.toSeq
      assert(starts == Seq(100L, 105L), starts.toString)
    } finally query.stop()
  }

  test("dedupedAgainstCorpus anti-joins streamed keys with the static set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val known = Seq(2L, 3L).toDF("user_id")
    val out = StreamingAgg.dedupedAgainstCorpus(input.toDF(), known, "user_id")
    val query = out.writeStream.format("memory")
      .queryName("corpus_dedup_out").outputMode("append").start()
    try {
      input.addData(Ev(1L, ts(0), 1.0), Ev(2L, ts(1), 2.0), Ev(3L, ts(2), 3.0),
        Ev(4L, ts(3), 4.0))
      query.processAllAvailable()
      val users = spark.table("corpus_dedup_out").collect()
        .map(_.getAs[Long]("user_id")).sorted.toSeq
      assert(users == Seq(1L, 4L), users.toString)
    } finally query.stop()
  }

  test("dedupedStream drops re-delivered keys within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingAgg.dedupedStream(input.toDF(), keys = Seq("user_id"),
      watermarkDelay = "30 minutes")
    val query = out.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(1), 2.0), Ev(2L, ts(2), 3.0))
      query.processAllAvailable()
      input.addData(Ev(1L, ts(3), 4.0)) // re-delivery within horizon
      query.processAllAvailable()
      val users = spark.table("dedup_out").collect()
        .map(_.getAs[Long]("user_id")).sorted.toSeq
      assert(users == Seq(1L, 2L), users.toString)
    } finally query.stop()
  }

  test("distinctPerWindow: exact small-window estimates, collapsing ratio " +
    "flags the flood, sketches union downstream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingAgg.distinctPerWindow(input.toDF(), "user_id",
      windowLength = "10 minutes", watermarkDelay = "0 minutes")
    val query = out.writeStream.format("memory")
      .queryName("dist_out").outputMode("append").start()
    try {
      // window 1: 10 events from 10 distinct users — ratio 1.0
      input.addData((1 to 10).map(i => Ev(i.toLong, ts(i % 9), 0.0)): _*)
      // window 2: 10 events all from ONE user — the flood, ratio 0.1
      input.addData((1 to 10).map(i => Ev(77L, ts(10 + i % 9), 0.0)): _*)
      input.addData(Ev(0L, ts(100), 0.0)) // advance the watermark
      query.processAllAvailable()
      val rows = spark.table("dist_out").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime / 60000L - 100 ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("n_distinct"),
            r.getAs[Double]("distinct_ratio"))).toMap
      // HLL is exact at these cardinalities
      assert(rows(0L) == ((10L, 10L, 1.0)), s"$rows")
      assert(rows(10L) == ((10L, 1L, 0.1)), s"$rows")
      // the emitted sketches merge downstream: union distinct = 11
      val merged = graft.operators.Sketches.mergeSketches(
        spark.table("dist_out").filter(col("window_start") < ts(50)))
        .collect().head.getAs[Long]("estimate")
      assert(merged == 11L, s"register union off: $merged")
    } finally query.stop()
  }
}
