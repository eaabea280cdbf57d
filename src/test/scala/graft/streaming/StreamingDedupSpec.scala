package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Behavioral contract of the streaming dedup surface
  * ([[StreamingAgg.dedupedStream]] / [[StreamingAgg.duplicateRate]]):
  * cross-batch redelivery collapse, watermark state eviction (the
  * re-admission semantics), and the dup-rate monitor's chained
  * stateful aggregation.
  */
class StreamingDedupSpec extends SparkSpecBase {

  private case class Rec(event_id: Long, ts: Timestamp, payload: String)
  private def ts(min: Long) = new Timestamp((min + 100) * 60000L)

  test("windowed dedup collapses redeliveries across batches, keeps first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Rec]
    val out = StreamingAgg.dedupedStream(input.toDF(), Seq("event_id"),
      watermarkDelay = "30 minutes")
    val query = out.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        Rec(1L, ts(1), "first"), Rec(1L, ts(2), "retry"),
        Rec(2L, ts(3), "only"))
      query.processAllAvailable()
      // a redelivery in a LATER batch, still within the watermark delay
      input.addData(Rec(1L, ts(10), "late-retry"))
      query.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("payload"))
      assert(rows.toSeq.sorted == Seq(1L -> "first", 2L -> "only"),
        s"got ${rows.toSeq.sorted}")
    } finally query.stop()
  }

  test("after the watermark passes, the same key is admitted again") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Rec]
    val out = StreamingAgg.dedupedStream(input.toDF(), Seq("event_id"),
      watermarkDelay = "5 minutes")
    val query = out.writeStream.format("memory")
      .queryName("dedup_out2").outputMode("append").start()
    try {
      input.addData(Rec(7L, ts(1), "v1"))
      query.processAllAvailable()
      // advance the watermark far past key 7's state lifetime...
      input.addData(Rec(8L, ts(60), "advance"))
      query.processAllAvailable()
      // ...then the same id arrives again: its state was evicted, so it
      // is a NEW record to the operator (the windowed-dedup contract —
      // the terminal batch Dedup.exact pass owns horizon-crossing dups)
      input.addData(Rec(7L, ts(61), "v2"))
      query.processAllAvailable()
      val sevens = spark.table("dedup_out2").collect()
        .filter(_.getAs[Long]("event_id") == 7L).map(_.getAs[String]("payload"))
      assert(sevens.sorted.toSeq == Seq("v1", "v2"), s"got ${sevens.toSeq}")
    } finally query.stop()
  }

  test("duplicateRate reports per-window arrival vs distinct counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Rec]
    val out = StreamingAgg.duplicateRate(input.toDF(), Seq("event_id"),
      "ts", windowLength = "10 minutes", watermarkDelay = "0 minutes")
    val query = out.writeStream.format("memory")
      .queryName("dup_rate_out").outputMode("append").start()
    try {
      input.addData(
        Rec(1L, ts(1), "a"), Rec(1L, ts(2), "a-retry"),
        Rec(2L, ts(3), "b"), Rec(3L, ts(12), "c"))
      query.processAllAvailable()
      input.addData(Rec(9L, ts(100), "advance"))
      query.processAllAvailable()
      val rows = spark.table("dup_rate_out").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime / 60000L ->
          (r.getAs[Long]("n_arrivals"), r.getAs[Long]("n_distinct"),
            r.getAs[Double]("dup_rate"))).toMap
      assert(rows(100L) == ((3L, 2L, 0.333333)), s"got $rows")
      assert(rows(110L) == ((1L, 1L, 0.0)), s"got $rows")
    } finally query.stop()
  }
}
