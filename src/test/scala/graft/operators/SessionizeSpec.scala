package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpecBase {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private lazy val events = {
    import spark.implicits._
    Seq(
      (0L, 1L, ts(0), 1.0), (1L, 1L, ts(10), 2.0),   // user 1 session 0
      (2L, 1L, ts(50), 3.0),                          // gap 40 > 30 → session 1
      (3L, 2L, ts(5), 4.0)                            // user 2 session 0
    ).toDF("event_id", "user_id", "ts", "value")
  }

  test("gap splits sessions per user") {
    val out = Sessionize.assignSessions(events, gapMinutes = 30)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 0L))
  }

  test("session stats: counts, span, exact sums") {
    val out = Sessionize.sessionStats(events, gapMinutes = 30)
      .where(col("user_id") === 1 && col("session_id") === 0).head()
    assert(out.getAs[Long]("n_events") == 2L)
    assert(out.getAs[Long]("duration_us") == 10L * 60 * 1000000)
    assert(out.getAs[Double]("sum_value") == 3.0)
  }

  test("transcripts stitch text in (ts, tiebreak) order per session") {
    import spark.implicits._
    val tagged = Seq(
      (0L, 1L, ts(0), "open"), (1L, 1L, ts(10), "click"),
      (2L, 1L, ts(50), "buy"),                 // new session after gap
      (4L, 2L, ts(5), "b"), (3L, 2L, ts(5), "a") // same ts → event_id order
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessionize.sessionTranscripts(tagged, gapMinutes = 30,
        textCol = "event_type")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_id")) -> r.getAs[String]("transcript")).toMap
    assert(out == Map(
      (1L, 0L) -> "open click", (1L, 1L) -> "buy",
      (2L, 0L) -> "a b"))
  }

  test("batch session_window agrees with gaps-and-islands on real events") {
    val ev = Tables.events(spark, sf())
    val islands = Sessionize.sessionStats(ev, gapMinutes = 30)
      .select(col("user_id"), col("start_us"),
        (col("end_us") + 30L * 60 * 1000000).as("end_us"), col("n_events"))
    val sw = ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"), col("n_events"))
    assert(islands.exceptAll(sw).isEmpty && sw.exceptAll(islands).isEmpty)
  }
}
