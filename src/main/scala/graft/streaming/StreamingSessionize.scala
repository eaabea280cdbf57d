package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming sessionization — the continuous counterpart of
  * [[graft.operators.Sessionize]]. Two variants:
  *
  *  1. `sessionWindowStats`: declarative `session_window(ts, gap)` +
  *     watermark — Spark manages the session state store; this is the
  *     preferred form (Catalyst plans it, AQE-independent, state eviction
  *     driven by the watermark).
  *  2. `statefulSessionize`: explicit `flatMapGroupsWithState` with
  *     event-time timeout — the template for custom per-key state that
  *     `session_window` can't express (e.g. session-scoped dedup sets).
  *
  * Both read any streaming source (`readStream` file/kafka/memory); state
  * is partitioned by user key, so a 1000-executor cluster shards the state
  * store horizontally — no single-node session table.
  */
object StreamingSessionize {

  /** Declarative session windows: per (user, session window) event counts
    * and value sums, emitted once the watermark passes the session end.
    */
  def sessionWindowStats(events: DataFrame, gapMinutes: Long,
                         watermarkDelay: String = "10 minutes",
                         userCol: String = "user_id",
                         tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(userCol), session_window(col(tsCol), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long, sum_value: Double)

  /** Custom stateful sessionization: per-user open-session state, closed
    * (emitted) when the gap elapses via event-time timeout. Demonstrates
    * the `flatMapGroupsWithState` pattern for state `session_window`
    * cannot express.
    */
  def statefulSessionize(events: Dataset[SessionEvent], gapMinutes: Long,
                         watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def update(user: Long, batch: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(user, s.start * 1000, s.lastSeen * 1000, s.nEvents, s.sumValue))
      }
      val sorted = batch.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastSeen <= gapMs =>
            cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
              sumValue = s.sumValue + e.value))
          case Some(s) =>
            closed ::= SessionOut(user, s.start * 1000, s.lastSeen * 1000, s.nEvents, s.sumValue)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastSeen + gapMs)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
