package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over an event stream table: events of one user
  * separated by more than `gapMinutes` of inactivity start a new session.
  *
  * Classic gaps-and-islands: lag → gap flag → running sum = session index.
  * One shuffle, on the user key; both window functions share the same
  * (user, ts) ordering so Spark plans a single sort. Time math is done in
  * epoch MICROSECONDS as BIGINT — exact integer arithmetic, identical in
  * any engine (the oracle recomputes it with `epoch_ns(ts)//1000`).
  *
  * The streaming counterpart (watermarks + `session_window` /
  * `flatMapGroupsWithState`) lives in [[graft.streaming.StreamingSessionize]].
  */
object Sessionize {

  /** Assign `session_id` (0-based per user) to each event.
    *
    * `tiebreakCol` makes the within-timestamp ordering deterministic; it must
    * be a unique-per-user column (default matches the `events` testdata).
    */
  def assignSessions(events: DataFrame, gapMinutes: Long,
                     userCol: String = "user_id",
                     tsCol: String = "ts",
                     tiebreakCol: String = "event_id"): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col(userCol)).orderBy(col("ts_us"), col(tiebreakCol))
    events
      .withColumn("ts_us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("ts_us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts_us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__prev", "__new")
  }

  /** Per-session aggregate: event count, span, value stats. Monetary sums
    * go through DECIMAL so the result is order-independent and exact.
    */
  def sessionStats(events: DataFrame, gapMinutes: Long,
                   userCol: String = "user_id",
                   tsCol: String = "ts",
                   tiebreakCol: String = "event_id"): DataFrame =
    assignSessions(events, gapMinutes, userCol, tsCol, tiebreakCol)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))

  /** Session → training-document assembly (the chat-log/interaction-log →
    * corpus-doc stitching step): one row per session with the session's
    * `textCol` values joined in (ts, tiebreak) order. The in-session
    * order is made deterministic WITHOUT an ordered-aggregation shuffle
    * trick: events collect as (ts_us, tiebreak, text) structs, sort
    * row-locally (struct ordering = lexicographic over fields), then
    * project the text — session arrays are human-interaction-sized, so
    * the row-local sort is bounded while the groupBy keeps full NUMEROUS-
    * groups parallelism.
    */
  def sessionTranscripts(events: DataFrame, gapMinutes: Long,
                         textCol: String,
                         userCol: String = "user_id",
                         tsCol: String = "ts",
                         tiebreakCol: String = "event_id",
                         sep: String = " "): DataFrame =
    assignSessions(events, gapMinutes, userCol, tsCol, tiebreakCol)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        array_join(transform(
          sort_array(collect_list(struct(col("ts_us"), col(tiebreakCol),
            col(textCol).cast("string").as("__txt")))),
          x => x.getField("__txt")), sep).as("transcript"))
}
