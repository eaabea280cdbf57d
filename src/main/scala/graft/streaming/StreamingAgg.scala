package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative Structured-Streaming aggregation and ingest-dedup — the
  * continuous counterparts of the batch group-aggregates and
  * [[graft.operators.Dedup.exact]].
  *
  * Everything here is `readStream`-source-agnostic (file / kafka / memory)
  * and watermark-driven: state eviction is Spark's, sharded by the group
  * key across executors, so a 1000-executor cluster holds the window /
  * seen-key state horizontally with no driver-side structures.
  */
object StreamingAgg {

  /** Tumbling (or, with `slide`, sliding) event-time window aggregation
    * with watermarked late-data handling: per (window, extra keys) event
    * counts and value sums, emitted once the watermark passes the window
    * end (append mode) — the standard throughput/quality dashboard shape.
    */
  def windowedStats(events: DataFrame, windowLength: String,
                    slide: Option[String] = None,
                    watermarkDelay: String = "10 minutes",
                    tsCol: String = "ts", valueCol: String = "value",
                    extraKeys: Seq[String] = Seq.empty): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowLength, s)
      case None => window(col(tsCol), windowLength)
    }
    val keys: Seq[Column] = w.as("w") +: extraKeys.map(col)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select((Seq(col("w.start").as("window_start"),
        col("w.end").as("window_end")) ++
        extraKeys.map(col) ++
        Seq(col("n_events"), col("sum_value"))): _*)
  }

  /** Streaming exact dedup for ingest: drop rows whose `keys` were already
    * seen within the watermark horizon (`dropDuplicatesWithinWatermark`,
    * so the seen-key state is EVICTED once the watermark passes — bounded
    * state, unlike plain `dropDuplicates` whose state grows forever on an
    * unbounded stream). The at-scale contract every continuous
    * training-data ingest needs: re-delivered payloads (at-least-once
    * sources) are dropped while state stays O(keys per horizon).
    *
    * Exactly-once caveat: duplicates farther apart than the watermark
    * horizon survive; the terminal batch [[graft.operators.Dedup.exact]]
    * pass over the landed corpus removes those.
    */
  def dedupedStream(events: DataFrame, keys: Seq[String],
                    watermarkDelay: String = "10 minutes",
                    tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Duplicate-rate monitor over the RAW (pre-dedup) stream: per
    * event-time window, total arrivals vs distinct keys —
    * `dup_rate = 1 − distinct/total` is the ingest-health metric a
    * pipeline alarms on (a jump means an upstream started replaying).
    * Exact distinct via two CHAINED stateful aggregations — (window,
    * key) pre-group then window — both map-side combinable and
    * watermark-evicted (Spark ≥ 3.4 multi-stateful-operator support);
    * emitted once the watermark closes the window.
    */
  def duplicateRate(events: DataFrame, keys: Seq[String], tsCol: String,
                    windowLength: String,
                    watermarkDelay: String): DataFrame = {
    require(keys.nonEmpty, "duplicateRate needs at least one key column")
    val w = window(col(tsCol), windowLength)
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(w +: keys.map(col): _*)
      .agg(count(lit(1)).as("__arrivals"))
      .groupBy(col("window"))
      .agg(sum(col("__arrivals")).as("n_arrivals"),
        count(lit(1)).as("n_distinct"))
      .select(col("window.start").as("window_start"),
        col("n_arrivals"), col("n_distinct"),
        round(lit(1d) - col("n_distinct").cast("double") /
          col("n_arrivals").cast("double"), 6).as("dup_rate"))
  }

  /** Streaming counterpart of
    * [[graft.operators.Dedup.incrementalExact]]: drop streamed rows whose
    * key already exists in the STATIC ingested-corpus key set (a
    * stream-static anti-join — stateless on the stream side). Spark
    * re-executes the static plan per micro-batch, but a FILE-based
    * frame's directory listing is resolved once at creation
    * (InMemoryFileIndex) — new snapshot files are NOT picked up until
    * the caller recreates the frame or, for a catalog table, runs
    * `REFRESH TABLE`; picking up a refreshed snapshot therefore needs
    * one of those, not just the next micro-batch. Compose with
    * [[dedupedStream]] upstream to also drop within-stream
    * re-deliveries. The static side is a one-column key projection —
    * broadcast when small, shuffle-hash otherwise, per normal join
    * planning.
    */
  def dedupedAgainstCorpus(stream: DataFrame, knownKeys: DataFrame,
                           keyCol: String): DataFrame =
    stream.join(knownKeys.select(col(keyCol)), Seq(keyCol), "left_anti")

  /** Per-window DISTINCT-count monitoring at constant state — the HLL
    * member of the streaming sketch matrix (PSI = categorical mix,
    * [[StreamingQuantiles]] = numeric percentiles, this = cardinality:
    * "unique users per window" without buffering the keys): the
    * `hll_sketch_agg` binary accumulates inside the watermarked
    * streaming aggregation (~4 KB per open window at the default lgK),
    * and the closed window emits count, estimate, and the
    * distinct-per-event ratio — a collapsing ratio is the bot-flood /
    * stuck-producer alarm. Append mode. The emitted sketch column also
    * unions register-wise downstream ([[graft.operators.Sketches
    * .mergeSketches]]) for day-over-day rollups without re-reading
    * events.
    */
  def distinctPerWindow(events: DataFrame, keyCol: String,
                        windowLength: String,
                        watermarkDelay: String = "10 minutes",
                        tsCol: String = "ts", lgK: Int = 12): DataFrame =
    events
      .filter(col(keyCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength))
      .agg(count(lit(1)).as("n_events"),
        hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_events"),
        col("sketch"),
        hll_sketch_estimate(col("sketch")).as("n_distinct"),
        round(hll_sketch_estimate(col("sketch")).cast("double") /
          col("n_events").cast("double"), 6).as("distinct_ratio"))
}
