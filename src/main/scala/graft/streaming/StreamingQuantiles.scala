package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Continuous NUMERIC-distribution monitoring — the quantile member of
  * the streaming drift battery ([[StreamingDrift.windowedPsi]] scores a
  * categorical mix; this tracks a numeric column's percentiles): per
  * event-time window, a mergeable GK sketch
  * ([[graft.functions.QuantileSketchAgg]]) accumulates inside the
  * watermarked streaming aggregation — CONSTANT per-window state, the
  * whole point of routing a stream through a sketch instead of a value
  * buffer — then each closed window's sketch is probed at the caller's
  * fractions and compared against a static reference profile: one
  * (window, n, q, value, ref_value, shift) row per (window × probe),
  * append mode. The ingest alarm for "p99 latency moved" /
  * "document-length median collapsed" class monitoring.
  *
  * Shape: watermarked `groupBy(window).agg(sketch, n)` (one stateful
  * aggregation), then the stateless probe explode and a stream-static
  * join against the probe-bounded reference frame. The GK bound (±ε·n
  * rank error) applies per window; the reference side runs the SAME
  * sketch machinery so both sides carry the same error model.
  *
  * State: one compressed summary (O(1/ε·log εn)) + count per open
  * window, watermark-evicted. No driver-side structures.
  */
object StreamingQuantiles {

  /** Reference quantiles (q, ref_value) from a trusted batch frame —
    * the same GK machinery as the stream side (one whole-frame sketch,
    * probed once; probe-bounded output).
    */
  def referenceQuantiles(reference: DataFrame, valueCol: String,
                         probes: Seq[Double],
                         relativeError: Double = 0.01): DataFrame =
    Sketches.estimateQuantiles(
        Sketches.quantileSketch(reference, valueCol, Seq.empty,
          relativeError),
      probes)
      .select(col("q"), col("value").as("ref_value"))

  /** One row per (closed window × probe fraction): the window's
    * estimated quantile, the reference's, and the absolute shift —
    * append mode, ready for an alert sink's `abs shift > threshold`
    * filter.
    */
  def quantilesPerWindow(events: DataFrame, reference: DataFrame,
                         valueCol: String, windowLength: String,
                         probes: Seq[Double] = Seq(0.5, 0.9, 0.99),
                         watermarkDelay: String = "10 minutes",
                         tsCol: String = "ts",
                         relativeError: Double = 0.01): DataFrame = {
    require(probes.nonEmpty, "need at least one probe fraction")
    val ref = referenceQuantiles(reference, valueCol, probes, relativeError)
    val sketched = events
      .filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength))
      .agg(graft.functions.QuantileSketchAgg
          .sketch(col(valueCol).cast("double"), relativeError).as("sketch"),
        count(lit(1)).as("n"))
    Sketches.estimateQuantiles(sketched, probes)
      .join(ref, Seq("q")) // stream-static, probe-bounded right side
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n"), col("q"),
        col("value"), col("ref_value"),
        abs(col("value") - col("ref_value")).as("shift"))
  }
}
