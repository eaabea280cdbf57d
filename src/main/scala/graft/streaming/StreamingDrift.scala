package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous categorical-drift monitoring — the streaming relative of
  * the batch drift battery ([[graft.operators.Drift.psi]] scores
  * numeric columns through quantile bins; this scores a CATEGORICAL
  * column per event-time window against a static reference profile):
  * one (window, n_events, psi) row per closed window, append mode —
  * the ingest-health alarm that fires when a source's category mix
  * shifts mid-stream.
  *
  * Shape: a watermarked (window, category) count aggregation chained
  * into a per-window rollup (the [[StreamingAgg.duplicateRate]]
  * two-stateful-agg pattern), with the reference joined stream-static
  * after the first aggregation. The per-window PSI folds over the
  * collected category list with a DECIMAL(28,12) accumulator — decimal
  * addition is commutative, so `collect_list`'s nondeterministic order
  * cannot change the score.
  *
  * Smoothing: `smooth` is added to both fractions, so categories NEW
  * in the window (absent from the reference) score against
  * smooth-only mass and fire hard. Categories that VANISH from the
  * window contribute only via the survivors' shifted fractions (their
  * own zero-count term is not emitted — the window agg never sees
  * them); a documented one-sided divergence from the batch operator's
  * all-bins smoothing, acceptable because vanishing mass must flow
  * somewhere and the survivors' terms carry it.
  *
  * State: window×category counts (watermark-evicted), reference is
  * category-bounded. No driver-side structures.
  */
object StreamingDrift {

  /** Reference profile (category, ref_frac) from a trusted batch
    * frame — exact fractions; smoothing happens at scoring time.
    */
  def referenceProfile(reference: DataFrame, catCol: String): DataFrame = {
    val counts = reference.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__n"))
    counts.crossJoin(broadcast(total))
      .select(col("category"),
        (col("__c").cast("double") / col("__n").cast("double"))
          .as("ref_frac"))
  }

  /** Per-window top-k terms — the trending-topics monitor: a
    * watermarked (window, term) count aggregation chained into a
    * per-window rollup whose top-k is a row-local sorted-slice over
    * the collected (count, term) structs (array_sort gives
    * (count ASC, term ASC); reverse + slice takes the k heaviest with
    * deterministic ties — no window function, which streaming plans
    * forbid). State: window×term counts, watermark-evicted; the
    * collected list is per-window-vocabulary bounded — right for
    * dashboard windows, not unbounded vocabularies (cap upstream with
    * a dictionary filter if the token space is open).
    */
  def topTermsPerWindow(events: DataFrame, termCol: String,
                        windowLength: String, k: Int = 5,
                        watermarkDelay: String = "10 minutes",
                        tsCol: String = "ts"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    events
      .filter(col(termCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(termCol).as("term"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("window"))
      .agg(sum(col("n")).as("n_events"),
        collect_list(struct(col("n"), col("term"))).as("__ts"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_events"),
        expr(s"""transform(
           |  slice(reverse(array_sort(__ts)), 1, $k),
           |  s -> named_struct('term', s.term, 'n', s.n))""".stripMargin)
          .as("top_terms"))
  }

  /** Windowed PSI vs the reference: (window_start, window_end,
    * n_events, psi), append mode.
    */
  def windowedPsi(events: DataFrame, reference: DataFrame,
                  catCol: String, windowLength: String,
                  watermarkDelay: String = "10 minutes",
                  tsCol: String = "ts",
                  smooth: Double = 1e-6): DataFrame = {
    require(smooth > 0, s"smooth must be positive, got $smooth")
    val ref = referenceProfile(reference, catCol)
    val s = smooth.toString
    events
      .filter(col(catCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(catCol).as("category"))
      .agg(count(lit(1)).as("n"))
      .join(ref, Seq("category"), "left")
      .select(col("window"), col("n"),
        struct(col("n").as("n"),
          coalesce(col("ref_frac"), lit(0.0)).as("ref")).as("__cs"))
      .groupBy(col("window"))
      .agg(sum(col("n")).as("n_events"),
        collect_list(col("__cs")).as("__cats"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_events"),
        round(expr(
          s"""CAST(aggregate(__cats, CAST(0 AS DECIMAL(28,12)), (acc, c) ->
             |CAST(acc + CAST(
             |  ((CAST(c.n AS DOUBLE) / CAST(n_events AS DOUBLE) + $s)
             |    - (c.ref + $s)) *
             |  ln((CAST(c.n AS DOUBLE) / CAST(n_events AS DOUBLE) + $s)
             |    / (c.ref + $s))
             |  AS DECIMAL(28,12)) AS DECIMAL(28,12))) AS DOUBLE)""".stripMargin),
          6).as("psi"))
  }
}
