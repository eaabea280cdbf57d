package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling — the feature-pipeline step that
  * turns irregular event streams into fixed-step series (joinable
  * across sources, window-able, model-ready).
  */
object TimeSeries {

  /** Per-key linear interpolation onto a fixed `stepMicros` grid:
    * `(key, grid_us, value)` for every grid instant inside the key's
    * observed span (`ceil(min)..floor(max)` — no extrapolation, so
    * every grid point has both neighbors and the output is total).
    * Duplicate timestamps resolve to the `tieCol`-max reading first, so
    * interpolation sees a function of time.
    *
    * Shape: one dedup agg (map-side combinable), one bounds agg + grid
    * explode, then ONE union scanned by two per-key windows (forward
    * and reverse running `last(…, ignoreNulls)`) that carry the
    * previous/next reading onto each grid row — no self-join of events
    * to grid, no per-grid-point range probe. Windows partition by key:
    * full parallelism, per-key state is one row. Exact-hit grid points
    * (prev ts = grid ts) short-circuit to the reading itself; the lerp
    * runs the documented double tree `pv + (nv − pv)·((t − pt)/(nt −
    * pt))`, engine-portable because every operand is integer-derived or
    * a raw stored double.
    */
  /** Burst collapse ("debounce"): within each key, events chained by
    * gaps ≤ `quietMicros` form one burst, and only the burst's first
    * timestamp survives, with the collapsed row count — the telemetry
    * cleanup that stops retry storms / double-clicks from counting as
    * engagement. Gaps-and-islands under one per-key window (lag +
    * running sum) + one aggregation; fully parallel across keys.
    * Output: keyCols…, `us` (burst start, epoch micros), `burst_n`.
    */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
               quietMicros: Long, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "debounce needs at least one key column")
    require(quietMicros > 0L, s"quietMicros must be positive, got $quietMicros")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("__us"), col(tieCol))
    val marked = df.filter(col(tsCol).isNotNull)
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__brk",
        when(col("__us") - lag(col("__us"), 1).over(w) > quietMicros, 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__brk")).over(w))
    marked.groupBy(keys :+ col("__grp"): _*)
      .agg(min(col("__us")).as("us"), count(lit(1)).as("burst_n"))
      .drop("__grp")
  }

  def resampleInterpolate(df: DataFrame, keyCol: String, tsCol: String,
                          valCol: String, stepMicros: Long,
                          tieCol: String): DataFrame = {
    require(stepMicros > 0L, s"stepMicros must be positive, got $stepMicros")
    val us = unix_micros(col(tsCol))
    val ev = df.filter(col(valCol).isNotNull)
      .select(col(keyCol), us.as("us"), col(valCol).as("v"), col(tieCol))
      .groupBy(col(keyCol), col("us"))
      .agg(max_by(col("v"), col(tieCol)).as("v"))
    val step = lit(stepMicros)
    val bounds = ev.groupBy(col(keyCol))
      .agg(min(col("us")).as("__mn"), max(col("us")).as("__mx"))
      .select(col(keyCol),
        // exact integer ceil/floor to the step (epoch micros are
        // non-negative, so DIV truncation IS floor)
        expr(s"((__mn + ${stepMicros - 1}) DIV $stepMicros) * $stepMicros")
          .as("__gmin"),
        expr(s"(__mx DIV $stepMicros) * $stepMicros").as("__gmax"))
    val grid = bounds.filter(col("__gmin") <= col("__gmax"))
      .select(col(keyCol),
        explode(sequence(col("__gmin"), col("__gmax"), step)).as("us"))
    val unioned = ev.withColumn("is_grid", lit(0))
      .unionByName(grid.withColumn("v", lit(null).cast("double"))
        .withColumn("is_grid", lit(1)))
    val fwd = Window.partitionBy(col(keyCol))
      .orderBy(col("us"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rev = Window.partitionBy(col(keyCol))
      .orderBy(col("us").desc, col("is_grid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vus = when(col("v").isNotNull, col("us"))
    val scanned = unioned
      .withColumn("__pv", last(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("__pus", last(vus, ignoreNulls = true).over(fwd))
      .withColumn("__nv", last(col("v"), ignoreNulls = true).over(rev))
      .withColumn("__nus", last(vus, ignoreNulls = true).over(rev))
    scanned.filter(col("is_grid") === 1)
      .select(col(keyCol), col("us").as("grid_us"),
        when(col("__pus") === col("us"), round(col("__pv"), 6))
          .otherwise(round(col("__pv") + (col("__nv") - col("__pv")) *
            ((col("us") - col("__pus")) / (col("__nus") - col("__pus"))), 6))
          .as("value"))
  }

  /** Per-key inter-event-time statistics: mean/std of the gaps between
    * consecutive events (microseconds), their coefficient of variation,
    * and the Goh–Barabási burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1) — B → 1
    * bursty, B = 0 Poisson, B → −1 periodic. The bot-vs-human /
    * scraper-traffic signal on an event stream.
    *
    * Exactness: gaps are integer micros of the per-key SORTED timestamp
    * sequence (sums over them are independent of how an engine breaks
    * equal-timestamp ties); Σgap and Σgap² go through DECIMAL (gap² can
    * exceed int64) so the moment sums are exact and order-free, and every
    * derived double (mean, var, sqrt, ratios) is a correctly-rounded IEEE
    * op on those exact sums — bit-identical in any engine, no quantization
    * needed. One windowed lag over a user-keyed sort + one hash agg; keys
    * with < `minGaps` gaps are dropped (moments undefined).
    */
  def interEventStats(events: DataFrame, keyCol: String = "user_id",
                      tsCol: String = "ts", minGaps: Long = 2L): DataFrame = {
    require(minGaps >= 2, s"sample std needs >= 2 gaps, got minGaps=$minGaps")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"))
    val gaps = events
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("__gap").isNotNull)
    val gd = col("__gap").cast("decimal(19,0)")
    val agg = gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(gd).as("__s"), sum(gd * gd).as("__sq"))
      .filter(col("n_gaps") >= minGaps)
    val n = col("n_gaps").cast("double")
    val s = col("__s").cast("double")
    val sq = col("__sq").cast("double")
    val mean = s / n
    // cancellation can drive the exact-sum variance epsilon-negative;
    // both engines clamp identically
    val variance = greatest((sq - s * s / n) / (n - lit(1d)), lit(0d))
    agg.select(col(keyCol), col("n_gaps"),
        mean.as("mean_gap_us"), sqrt(variance).as("std_gap_us"))
      .withColumn("cv", when(col("mean_gap_us") > 0d,
        round(col("std_gap_us") / col("mean_gap_us"), 6)))
      .withColumn("burstiness",
        when(col("std_gap_us") + col("mean_gap_us") > 0d,
          round((col("std_gap_us") - col("mean_gap_us")) /
            (col("std_gap_us") + col("mean_gap_us")), 6)))
  }
}
