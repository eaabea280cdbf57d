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
}
