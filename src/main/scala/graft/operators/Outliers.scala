package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Outlier treatment for numeric feature columns: per-group
  * winsorization — clip values to the group's [lower, upper] exact
  * percentiles — the standard robust-statistics cleanup before loss
  * weighting / reward normalization (a handful of corrupt readings
  * otherwise drag a whole group's statistics).
  *
  * Plan shape: one group-aggregate computes the two percentile bounds
  * (rows out = number of groups), joined back onto the input, then a
  * per-row clip. Join selection is left to Catalyst/AQE: the usual
  * handful-of-groups bounds frame broadcasts at runtime, while a
  * caller-chosen high-cardinality group set degrades to a shuffle join
  * instead of OOMing a forced broadcast.
  *
  * 100 TB note: exact `percentile` buffers each group's values during
  * aggregation — fine for bounded group counts with bounded cardinality
  * per value (it buffers value→count), but the petabyte default should
  * be `exact = false`, which swaps in `approx_percentile`
  * (GK-sketch, constant state per group, rank error ≤ 1/accuracy).
  */
object Outliers {

  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                lower: Double = 0.01, upper: Double = 0.99,
                exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(lower >= 0 && upper <= 1 && lower < upper,
      s"need 0 <= lower < upper <= 1, got [$lower, $upper]")
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    val boundsAgg =
      if (exact) Seq(
        expr(s"percentile($valueCol, $lower)").as("__lo"),
        expr(s"percentile($valueCol, $upper)").as("__hi"))
      else Seq(
        expr(s"approx_percentile($valueCol, $lower, $accuracy)").cast("double").as("__lo"),
        expr(s"approx_percentile($valueCol, $upper, $accuracy)").cast("double").as("__hi"))
    val bounds = df.groupBy(groupCols.map(col): _*).agg(boundsAgg.head, boundsAgg.tail: _*)
    clipAgainstBounds(df, valueCol, groupCols, bounds)
  }

  /** Winsorize a batch against bounds probed from a PERSISTED
    * [[Sketches.quantileSketch]] frame — the train-once / apply-anywhere
    * member of the GK family: the REFERENCE distribution's clip bounds
    * apply to tomorrow's batch without rescanning yesterday's data (and
    * without letting the new batch's own outliers move the bounds, the
    * property a self-computed [[winsorize]] cannot have). `sketches`
    * carries one row per `groupCols` value; groups absent from the
    * sketch frame pass through unclipped (`${valueCol}_w` null — no
    * bounds, no verdict). GK rank error applies to the bounds
    * (±ε·n of the reference), so this is spec-verified like the rest
    * of the sketch family.
    */
  def winsorizeFromSketch(df: DataFrame, valueCol: String,
                          groupCols: Seq[String], sketches: DataFrame,
                          lower: Double = 0.01,
                          upper: Double = 0.99): DataFrame = {
    require(lower >= 0 && upper <= 1 && lower < upper,
      s"need 0 <= lower < upper <= 1, got [$lower, $upper]")
    require(groupCols.nonEmpty, "winsorizeFromSketch needs group columns")
    val bounds = Sketches.estimateQuantiles(sketches, Seq(lower, upper))
      .groupBy(groupCols.map(col): _*)
      .agg(max(when(col("q") === lower, col("value"))).as("__lo"),
        max(when(col("q") === upper, col("value"))).as("__hi"))
    clipAgainstBounds(df, valueCol, groupCols, bounds)
  }

  /** The shared clip tail: null-SAFE join keys (groupBy treats a null
    * key as a real group, but a plain equi-join would silently DROP
    * every null-group input row — the null group must clip against its
    * own bounds like any other), then the null-preserving clip.
    */
  private def clipAgainstBounds(df: DataFrame, valueCol: String,
                                groupCols: Seq[String],
                                bounds: DataFrame): DataFrame = {
    val renamedBounds = bounds.select(
      (groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__lo") :+ col("__hi")): _*)
    val joinCond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(renamedBounds, joinCond, "left")
      // greatest/least skip nulls (Postgres semantics in Spark AND
      // DuckDB) — they would clip a null value to the lower bound;
      // a null measurement must stay null
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNotNull && col("__lo").isNotNull,
          least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop(groupCols.map(c => s"__g_$c") :+ "__lo" :+ "__hi": _*)
  }

  /** Per-group robust outlier summary via the Median Absolute Deviation —
    * the scale estimator that, unlike stddev, a handful of extreme
    * corrupt readings cannot drag (50% breakdown point): a point is an
    * outlier when |x - median| > k · MAD.
    *
    * Two aggregation passes (median, then MAD = median of |x - median|),
    * each producing one row per group that joins back onto the data
    * (AQE broadcasts it when the group set is small) — the input
    * shuffles only into the two group-aggregates, never for the
    * comparison itself. Output: one row per group with
    * (n, med, mad, n_outliers).
    *
    * Engine-portability: the outlier comparison runs against the
    * ROUNDED (6 dp) med/mad, so two engines whose exact-percentile
    * interpolation differs in the last ulp still flag identical rows.
    * Exact `percentile` buffers value→count per group — at petabyte
    * scale swap in `approx_percentile` like [[winsorize]] does.
    */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  k: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "madOutliers needs at least one group column")
    require(k > 0, s"k must be positive, got $k")
    val gc = groupCols.map(col)
    val v = col(valueCol)
    def joined(data: DataFrame, stats: DataFrame): DataFrame = {
      // null-safe keys: a null group must compare against its own stats
      val renamed = stats.select(
        groupCols.map(c => col(c).as(s"__g_$c")) ++
          stats.columns.filterNot(groupCols.contains).map(col): _*)
      data.join(renamed,
        groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _), "left")
        .drop(groupCols.map(c => s"__g_$c"): _*)
    }
    val med = df.filter(v.isNotNull).groupBy(gc: _*)
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    val withDev = joined(df.filter(v.isNotNull), med)
      .withColumn("__dev", abs(v - col("med")))
    val mad = withDev.groupBy(gc: _*)
      .agg(round(expr("percentile(__dev, 0.5)"), 6).as("mad"))
    joined(withDev, mad)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Per-group robust scaling: `(x − median) / IQR` — the outlier-proof
    * feature normalization (z-scores explode on heavy tails; quartiles
    * don't move). Quartiles are exact order statistics (value at rank
    * `ceil(p·n)`) from the distributed rank core — constant memory, NO
    * per-group percentile value buffer, full parallelism under the
    * few-giant-groups regime ([[madOutliers]]'s buffered percentile is
    * fine for its group-cardinality output; this one touches every row,
    * so the rank path matters). Zero-IQR groups scale to NULL (no
    * verdict), never a division blow-up.
    */
  def robustScale(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  tieCols: Seq[String], outCol: String = "scaled"): DataFrame = {
    require(groupCols.nonEmpty, "robustScale needs at least one group column")
    val v = col(valueCol)
    val filtered = df.filter(v.isNotNull)
    val ranked = Ranking.rangeRank(filtered, groupCols,
      valueCol +: tieCols, "__rs_rk")
    val counts = ranked.groupBy(groupCols.map(col): _*)
      .agg(max(col("__rs_rk")).as("__rs_n"))
    val withN = FrameOps.statsJoinOn(ranked, counts, groupCols)
    def atQ(p: Double, name: String) =
      max(when(col("__rs_rk") ===
        ceil(lit(p) * col("__rs_n")).cast("long"), v)).as(name)
    val quarts = withN.groupBy(groupCols.map(col): _*)
      .agg(atQ(0.25, "q1"), atQ(0.5, "med"), atQ(0.75, "q3"))
    // attach to the RANKED frame (already materialized through the rank
    // core's sort — same rows as `filtered`), not the input: joining the
    // input would scan the base data a second time for rows the sort
    // pass has already produced (round-8 profile)
    FrameOps.statsJoinOn(ranked, quarts, groupCols)
      .withColumn(outCol, when(col("q3") > col("q1"),
        round((v - col("med")) / (col("q3") - col("q1")), 6)))
      .drop("__rs_rk")
  }

  /** Rolling-baseline anomaly detection on an ordered per-group series —
    * the monitoring primitive over the q83-style daily rollups: each
    * point is z-scored against the PRECEDING `lookback` points (frame
    * excludes the current row, so a spike cannot suppress its own
    * alert). Baseline sums go through DECIMAL(18,6) windows — exact and
    * frame-deterministic, so the score is engine-portable. Points with
    * fewer than `minBaseline` predecessors or a zero-variance baseline
    * get a NULL z (no verdict), never a false alarm.
    *
    * One shuffle on the group key; window state is the `lookback`-row
    * frame. Emits the input columns plus (baseline_mean, z, is_anomaly).
    */
  def rollingAnomaly(df: DataFrame, valueCol: String, groupCols: Seq[String],
                     orderCol: String, lookback: Int = 7,
                     zThreshold: Double = 2.0,
                     minBaseline: Int = 3): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    require(minBaseline >= 2, s"minBaseline must be >= 2, got $minBaseline")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol)).rowsBetween(-lookback.toLong, -1L)
    val v = col(valueCol)
    val d = "decimal(18,6)"
    val withSums = df
      .withColumn("__bn", count(v).over(w))
      .withColumn("__bs", sum(v.cast(d)).over(w).cast("double"))
      .withColumn("__bss", sum((v * v).cast(d)).over(w).cast("double"))
    val n = col("__bn").cast("double")
    val mean = col("__bs") / n
    // sample variance from exact sums; clamp the tiny negative residue
    // double subtraction can leave on constant series
    val variance = greatest(
      (col("__bss") - col("__bs") * col("__bs") / n) / (n - 1d), lit(0.0))
    val std = sqrt(variance)
    withSums
      .withColumn("baseline_mean",
        when(col("__bn") >= minBaseline, round(mean, 6)))
      .withColumn("z",
        when(col("__bn") >= minBaseline && std > 0d,
          round((v - mean) / std, 6)))
      .withColumn("is_anomaly",
        when(col("z").isNotNull, abs(col("z")) > zThreshold))
      .drop("__bn", "__bs", "__bss")
  }
}
