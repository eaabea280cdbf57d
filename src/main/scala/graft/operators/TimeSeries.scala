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

  /** Mann-Kendall monotonic-trend test per series (Mann 1945; Kendall
    * 1975), the nonparametric "is this metric drifting" check that
    * assumes nothing about the distribution: `S = Σ_{i<j} sign(x_j −
    * x_i)` over time-ordered observations, tie-corrected variance
    * `(n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) / 18`, continuity-corrected
    * `z = (S ∓ 1)/σ`. Positive z = upward trend.
    *
    * Intended for AGGREGATED series (a daily metric per key): the pair
    * join is quadratic in series length, which is calendar-bounded —
    * never row-quadratic in the corpus. S and the tie term are exact
    * integers; z's sqrt/division are single correctly-rounded ops.
    * Input: one row per (series key, time); output per key: n, s_stat,
    * var_s, z (6 dp).
    */
  def mannKendall(df: DataFrame, keyCols: Seq[String], timeCol: String,
                  valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mannKendall needs series key columns")
    val gc = keyCols.map(col)
    val base = df.filter(col(valueCol).isNotNull)
      .select(gc :+ col(timeCol).as("__t") :+
        col(valueCol).cast("double").as("__v"): _*)
    val pairs = base.alias("a")
      .join(base.alias("b"),
        keyCols.map(k => col(s"a.$k") === col(s"b.$k"))
          .reduce(_ && _) && col("a.__t") < col("b.__t"))
      .groupBy(keyCols.map(k => col(s"a.$k").as(k)): _*)
      .agg(sum(signum(col("b.__v") - col("a.__v")).cast("long")).as("s_stat"))
    val counts = base.groupBy(gc: _*).agg(count(lit(1)).as("n"))
    val ties = base.groupBy(gc :+ col("__v"): _*)
      .agg(count(lit(1)).as("__t1"))
      .groupBy(gc: _*)
      .agg(sum(col("__t1") * (col("__t1") - 1L) *
        (lit(2L) * col("__t1") + 5L)).as("__tt"))
    val n = col("n")
    val varS = (n * (n - 1L) * (lit(2L) * n + 5L) - col("__tt"))
      .cast("double") / 18d
    val s = col("s_stat").cast("double")
    val z = when(col("s_stat") > 0L, (s - 1d) / sqrt(col("var_s")))
      .when(col("s_stat") < 0L, (s + 1d) / sqrt(col("var_s")))
      .otherwise(0d)
    pairs.join(counts, keyCols).join(ties, keyCols)
      .withColumn("var_s", varS)
      .filter(col("var_s") > 0d) // constant series: no test
      .select(gc ++ Seq(n, col("s_stat"), col("var_s"),
        round(z, 6).as("z")): _*)
  }

  /** Theil–Sen robust slope per series: the MEDIAN of all pairwise
    * slopes `(x_j − x_i)/(t_j − t_i)` — up to ~29% contamination does
    * not move it, unlike OLS. Same calendar-bounded pair frame as
    * [[mannKendall]]; the median is the exact lower-median value at
    * rank `ceil(p/2)` over (slope, ti, tj)-ordered pairs (deterministic
    * total order; even counts take the LOWER median so the output is an
    * observed slope, engine-portable with no averaging convention).
    * Output per key: n_pairs, slope (6 dp).
    */
  def theilSen(df: DataFrame, keyCols: Seq[String], timeCol: String,
               valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "theilSen needs series key columns")
    val gc = keyCols.map(col)
    val base = df.filter(col(valueCol).isNotNull)
      .select(gc :+ col(timeCol).cast("double").as("__t") :+
        col(valueCol).cast("double").as("__v"): _*)
    val pairs = base.alias("a")
      .join(base.alias("b"),
        keyCols.map(k => col(s"a.$k") === col(s"b.$k"))
          .reduce(_ && _) && col("a.__t") < col("b.__t"))
      .select(keyCols.map(k => col(s"a.$k").as(k)) ++ Seq(
        ((col("b.__v") - col("a.__v")) / (col("b.__t") - col("a.__t")))
          .as("__slope"),
        col("a.__t").as("__ti"), col("b.__t").as("__tj")): _*)
    // pair frame is length²-bounded per series (calendar-bounded input)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gc: _*).orderBy(col("__slope"), col("__ti"), col("__tj"))
    val counts = pairs.groupBy(gc: _*).agg(count(lit(1)).as("n_pairs"))
    pairs.withColumn("__rn", row_number().over(w))
      .join(counts, keyCols)
      // lower-median rank (p+1)/2, truncating — 4 pairs -> rank 2,
      // 5 pairs -> rank 3
      .filter(col("__rn") ===
        ((col("n_pairs") + 1L) / 2L).cast("long"))
      .select(gc ++ Seq(col("n_pairs"),
        round(col("__slope"), 6).as("slope")): _*)
  }

  /** Count-dispersion diagnostic over a per-(group, day) count frame —
    * "is this event stream Poisson, or bursty/zero-inflated": the
    * variance-to-mean dispersion index over the FULL calendar span
    * (absent days are true zeros, not missing data — computed as
    * span − active days, never materialized), plus the observed vs
    * Poisson-expected zero-day fraction. Dispersion ≈ 1 → Poisson;
    * ≫ 1 → burst clustering; observed zeros ≫ e^(−λ) → zero
    * inflation. Index > 1 says a mean-rate alarm threshold will
    * misfire; q89/q148's z-scores assume it's checked.
    *
    * Exactness: Σx and Σx² are exact integer sums; span arithmetic is
    * integer; every derived double is a fixed tree both engines
    * replay (variance uses the n−1 computational identity on the
    * span-sized population including zeros).
    *
    * Scale: one map-side-combinable aggregation over the
    * calendar-bounded count frame.
    */
  def dispersionCheck(df: DataFrame, groupCols: Seq[String],
                      timeCol: String, valueCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val base = df.select(gc :+ col(timeCol).cast("long").as("__t")
      :+ col(valueCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull && col("__t").isNotNull)
    base.groupBy(gc: _*)
      .agg(count(lit(1)).as("__active"),
        (max(col("__t")) - min(col("__t")) + 1L).as("span_days"),
        sum(col("__v")).as("__sx"),
        sum(col("__v") * col("__v")).as("__sxx"))
      .filter(col("span_days") > 1L)
      .select(gc ++ Seq(
        col("span_days"), col("__active").as("n_active_days"),
        round(col("__sx").cast("double") / col("span_days").cast("double"), 6)
          .as("mean_per_day"),
        when(col("__sx") > 0L,
          round((col("__sxx").cast("double") -
              col("span_days").cast("double") *
              (col("__sx").cast("double") / col("span_days").cast("double")) *
              (col("__sx").cast("double") / col("span_days").cast("double"))) /
            (col("span_days") - 1L).cast("double") /
            (col("__sx").cast("double") / col("span_days").cast("double")), 6))
          .as("dispersion"),
        round((col("span_days") - col("__active")).cast("double") /
          col("span_days").cast("double"), 6).as("zero_frac_obs"),
        round(exp(lit(0.0) - col("__sx").cast("double") /
          col("span_days").cast("double")), 6).as("zero_frac_poisson")): _*)
  }

  /** Seasonal-naive forecast evaluation with MASE (Hyndman & Koehler
    * 2006) — the baseline every volume-forecast and anomaly threshold
    * should beat: forecast(d) = value(d − season), scored against the
    * one-step naive forecast(d) = value(d − 1). MASE = MAE_seasonal /
    * MAE_naive1 < 1 means the weekly pattern carries real signal.
    *
    * Lag semantics are TRUE time offsets via self-equi-joins on
    * (group, t − season) / (group, t − 1) — not row lags, so calendar
    * gaps can't silently misalign a "week ago"; the eval set is the
    * days where BOTH references exist (same set for both MAEs — the
    * MASE contract). Values are exact integers (counts), so both MAE
    * sums are exact longs and MASE is ONE double division — engine-
    * replayable without quantization.
    *
    * Scale: three scans of the (group, t) frame — already reduced from
    * raw events, calendar-bounded — joined on its key. No windows, no
    * sort.
    */
  def seasonalNaiveEval(df: DataFrame, groupCols: Seq[String],
                        timeCol: String, valueCol: String,
                        season: Long = 7L): DataFrame = {
    require(season >= 2L, s"season must be >= 2, got $season")
    val gc = groupCols.map(col)
    val base = df.select(gc :+ col(timeCol).cast("long").as("__t")
      :+ col(valueCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull && col("__t").isNotNull)
    val sRef = base.select(gc :+ (col("__t") + season).as("__t")
      :+ col("__v").as("__fs"): _*)
    val nRef = base.select(gc :+ (col("__t") + 1L).as("__t")
      :+ col("__v").as("__f1"): _*)
    val keys = groupCols :+ "__t"
    base.join(sRef, keys).join(nRef, keys)
      .select(gc :+ col("__t")
        :+ abs(col("__v") - col("__fs")).as("__aes")
        :+ abs(col("__v") - col("__f1")).as("__ae1"): _*)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_eval"),
        sum(col("__aes")).as("__ss"), sum(col("__ae1")).as("__s1"))
      .filter(col("n_eval") > 0L)
      .select(gc ++ Seq(col("n_eval"),
        round(col("__ss").cast("double") / col("n_eval").cast("double"), 6)
          .as("mae_seasonal"),
        round(col("__s1").cast("double") / col("n_eval").cast("double"), 6)
          .as("mae_naive1"),
        when(col("__s1") > 0L,
          round(col("__ss").cast("double") / col("__s1").cast("double"), 6))
          .as("mase")): _*)
  }
}
