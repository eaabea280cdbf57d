package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics: ordered funnels, cohort retention and
  * transition matrices — the query family every events table ultimately
  * serves.
  *
  * Scale design: everything is keyed by user (or a derived day/type key)
  * and shuffles once per aggregation with map-side combine; the funnel
  * chains one bounded aggregation per stage (k stages → k user-keyed
  * shuffles over ever-shrinking frames, each carrying one row per
  * surviving user — no event-level self-join blowup, no per-user
  * collect_list).
  */
object ProductAnalytics {

  /** Ordered funnel: per user, the earliest time of stage i strictly
    * AFTER the achieved time of stage i-1 (the standard "did they view,
    * then click, then buy, in that order" semantics). Returns one row
    * per user who completed stage 0: `t_<stage>` epoch-micros columns
    * (NULL once the user falls out) and `depth` = number of stages
    * completed.
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts",
             withinMicros: Option[Long] = None): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    require(withinMicros.forall(_ > 0L), "withinMicros must be positive")
    val u = col(userCol)
    def stageTimes(stage: String) =
      events.filter(col(typeCol) === stage)
        .select(u, unix_micros(col(tsCol)).as("__t"))
    // head stage: first occurrence ever
    var reached = stageTimes(stages.head).groupBy(u)
      .agg(min(col("__t")).as(s"t_${stages.head}"))
    // each later stage: first occurrence strictly after the prior stage
    // (and, time-bounded, within `withinMicros` of it — the "converted
    // within an hour" semantics; a later out-of-window occurrence does
    // NOT resurrect the user)
    stages.sliding(2).foreach { case Seq(prev, cur) =>
      val inWindow = withinMicros
        .map(w => col("__t") <= col(s"t_$prev") + w).getOrElse(lit(true))
      val nxt = stageTimes(cur).join(reached.select(u, col(s"t_$prev")), userCol)
        .filter(col("__t") > col(s"t_$prev") && inWindow)
        .groupBy(u).agg(min(col("__t")).as(s"t_$cur"))
        .select(u, col(s"t_$cur"))
      reached = reached.join(nxt, Seq(userCol), "left")
    }
    val depth = stages.map(s => when(col(s"t_$s").isNotNull, 1L).otherwise(0L))
      .reduceLeft(_ + _)
    reached.withColumn("depth", depth)
  }

  /** Funnel conversion summary: one row per stage — users reaching it,
    * conversion vs the previous stage, conversion vs the head (both
    * exact-integer ratios in double, round(6)).
    */
  def funnelSummary(events: DataFrame, stages: Seq[String],
                    userCol: String = "user_id", typeCol: String = "event_type",
                    tsCol: String = "ts",
                    withinMicros: Option[Long] = None): DataFrame = {
    val f = funnel(events, stages, userCol, typeCol, tsCol, withinMicros)
    val counts = f.agg(
      count(lit(1)).as("__n0"),
      stages.zipWithIndex.map { case (s, i) =>
        count(col(s"t_$s")).as(s"__n$i") }.tail: _*)
    val rows = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(s).as("stage"),
        col(s"__n$i").as("n_users"),
        round(col(s"__n$i").cast("double") /
          col(s"__n${math.max(i - 1, 0)}"), 6).as("conv_from_prev"),
        round(col(s"__n$i").cast("double") / col("__n0"), 6).as("conv_from_head"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Weekly cohort retention: users grouped by the week of their FIRST
    * activity; for each (cohort week, weeks since), how many of them
    * were active. `dayCol` is an epoch-day long (derive with
    * `unix_date`). Weeks are floor(day/7) — fixed calendar-free 7-day
    * buckets, exact integer arithmetic.
    */
  def weeklyRetention(activity: DataFrame, userCol: String = "user_id",
                      dayCol: String = "day"): DataFrame = {
    val act = activity.select(col(userCol).as("u"), col(dayCol).as("d")).distinct()
    val cohort = act.groupBy(col("u")).agg(min(col("d")).as("c"))
    act.join(cohort, "u")
      .groupBy(floor(col("c") / 7L).cast("long").as("cohort_week"),
        floor((col("d") - col("c")) / 7L).cast("long").as("weeks_since"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** Last-touch attribution: for every conversion event, the latest
    * PRECEDING non-conversion event of the same user (the marketing
    * question "what did they do right before buying"). One window pass
    * over a user-keyed sort; the carried state is one struct per row.
    * Conversions with no preceding touch attribute to NULL. Emits
    * (user, conversion id, conversion epoch-micros, source type, source
    * id, `gap_us` — RAW MICROSECONDS between touch and conversion; the
    * caller divides, since integer-vs-double division rounding is not
    * engine-portable).
    */
  def lastTouchAttribution(events: DataFrame, conversionType: String,
                           userCol: String = "user_id",
                           typeCol: String = "event_type",
                           tsCol: String = "ts",
                           idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= conversionType,
      struct(unix_micros(col(tsCol)).as("t"), col(typeCol).as("tp"),
        col(idCol).as("id")))
    events
      .withColumn("__touch", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .select(col(userCol), col(idCol).as("conversion_id"),
        unix_micros(col(tsCol)).as("conversion_us"),
        col("__touch.tp").as("source_type"),
        col("__touch.id").as("source_id"),
        // raw micros, not divided seconds: integer-vs-double division
        // rounding differs across engines, a plain difference cannot
        (unix_micros(col(tsCol)) - col("__touch.t")).as("gap_us"))
  }

  /** Time-weighted average of a per-entity metric series — the correct
    * mean for irregularly-sampled state (a sensor read twice then silent
    * for an hour held that last value for the hour): each reading is
    * weighted by how long it was current, i.e. the micros until the next
    * reading. The final reading has no successor and carries zero weight
    * (integral semantics over the observed span).
    *
    * One shuffle on the entity key (window + aggregation share it). The
    * weighted sum runs in DECIMAL(28,6) — double summation order varies
    * with partitioning, decimal addition is exact and therefore
    * engine/partitioning-portable. Emits (entity, n, span_us, twap).
    */
  def timeWeightedAvg(events: DataFrame, userCol: String = "user_id",
                      valueCol: String = "value", tsCol: String = "ts",
                      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    events
      .filter(col(valueCol).isNotNull)
      .withColumn("__dt", lead(us, 1).over(w) - us)
      .filter(col("__dt").isNotNull)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__dt")).as("span_us"),
        sum((col(valueCol) * col("__dt")).cast("decimal(28,6)"))
          .as("__vsum"))
      .filter(col("span_us") > 0L)
      .select(col(userCol), col("n"), col("span_us"),
        round(col("__vsum").cast("double") / col("span_us").cast("double"), 6)
          .as("twap"))
  }

  /** First-order transition matrix of a per-user event sequence:
    * (from_type, to_type, n, p) where p is the exact row-normalized
    * probability. Sequences are ordered by (ts, tiebreak) per user; one
    * window pass + one aggregation.
    */
  def transitions(events: DataFrame, userCol: String = "user_id",
                  typeCol: String = "event_type", tsCol: String = "ts",
                  tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("from_type"))
    pairs.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(totals), 6))
  }

  /** Frequent ordered event-type trigrams ("navigation paths"):
    * `(e1, e2, e3, n_users, n_occurrences)` for every consecutive
    * 3-step path taken by at least `minUsers` DISTINCT users — the
    * order-sensitive complement of [[transitions]] (first-order) and of
    * market-basket pairs (orderless). Consecutive means adjacent in the
    * user's (ts, tiebreak) order; paths cross session gaps by design —
    * sessionize first and use the session id as `userCol` for
    * within-session paths.
    *
    * One per-user window pass (two `lead`s share the sort) + one path
    * aggregation; support counts are distinct-user so a single looping
    * user cannot promote a path. The path space is bounded by
    * |event types|³, not by corpus size — the aggregation output is
    * structurally small even at 100 TB.
    */
  def frequentSequences(events: DataFrame, minUsers: Long,
                        userCol: String = "user_id",
                        typeCol: String = "event_type", tsCol: String = "ts",
                        tieCol: String = "event_id"): DataFrame = {
    require(minUsers >= 1L, s"minUsers must be >= 1, got $minUsers")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__e2", lead(col(typeCol), 1).over(w))
      .withColumn("__e3", lead(col(typeCol), 2).over(w))
      .filter(col("__e3").isNotNull)
      .groupBy(col(typeCol).as("e1"), col("__e2").as("e2"),
        col("__e3").as("e3"))
      .agg(countDistinct(col(userCol)).as("n_users"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_users") >= minUsers)
  }

  /** Per-day audience growth: active users, first-time ("new") users, and
    * the cumulative distinct-user count — the standard DAU/cumulative-
    * uniques board. Cumulative distinct is NOT a distinct-over-expanding-
    * window (quadratic state): each user contributes once at their
    * first-seen day, so cum_users = running sum of new_users — two hash
    * aggregations (user-keyed min, then day-keyed counts) and a running
    * sum over the PER-DAY frame, which is calendar-bounded (≈365 rows/
    * year at any corpus size), the q126-style fixed-size window.
    */
  def cumulativeUniques(activity: DataFrame, userCol: String = "user_id",
                        dayCol: String = "day"): DataFrame = {
    val act = activity.select(col(userCol).as("u"), col(dayCol).as("d")).distinct()
    val newPerDay = act.groupBy(col("u")).agg(min(col("d")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("new_users"))
    val activePerDay = act.groupBy(col("d")).agg(count(lit(1)).as("active_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    activePerDay.join(newPerDay, Seq("d"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("new_users")).over(w).cast("long"))
      .select(col("d").as("day"), col("active_users"), col("new_users"),
        col("cum_users"))
  }

  /** Per-user feature-store snapshot + churn label — the one-pass
    * materialization a behavioral model trains on: event volume,
    * per-type conditional counts, exact purchase value, activity span
    * and distinct active days, recency vs the corpus-max day (the
    * deterministic "now"), and the churn label `recency > churnDays`.
    * Everything folds in ONE map-side-combinable aggregation over
    * events plus a one-row anchor broadcast; type columns are
    * caller-fixed (a feature schema is fixed by contract — dynamic
    * pivot would break train/serve parity).
    */
  def userFeatures(events: DataFrame, typeCounts: Seq[String],
                   churnDays: Long = 14L): DataFrame = {
    require(typeCounts.nonEmpty, "need at least one counted event type")
    val base = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("value"),
        unix_date(to_date(col("ts"))).cast("long").as("__day"))
    val anchor = base.agg(max(col("__day")).as("__mx"))
    val typeCols = typeCounts.map(t =>
      count(when(col("event_type") === t, lit(1))).as(s"n_$t"))
    val aggs = count(lit(1)).as("n_events") +: (typeCols ++ Seq(
      sum(when(col("event_type") === "purchase",
        col("value").cast("decimal(30,6)"))).as("__pv"),
      min(col("__day")).as("first_day"),
      max(col("__day")).as("last_day"),
      countDistinct(col("__day")).as("active_days")))
    base.groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .crossJoin(broadcast(anchor))
      .withColumn("purchase_value",
        round(coalesce(col("__pv").cast("double"), lit(0.0)), 6))
      .withColumn("recency_days", col("__mx") - col("last_day"))
      .withColumn("churned", col("recency_days") > churnDays)
      .drop("__pv", "__mx")
  }

  /** Exponentially time-decayed engagement score — the recency-weighted
    * activity metric (half-life form): each event contributes
    * `2^(−age/halfLife)`, so an event exactly one half-life old counts
    * half. The anchor is the corpus max timestamp (one-row aggregate,
    * broadcast) — deterministic across reruns, unlike wall-clock now().
    *
    * Portability: age is exact integer micros; the weight is
    * `exp(−ln 2 · age_days / halfLifeDays)` — the same ln/exp tree the
    * q137 survival oracle already replays bit-for-bit — and weights
    * quantize to DECIMAL(28,12) before the order-free per-key sum.
    *
    * Scale: one corpus scan + one keyed aggregation (map-side
    * combined); the anchor is the only non-keyed state.
    */
  def decayedScore(events: DataFrame, keyCols: Seq[String],
                   tsCol: String = "ts",
                   halfLifeDays: Double = 7.0): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive, got $halfLifeDays")
    val gc = keyCols.map(col)
    val us = unix_micros(col(tsCol))
    val base = events.filter(col(tsCol).isNotNull)
      .select(gc :+ us.as("__us"): _*)
    val anchor = base.agg(max(col("__us")).as("__mx"))
    base.crossJoin(broadcast(anchor))
      .withColumn("__w",
        exp(lit(-math.log(2.0)) *
          ((col("__mx") - col("__us")).cast("double") / lit(86400e6)) /
          lit(halfLifeDays))
          .cast("decimal(28,12)"))
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("__w")).cast("double"), 6).as("decayed_score"))
  }
}
