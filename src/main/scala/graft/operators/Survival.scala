package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis: the Kaplan–Meier product-limit estimator per
  * group — the standard churn/retention curve over right-censored
  * durations (a user who is still active at observation end is
  * CENSORED, not a churn event; dropping censored subjects biases the
  * curve, which is the whole reason KM exists).
  *
  * `S(t) = Π_{s ≤ t, d_s > 0} (1 − d_s / n_s)` where `d_s` = events at
  * time s and `n_s` = subjects still at risk entering s.
  *
  * Plan shape: raw (subject) rows reduce ONCE to per-(group, time)
  * event/censor counts — map-side combinable, the KS-test discipline —
  * and everything after runs on the distinct-time frame: one window
  * pass per group computes at-risk counts (reverse cumulative) and the
  * cumulative log-survival, with per-step ln terms DECIMAL(28,12)-
  * quantized so both the prefix sums and `exp` see identical doubles in
  * any engine. The window state is distinct-TIME-sized, not
  * subject-sized; for continuous durations at petabyte scale, quantize
  * durations first (`floor` to a reporting grid — statistically
  * standard for KM) to bound the frame.
  *
  * The `S(t) = 0` absorbing case (everyone at risk dies at some t —
  * `ln 0` engine-dependent) is handled by a cumulative flag rather
  * than evaluating the logarithm.
  *
  * Output: one row per (group, distinct time) —
  * (groupCols, t, n_risk, n_event, n_censored, survival 6 dp).
  */
object Survival {

  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
                  groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "kaplanMeier needs at least one group column")
    val gc = groupCols.map(col)
    val t = col(durationCol)
    val counts = df
      .filter(t.isNotNull && col(eventCol).try_cast("boolean").isNotNull)
      .groupBy(gc :+ t.as("t"): _*)
      .agg(sum(when(col(eventCol).try_cast("boolean"), 1L).otherwise(0L))
        .as("n_event"),
        sum(when(col(eventCol).try_cast("boolean"), 0L).otherwise(1L))
        .as("n_censored"))
    val totals = counts.groupBy(gc: _*)
      .agg(sum(col("n_event") + col("n_censored")).as("__n_total"))
    val w = Window.partitionBy(gc: _*).orderBy(col("t"))
    val withRisk = FrameOps.statsJoinOn(counts, totals, groupCols)
      .withColumn("__cum", sum(col("n_event") + col("n_censored")).over(w))
      .withColumn("n_risk",
        col("__n_total") - col("__cum") + col("n_event") + col("n_censored"))
    // per-step ln(1 - d/n), decimal-quantized; the d = n absorbing step
    // contributes no ln term but raises the cumulative zero flag
    val step = lit(1.0) -
      col("n_event").cast("double") / col("n_risk").cast("double")
    withRisk
      .withColumn("__lt",
        when(col("n_event") > 0L && col("n_event") < col("n_risk"),
          log(step).cast("decimal(28,12)"))
          .otherwise(lit(0).cast("decimal(28,12)")))
      .withColumn("__cumlog", sum(col("__lt")).over(w))
      .withColumn("__cumzero",
        sum(when(col("n_event") === col("n_risk"), 1L).otherwise(0L)).over(w))
      .withColumn("survival",
        when(col("__cumzero") > 0L, lit(0.0))
          .otherwise(round(exp(col("__cumlog").cast("double")), 6)))
      .select(gc :+ col("t") :+ col("n_risk") :+ col("n_event") :+
        col("n_censored") :+ col("survival"): _*)
  }

  /** Two-sample log-rank test per group — "are these two survival
    * curves the same?", the hypothesis-test companion to
    * [[kaplanMeier]] (comparing KM curves by eye is not a test; naive
    * mean-duration comparisons are biased by censoring). At each
    * pooled event time: observed events in sample a vs expected under
    * the null `E = d·n_a/n`, with the hypergeometric variance
    * `V = d·(n_a/n)·(1−n_a/n)·(n−d)/(n−1)`;
    * `χ² = (Σ(O−E))² / ΣV`, `z = Σ(O−E)/√ΣV` (negative z: sample a
    * has FEWER events than expected — better survival).
    *
    * Same plan discipline as [[kaplanMeier]]: one reduction of
    * subjects to per-(group, time) counts with both tags pivoted in
    * the pass, at-risk via one distinct-time window, per-time terms
    * DECIMAL(28,12)-quantized before the order-free sums. Rows with a
    * tag other than `tagA`/`tagB` are ignored; groups where either
    * sample is empty or the variance is zero are dropped.
    */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
              tagCol: String, tagA: String, tagB: String,
              groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "logRank needs at least one group column")
    require(tagA != tagB, "tagA and tagB must differ")
    val gc = groupCols.map(col)
    val ev = col(eventCol).try_cast("boolean")
    val isA = col(tagCol) === tagA
    val rows = df.filter(col(durationCol).isNotNull && ev.isNotNull &&
      (isA || col(tagCol) === tagB))
    val counts = rows.groupBy(gc :+ col(durationCol).as("t"): _*)
      .agg(sum(when(isA && ev, 1L).otherwise(0L)).as("d_a"),
        sum(when(isA && !ev, 1L).otherwise(0L)).as("c_a"),
        sum(when(!isA && ev, 1L).otherwise(0L)).as("d_b"),
        sum(when(!isA && !ev, 1L).otherwise(0L)).as("c_b"))
    val totals = counts.groupBy(gc: _*)
      .agg(sum(col("d_a") + col("c_a")).as("__na"),
        sum(col("d_b") + col("c_b")).as("__nb"))
    val w = Window.partitionBy(gc: _*).orderBy(col("t"))
    val atRisk = FrameOps.statsJoinOn(counts, totals, groupCols)
      .filter(col("__na") > 0L && col("__nb") > 0L)
      .withColumn("__cuma", sum(col("d_a") + col("c_a")).over(w))
      .withColumn("__cumb", sum(col("d_b") + col("c_b")).over(w))
      .withColumn("__ra", col("__na") - col("__cuma") + col("d_a") + col("c_a"))
      .withColumn("__rb", col("__nb") - col("__cumb") + col("d_b") + col("c_b"))
      .withColumn("__d", col("d_a") + col("d_b"))
      .withColumn("__r", col("__ra") + col("__rb"))
      .filter(col("__d") > 0L)
    val pa = col("__ra").cast("double") / col("__r").cast("double")
    val dD = col("__d").cast("double")
    val rD = col("__r").cast("double")
    val oe = col("d_a").cast("double") - dD * pa
    val v = when(col("__r") > 1L,
      dD * pa * (lit(1.0) - pa) * (rD - dD) / (rD - lit(1.0)))
      .otherwise(lit(0.0))
    atRisk
      .withColumn("__oe", oe.cast("decimal(28,12)"))
      .withColumn("__v", v.cast("decimal(28,12)"))
      .groupBy(gc: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("__oe")).cast("double").as("__soe"),
        sum(col("__v")).cast("double").as("__sv"))
      .filter(col("__sv") > 0d)
      .select(gc :+ col("n_a") :+ col("n_b") :+
        round(col("__soe") * col("__soe") / col("__sv"), 6).as("chi2") :+
        round(col("__soe") / sqrt(col("__sv")), 6).as("z"): _*)
  }
}
