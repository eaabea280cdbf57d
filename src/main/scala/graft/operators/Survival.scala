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
}
