package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection: exact two-sample tests per group,
  * computed distributed (no sample-to-driver, no binning) — the
  * Kolmogorov–Smirnov statistic (any shape change) and the Mann–Whitney
  * U rank-sum test (stochastic dominance / location shift).
  *
  * Both reduce the data ONCE to per-distinct-value counts (a map-side-
  * combinable aggregate), then run [[Ranking.rangeRankMulti]] in its
  * weighted prefix-sum form over that far smaller frame: the cumulative
  * weight at each distinct (group, value) IS the inclusive ECDF count.
  * Raw rows are touched exactly once; everything after is
  * distinct-value-sized.
  */
object Drift {

  /** Exact two-sample Kolmogorov–Smirnov statistic per group:
    * `D = sup_x |F_a(x) − F_b(x)|` between the ECDFs of the two samples
    * `tagCol` splits each group into. Both ECDFs are right-continuous
    * step functions jumping only at observation points, so the sup is
    * the max over distinct observed values of the gap with both counts
    * INCLUSIVE of ties — evaluated at each point from the side(s) that
    * observed it, which covers every distinct union value.
    *
    * Output: one row per group — groupCols, `n` (total rows), `ks_stat`
    * (rounded 6 dp). Groups without EXACTLY two tags are dropped — the
    * same contract [[mannWhitney]] and `Stats.welchTTest` enforce (a
    * two-sample statistic is undefined otherwise; silently comparing
    * each tag against the pooled rest would diverge from the SQL
    * mirror).
    */
  def ksTest(df: DataFrame, valueCol: String, tagCol: String,
             groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "ksTest needs at least one group column")
    val gc = groupCols.map(col)
    val occ = df.filter(col(valueCol).isNotNull && col(tagCol).isNotNull)
      .groupBy(gc :+ col(tagCol) :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__c"))
    // ONE weighted prefix-sum pass over the distinct-value frame gives
    // both inclusive cumulative counts: per (group) and per (group, tag)
    val cum = Ranking.rangeRankMulti(occ,
      groupCols ++ Seq(valueCol, tagCol),
      Seq(groupCols, groupCols :+ tagCol), Seq("__ks_ca", "__ks_ct"),
      weightCol = Some("__c"))
    // the union count inclusive of BOTH tags at a value is the max
    // cumulative over the (group, value) micro-partition — one window
    // shuffle, cheaper than a groupBy + self-join on the same key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gc :+ col(valueCol): _*)
    val points = cum
      .withColumn("__c_all", max(col("__ks_ca")).over(w))
      .select(gc :+ col(tagCol) :+ col(valueCol) :+
        col("__ks_ct").as("__c_tag") :+ col("__c_all"): _*)
    // sample sizes are the FINAL cumulative counts — aggregates over the
    // cached cum frame, not extra passes over the raw input
    val nOwn = cum.groupBy(gc :+ col(tagCol): _*)
      .agg(max(col("__ks_ct")).as("__n_own"))
    val nAll = cum.groupBy(gc: _*).agg(max(col("__ks_ca")).as("__n_all"))
    // enforce the two-sample contract: count tags per group (nOwn is
    // already one row per (group, tag)) and keep groups with exactly two
    val nTags = nOwn.groupBy(gc: _*).agg(count(lit(1)).as("__n_tags"))
    // count frames are group-cardinality-sized; AQE picks the join
    val withCounts = FrameOps.statsJoinOn(
      FrameOps.statsJoinOn(
        FrameOps.statsJoinOn(points, nOwn, groupCols :+ tagCol),
        nAll, groupCols),
      nTags, groupCols)
      .filter(col("__n_tags") === 2L)
      .withColumn("__n_other", col("__n_all") - col("__n_own"))
      .filter(col("__n_other") > 0L)
    withCounts
      .withColumn("__gap", abs(
        col("__c_tag").cast("double") / col("__n_own") -
          (col("__c_all") - col("__c_tag")).cast("double") / col("__n_other")))
      .groupBy(gc: _*)
      .agg(max(col("__n_all")).as("n"),
        round(max(col("__gap")), 6).as("ks_stat"))
  }

  /** Exact Mann–Whitney U rank-sum test per group — the nonparametric
    * location-shift companion to [[ksTest]]. Standard midranks: tied
    * values across BOTH samples share the average of their positions,
    * `midrank(v) = C(v) − (t(v) − 1)/2` where C is the inclusive
    * cumulative union count (the weighted prefix sum) and t the tie
    * size — an exact dyadic rational. `U = Σ midranks(sample a) −
    * n_a(n_a+1)/2`; the normal approximation `z` applies the full tie
    * correction `Σ(t³−t)`. Midrank sums run through DECIMAL(28,6) —
    * exact and order-independent. Sample `a` is the lexicographically
    * smaller tag; groups without EXACTLY two samples are dropped (a
    * two-sample statistic is undefined otherwise).
    */
  def mannWhitney(df: DataFrame, valueCol: String, tagCol: String,
                  groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "mannWhitney needs at least one group column")
    val gc = groupCols.map(col)
    // occ feeds both the midrank path (via vals) and the rank-sum join —
    // persist so the raw input is scanned once
    val occ = TrackedCaches.track(
      df.filter(col(valueCol).isNotNull && col(tagCol).isNotNull)
        .groupBy(gc :+ col(tagCol) :+ col(valueCol): _*)
        .agg(count(lit(1)).as("__c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val vals = occ.groupBy(gc :+ col(valueCol): _*)
      .agg(sum(col("__c")).as("__t"))
    val cum = Ranking.rangeRankMulti(vals, groupCols :+ valueCol,
      Seq(groupCols), Seq("__mw_cu"), weightCol = Some("__t"))
    val mid = cum.select(gc :+ col(valueCol) :+ col("__t") :+
      (col("__mw_cu").cast("double") -
        (col("__t").cast("double") - 1d) / 2d).as("__mid"): _*)
    val keyedMid = mid.select(
      (groupCols :+ valueCol).map(c => col(c).as(s"__k_$c")) :+
        col("__mid") :+ col("__t"): _*)
    val joined = occ.join(keyedMid,
      (groupCols :+ valueCol).map(c => col(c) <=> col(s"__k_$c"))
        .reduce(_ && _))
    val rankSums = joined.groupBy(gc :+ col(tagCol): _*)
      .agg(sum(col("__c")).as("__n_tag"),
        sum((col("__c") * col("__mid")).cast("decimal(28,6)")).as("__rsum"))
    val tieTerm = mid.groupBy(gc: _*)
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .as("__tie3"))
    val both = FrameOps.statsJoinOn(
      FrameOps.twoSamplePivot(rankSums, groupCols, tagCol,
        Seq("__n_tag", "__rsum")),
      tieTerm, groupCols)
    val na = col("__n_tag_a").cast("double")
    val nb = col("__n_tag_b").cast("double")
    val nTot = na + nb
    val u = col("__rsum_a").cast("double") - na * (na + 1d) / 2d
    val varU = na * nb / 12d *
      ((nTot + 1d) - col("__tie3").cast("double") / (nTot * (nTot - 1d)))
    both
      .withColumn("u_stat", u)
      .withColumn("z", when(varU > 0d,
        round((u - na * nb / 2d) / sqrt(varU), 6)))
      .select(gc :+ col(s"${tagCol}_a").as("tag_a") :+
        col(s"${tagCol}_b").as("tag_b") :+ col("__n_tag_a").as("n_a") :+
        col("__n_tag_b").as("n_b") :+ col("u_stat") :+ col("z"): _*)
  }

  /** Exact ROC-AUC per group: `P(score⁺ > score⁻) + ½·P(score⁺ =
    * score⁻)`, which is exactly `U_pos / (n_pos · n_neg)` — the
    * probabilistic identity that makes AUC a one-liner over
    * [[mannWhitney]]'s midrank machinery (ties contribute the half by
    * construction). No threshold sweep, no curve materialization, no
    * sampling: the exact statistic, distributed. `labelCol` is cast to
    * boolean (true = positive); groups lacking either class are dropped.
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String,
          groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "auc needs at least one group column")
    // rows whose label does not cast to a boolean are dropped, not
    // silently counted as negatives (try_cast: ANSI cast would throw)
    val tagged = df.filter(col(labelCol).try_cast("boolean").isNotNull)
      .withColumn("__auc_tag",
        when(col(labelCol).try_cast("boolean"), "pos").otherwise("neg"))
    // tag_a is always "neg" (lexicographic), so u_stat is U_neg and
    // U_pos = n_a·n_b − U_neg
    val mw = mannWhitney(tagged, scoreCol, "__auc_tag", groupCols)
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    mw.select(groupCols.map(col) :+ col("n_b").as("n_pos") :+
      col("n_a").as("n_neg") :+
      round((na * nb - col("u_stat")) / (na * nb), 6).as("auc"): _*)
  }
}
