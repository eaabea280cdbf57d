package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection: the exact two-sample Kolmogorov–Smirnov
  * statistic per group — `D = sup_x |F_a(x) − F_b(x)|` between the
  * empirical CDFs of the two samples a tag column splits each group
  * into. The standard "did this feature's distribution move between
  * snapshots / sources / cohorts" test, computed EXACTLY and
  * distributed (no sample-to-driver, no binning approximation).
  *
  * Both ECDFs are right-continuous step functions that jump only at
  * observation points, so the sup is the max over DISTINCT observed
  * values of |F_a(x) − F_b(x)| with both counts INCLUSIVE of ties.
  * Decomposition: two [[Ranking.rangeRank]] passes give every row its
  * rank within (group, tag) and within (group); the max rank per
  * (group, tag, value) is the inclusive own-sample count `c_tag(x)`,
  * the max per (group, value) the inclusive union count `c_all(x)`, so
  * the other sample's inclusive count is their difference. Per distinct
  * point, `gap = |c_tag/n_tag − (c_all − c_tag)/n_other|`; the group
  * max over points is exactly D. (Evaluating at each point from the
  * side(s) that observed it covers every distinct union value.) All
  * reductions are map-side-combinable aggregates on (group, value[, tag])
  * keys; the count frames join back as broadcasts.
  */
object Drift {

  /** Output: one row per group — groupCols, `n` (total rows), `ks_stat`
    * (rounded 6 dp). Groups where either sample is empty are dropped
    * (no two-sample comparison exists).
    */
  def ksTest(df: DataFrame, valueCol: String, tagCol: String,
             groupCols: Seq[String], tieCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "ksTest needs at least one group column")
    val base = df.filter(col(valueCol).isNotNull && col(tagCol).isNotNull)
      .select((groupCols :+ tagCol :+ valueCol).map(col) ++
        tieCols.map(col): _*)
    val rOwn = Ranking.rangeRank(base, groupCols :+ tagCol,
      valueCol +: tieCols, "__ks_ro")
    val rAll = Ranking.rangeRank(rOwn, groupCols,
      Seq(valueCol, tagCol) ++ tieCols, "__ks_ra")
    val gc = groupCols.map(col)
    // inclusive ECDF counts at each distinct observed (group, value)
    val cTag = rAll.groupBy(gc :+ col(tagCol) :+ col(valueCol): _*)
      .agg(max(col("__ks_ro")).as("__c_tag"))
    val cAll = rAll.groupBy(gc :+ col(valueCol): _*)
      .agg(max(col("__ks_ra")).as("__c_all"))
    val nOwn = base.groupBy(gc :+ col(tagCol): _*)
      .agg(count(lit(1)).as("__n_own"))
    val nAll = base.groupBy(gc: _*).agg(count(lit(1)).as("__n_all"))
    def joinOn(d: DataFrame, stats: DataFrame, keys: Seq[String],
               broadcastIt: Boolean): DataFrame = {
      val statCols = stats.columns.filterNot(keys.contains).map(col)
      val keyed = stats.select(keys.map(c => col(c).as(s"__k_$c")) ++
        statCols: _*)
      d.join(if (broadcastIt) broadcast(keyed) else keyed,
        keys.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _))
        .drop(keys.map(c => s"__k_$c"): _*)
    }
    // points join on (group, value): co-partitioned aggregates, not
    // broadcast (distinct values scale with the data); count frames are
    // group-cardinality-sized and broadcast
    val points = joinOn(cTag, cAll, groupCols :+ valueCol, broadcastIt = false)
    val withCounts = joinOn(joinOn(points, nOwn, groupCols :+ tagCol,
      broadcastIt = true), nAll, groupCols, broadcastIt = true)
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
}
