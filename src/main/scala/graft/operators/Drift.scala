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
    *
    * Caching caveat: the shared sorted frame [[driftCum]] leaves behind
    * (released by the session cache sweep) is sized ∝ DISTINCT values.
    * For a CONTINUOUS value column distinct ≈ corpus, so a long session
    * running many KS tests over raw continuous metrics accumulates
    * corpus-scale cached state — quantize/bucket such columns first
    * (e.g. `round(v, 4)`; the exact-sup gap over the quantized ECDF is
    * the KS statistic of the quantized distribution, which is what a
    * drift monitor thresholds on anyway), or call
    * `TrackedCaches.release()` between batteries.
    */
  /** The drift battery's SHARED rank pass: per-(group, tag, value)
    * counts with BOTH inclusive cumulative weights — per (group)
    * (`__ca`, the union ECDF count) and per (group, tag) (`__ct`, the
    * per-sample ECDF count) — from ONE range sort over the distinct-
    * value frame.
    *
    * [[ksTest]], [[mannWhitney]], and [[aucByTag]] all build this frame
    * with IDENTICAL plan structure, so a session running the usual
    * battery (KS + MW + AUC over one split) pays the scan-and-count and
    * the range sort ONCE: `rangeRankMulti` persists its sorted frame,
    * and the CacheManager plan-matches the second and third statistics'
    * identical `repartitionByRange → sortWithinPartitions` subtree onto
    * the first's cache (the rank core's input cache is released as soon
    * as its counts job completes — nothing corpus-scale lingers beyond
    * the sorted distinct-value frame, which the session cache sweep
    * releases).
    */
  private def driftCum(df: DataFrame, valueCol: String, tagCol: String,
                       groupCols: Seq[String]): DataFrame = {
    val gc = groupCols.map(col)
    val occ = df.filter(col(valueCol).isNotNull && col(tagCol).isNotNull)
      .groupBy(gc :+ col(tagCol) :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__c"))
    Ranking.rangeRankMulti(occ,
      groupCols ++ Seq(valueCol, tagCol),
      Seq(groupCols, groupCols :+ tagCol), Seq("__ca", "__ct"),
      weightCol = Some("__c"),
      cacheInput = true) // occ is distinct-value-bounded, never raw-sized
  }

  def ksTest(df: DataFrame, valueCol: String, tagCol: String,
             groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "ksTest needs at least one group column")
    val gc = groupCols.map(col)
    val cum = driftCum(df, valueCol, tagCol, groupCols)
    // the union count inclusive of BOTH tags at a value is the max
    // cumulative over the (group, value) micro-partition — one window
    // shuffle, cheaper than a groupBy + self-join on the same key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gc :+ col(valueCol): _*)
    val points = cum
      .withColumn("__c_all", max(col("__ca")).over(w))
      .select(gc :+ col(tagCol) :+ col(valueCol) :+
        col("__ct").as("__c_tag") :+ col("__c_all"): _*)
    // sample sizes are the FINAL cumulative counts — aggregates over the
    // cheap cum frame (its sorted parent is cached), not raw-input passes
    val nOwn = cum.groupBy(gc :+ col(tagCol): _*)
      .agg(max(col("__ct")).as("__n_own"))
    val nAll = cum.groupBy(gc: _*).agg(max(col("__ca")).as("__n_all"))
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

  /** Optimal decision threshold per group by Youden's J (the
    * operating-point selector an [[auc]] number doesn't give): over
    * candidate thresholds t = observed scores with the rule "positive
    * iff score > t", J(t) = TPR − FPR = cumNeg(≤t)/N − cumPos(≤t)/P;
    * the maximizer is exactly the KS argmax between the class score
    * distributions. `posTag`-vs-REST semantics: every other tag counts
    * negative (tags are lumped before the rank pass, so this does NOT
    * plan-share the strict-two-tag battery's [[driftCum]] cache).
    * Ties break to the smallest threshold. Groups missing either class
    * are dropped.
    *
    * Exactness: cumulative counts are exact longs from the rank core's
    * weighted prefix sums; TPR/FPR/J are fixed double trees; the
    * argmax is a per-group window over the distinct-score frame (the
    * cusum argmax shape).
    */
  def bestThreshold(df: DataFrame, scoreCol: String, tagCol: String,
                    posTag: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "bestThreshold needs at least one group column")
    val gc = groupCols.map(col)
    val lumped = df.filter(col(scoreCol).isNotNull && col(tagCol).isNotNull)
      .withColumn("__bt_tag",
        when(col(tagCol) === lit(posTag), "pos").otherwise("neg"))
    val cum = driftCum(lumped, scoreCol, "__bt_tag", groupCols)
    // ONE hash aggregation to per-score points: where a tag has no row
    // at a score, its inclusive cumulative is implied by the union
    // cumulative minus the other tag's (__ca counts BOTH tags ≤ score
    // regardless of row existence). The previous form computed the same
    // pairs row-wise under a (group, score) micro-WINDOW and collapsed
    // the two tags' identical rows with distinct() — one exchange+sort
    // plus one exchange more than this aggregate (round-8 profile).
    val points = cum
      .groupBy(gc :+ col(scoreCol): _*)
      .agg(max(col("__ca")).as("__c_all"),
        max(when(col("__bt_tag") === "pos", col("__ct"))).as("__ctp"),
        max(when(col("__bt_tag") === "neg", col("__ct"))).as("__ctn"))
      .select(gc :+ col(scoreCol) :+
        coalesce(col("__ctp"), col("__c_all") - col("__ctn")).as("__cp") :+
        coalesce(col("__ctn"), col("__c_all") - col("__ctp")).as("__cn"): _*)
    val totals = cum.groupBy(gc :+ col("__bt_tag"): _*)
      .agg(max(col("__ct")).as("__n"))
      .groupBy(gc: _*)
      .agg(max(when(col("__bt_tag") === "pos", col("__n"))).as("__p"),
        max(when(col("__bt_tag") === "neg", col("__n"))).as("__nn"))
      .filter(col("__p").isNotNull && col("__nn").isNotNull)
    val j = (col("__cn").cast("double") / col("__nn").cast("double")) -
      (col("__cp").cast("double") / col("__p").cast("double"))
    val wArg = org.apache.spark.sql.expressions.Window
      .partitionBy(gc: _*).orderBy(j.desc, col(scoreCol))
    FrameOps.statsJoinOn(points, totals, groupCols)
      .withColumn("__rn", row_number().over(wArg))
      .filter(col("__rn") === 1)
      .select(gc ++ Seq(col("__p").as("n_pos"), col("__nn").as("n_neg"),
        col(scoreCol).as("threshold"),
        round((col("__p") - col("__cp")).cast("double") /
          col("__p").cast("double"), 6).as("tpr"),
        round((col("__nn") - col("__cn")).cast("double") /
          col("__nn").cast("double"), 6).as("fpr"),
        round(j, 6).as("youden_j")): _*)
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
    // the SAME shared pass ksTest runs (plan-identical → cache-shared):
    // the inclusive union cumulative at a value is max(__ca) over the
    // (group, value) micro-partition, the tie size t is the sum of the
    // per-tag counts there, and the midrank follows directly —
    // C(v) − (t−1)/2. No occ-side join: every row of cum already
    // carries its tag's count __c, so rank sums aggregate in place.
    val cum = driftCum(df, valueCol, tagCol, groupCols)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gc :+ col(valueCol): _*)
    val mid = cum
      .withColumn("__t", sum(col("__c")).over(w))
      .withColumn("__mid", max(col("__ca")).over(w).cast("double") -
        (col("__t").cast("double") - 1d) / 2d)
    val rankSums = mid.groupBy(gc :+ col(tagCol): _*)
      .agg(sum(col("__c")).as("__n_tag"),
        sum((col("__c") * col("__mid")).cast("decimal(28,6)")).as("__rsum"))
    // Σ(t³−t) needs each distinct value ONCE — collapse the ≤|tags|
    // rows per (group, value) before the fold
    val tieTerm = mid.groupBy(gc :+ col(valueCol): _*)
      .agg(max(col("__t")).as("__tv"))
      .groupBy(gc: _*)
      .agg(sum(col("__tv") * col("__tv") * col("__tv") - col("__tv"))
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
    aucByTag(tagged, scoreCol, "__auc_tag", "pos", groupCols)
  }

  /** [[auc]] over an ALREADY-TAGGED two-sample frame: rows whose
    * `tagCol` equals `posTag` are the positives, the (single) other tag
    * the negatives. Same output as [[auc]] — groupCols, n_pos, n_neg,
    * auc — but because the (df, valueCol, tagCol, groupCols) tuple can
    * match a [[ksTest]]/[[mannWhitney]] call exactly, a drift battery
    * that tags once and runs all three statistics shares ONE
    * [[driftCum]] rank pass across them ([[auc]]'s internal pos/neg
    * relabel builds a different plan and forfeits that reuse).
    * `U_pos = U_a` when the positive tag sorts first, else
    * `n_a·n_b − U_a`; groups lacking either class are dropped by the
    * two-sample pivot.
    */
  def aucByTag(df: DataFrame, scoreCol: String, tagCol: String,
               posTag: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "aucByTag needs at least one group column")
    val mw = mannWhitney(df, scoreCol, tagCol, groupCols)
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val posIsA = col("tag_a") === lit(posTag)
    mw.filter(posIsA || col("tag_b") === lit(posTag))
      .select(groupCols.map(col) :+
        when(posIsA, col("n_a")).otherwise(col("n_b")).as("n_pos") :+
        when(posIsA, col("n_b")).otherwise(col("n_a")).as("n_neg") :+
        round(when(posIsA, col("u_stat"))
          .otherwise(na * nb - col("u_stat")) / (na * nb), 6).as("auc"): _*)
  }

  /** Reliability diagram per group: bin predicted probabilities into
    * `k` equal-width bins over [0, 1] (`bin = min(⌊s·k⌋, k−1)`) and
    * report, per occupied bin, the count, the DECIMAL-exact mean
    * predicted probability, and the observed positive fraction — the
    * calibration evidence behind an [[auc]] number (AUC measures
    * ranking; a model can rank perfectly and still be miscalibrated).
    * `ECE = Σ (n_i/N)·|frac_pos_i − mean_score_i|` is one further
    * aggregation over this output. One map-side-combinable aggregate;
    * output is k-bounded per group.
    *
    * Contract: rows with score outside [0, 1], a null score, or a
    * label that does not cast to boolean are dropped (same label rule
    * as [[auc]]).
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  groupCols: Seq[String], k: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "calibration needs at least one group column")
    require(k >= 2, s"k must be >= 2, got $k")
    val gc = groupCols.map(col)
    val s = col(scoreCol).cast("double")
    val rows = df
      .filter(s.isNotNull && s >= 0d && s <= 1d &&
        col(labelCol).try_cast("boolean").isNotNull)
      .withColumn("__y",
        when(col(labelCol).try_cast("boolean"), 1L).otherwise(0L))
      .withColumn("__bin", least(floor(s * k).cast("long"), lit((k - 1).toLong)))
    rows.groupBy(gc :+ col("__bin").as("bin"): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(s.cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("mean_score"),
        round(sum(col("__y")).cast("double") / count(lit(1)), 6).as("frac_pos"))
  }

  /** Expected Calibration Error per group — `Σ (n_i/N)·|frac_pos_i −
    * mean_score_i|` over the [[calibration]] bins: the one-number
    * miscalibration summary next to [[brierScore]]'s proper score. Terms
    * are built from the bins' already-6dp-rounded rates and DECIMAL-
    * quantized before the k-bounded sum, so the result is order-free
    * and engine-portable. Cost: [[calibration]]'s single aggregate plus
    * two group-cardinality passes over the k·groups bin frame.
    */
  def ece(df: DataFrame, scoreCol: String, labelCol: String,
          groupCols: Seq[String], k: Int = 10): DataFrame = {
    val gc = groupCols.map(col)
    val cal = calibration(df, scoreCol, labelCol, groupCols, k)
    val tot = cal.groupBy(gc: _*).agg(sum(col("n")).as("__N"))
    FrameOps.statsJoinOn(cal, tot, groupCols)
      .withColumn("__term",
        (col("n").cast("double") / col("__N").cast("double")) *
          abs(col("frac_pos") - col("mean_score")))
      .groupBy(gc: _*)
      .agg(max(col("__N")).as("n"),
        round(sum(col("__term").cast("decimal(28,12)")).cast("double"), 6)
          .as("ece"))
  }

  /** Brier score per group — `mean((s − y)²)`, the proper scoring rule
    * summarizing calibration AND sharpness in one number (0 perfect,
    * 0.25 = always-predict-0.5). Squared errors are DECIMAL-quantized
    * before the order-free sum; same row contract as [[calibration]].
    */
  def brierScore(df: DataFrame, scoreCol: String, labelCol: String,
                 groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "brierScore needs at least one group column")
    val gc = groupCols.map(col)
    val s = col(scoreCol).cast("double")
    df.filter(s.isNotNull && s >= 0d && s <= 1d &&
        col(labelCol).try_cast("boolean").isNotNull)
      .withColumn("__e2",
        ((s - when(col(labelCol).try_cast("boolean"), 1d).otherwise(0d)) *
          (s - when(col(labelCol).try_cast("boolean"), 1d).otherwise(0d)))
          .cast("decimal(28,12)"))
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"),
        round(sum(col("__e2")).cast("double") / count(lit(1)), 6).as("brier"))
  }

  /** Population Stability Index per group — the production drift
    * monitor (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted):
    * bin edges are the REFERENCE sample's `k`-quantiles, both samples
    * are binned against those edges, and
    * `PSI = Σ_bins (p_cmp − p_ref) · ln(p_cmp / p_ref)`.
    * Complements [[ksTest]]: KS is the exact sup-gap (sensitive
    * anywhere); PSI is the binned magnitude summary risk teams
    * threshold on.
    *
    * Determinism/portability: edges are exact interpolated percentiles
    * ROUNDED 6 dp (the [[Outliers.madOutliers]] parity rule — Spark
    * `percentile` ≡ DuckDB `quantile_cont` on identical doubles); bin
    * assignment is `Σ_j [x > e_j]` — a fixed comparison tree; bin
    * counts get +`smoothing` (default 0.5) so an empty comparison bin
    * contributes a finite, engine-identical term; per-bin terms are
    * DECIMAL(28,12)-quantized before the order-free sum.
    *
    * Plan shape: one percentile aggregate over the reference rows (rows
    * out = groups; exact percentile buffers value→count per group — at
    * petabyte scale precompute edges via `approx_percentile` and feed a
    * fixed-edge variant), edges joined back group-cardinality-sized
    * (AQE picks broadcast), one (group, tag, bin) count aggregate
    * (map-side combinable), then a fixed-k per-group fold. Rows with a
    * tag other than `refTag`/`cmpTag` or a null value are ignored.
    * Output: one row per group — n_ref, n_cmp, psi (6 dp).
    */
  def psi(df: DataFrame, valueCol: String, tagCol: String,
          refTag: String, cmpTag: String,
          groupCols: Seq[String], k: Int = 10,
          smoothing: Double = 0.5): DataFrame = {
    require(groupCols.nonEmpty, "psi needs at least one group column")
    require(k >= 2, s"k must be >= 2, got $k")
    require(refTag != cmpTag, "refTag and cmpTag must differ")
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    val gc = groupCols.map(col)
    val v = col(valueCol)
    val rows = df.filter(v.isNotNull &&
      (col(tagCol) === refTag || col(tagCol) === cmpTag))
    // k-1 interior edges from the reference sample, one agg pass with
    // ONE shared percentile buffer: the array-percentage form keeps a
    // single value→count map per group where k-1 scalar percentile
    // aggregates would each keep their own copy (measured ~2.5x on the
    // whole query at k=10) — identical interpolated values either way.
    // Column API throughout (string interpolation would break on quoted
    // column names / tag values containing quotes).
    val pcts = array((1 until k).map(i => lit(i.toDouble / k)): _*)
    val edges = rows.groupBy(gc: _*)
      .agg(percentile(when(col(tagCol) === refTag, v), pcts).as("__es"))
      .select(gc ++ (1 until k).map(i =>
        round(element_at(col("__es"), i), 6).as(s"__e$i")): _*)
    // bin = how many edges are strictly below x: fixed comparison tree
    val binExpr = (1 until k).map(i =>
      when(v > col(s"__e$i"), 1L).otherwise(0L)).reduce(_ + _)
    val binned = FrameOps.statsJoinOn(rows, edges, groupCols)
      .withColumn("__bin", binExpr)
      .groupBy(gc :+ col(tagCol) :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__c"))
    // pivot ref/cmp counts per (group, bin), then fill to ALL k bins —
    // the standard PSI sums every quantile bin, and an unoccupied bin
    // still contributes its smoothing-only term
    val perBin = binned.groupBy(gc :+ col("__bin"): _*)
      .agg(sum(when(col(tagCol) === refTag, col("__c")).otherwise(0L)).as("__cr"),
        sum(when(col(tagCol) === cmpTag, col("__c")).otherwise(0L)).as("__cc"))
    val totals = perBin.groupBy(gc: _*)
      .agg(sum(col("__cr")).as("__nr"), sum(col("__cc")).as("__nc"))
    val allBins = totals.select(gc :+
      explode(sequence(lit(0L), lit((k - 1).toLong))).as("__bin"): _*)
    val keyedCounts = perBin.select(
      groupCols.map(c => col(c).as(s"__k_$c")) :+
        col("__bin").as("__k_bin") :+ col("__cr") :+ col("__cc"): _*)
    val filled = allBins.join(keyedCounts,
        groupCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _) &&
          col("__bin") === col("__k_bin"), "left")
      .select(gc :+ col("__bin") :+
        coalesce(col("__cr"), lit(0L)).as("__cr") :+
        coalesce(col("__cc"), lit(0L)).as("__cc"): _*)
    val pr = (col("__cr").cast("double") + smoothing) /
      (col("__nr").cast("double") + smoothing * k)
    val pc = (col("__cc").cast("double") + smoothing) /
      (col("__nc").cast("double") + smoothing * k)
    FrameOps.statsJoinOn(filled, totals, groupCols)
      .withColumn("__t", ((pc - pr) * log(pc / pr)).cast("decimal(28,12)"))
      .groupBy(gc: _*)
      .agg(max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cmp"),
        round(sum(col("__t")).cast("double"), 6).as("psi"))
      .filter(col("n_ref") > 0L && col("n_cmp") > 0L)
  }

  /** Seasonal-baseline volume anomalies over an event stream: bucket
    * counts per (epoch day, hour-of-day), a per-hour-of-day baseline
    * (each bucket compared against the same hour ACROSS ALL days —
    * the scored bucket's own day included, so a spike slightly inflates
    * its own baseline; leave-one-out would sharpen short histories at
    * the cost of a per-bucket correction term), and a z-score per
    * bucket;
    * buckets with `|z| ≥ threshold` are the anomalies. Day/hour derive
    * arithmetically from epoch microseconds (integer DIV/mod — no
    * calendar/timezone functions, bit-identical across engines).
    *
    * The baseline is a [[AggState]] reduction of the bucket-count frame
    * — two map-side-combinable aggregations total, then a join of the
    * bucket frame against the 24-row baseline (structurally small; AQE
    * broadcasts it). Hours with zero events produce no bucket row and
    * so don't deflate the baseline (document-absence semantics; a
    * calendar spine would be the alternative). Hour keys observed on
    * only one day have no sample stddev and are dropped.
    * Output: epoch_day, hour, cnt, mean_cnt, std_cnt, z (6 dp).
    */
  def seasonalAnomalies(df: DataFrame, tsCol: String,
                        threshold: Double = 2.0): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val counts = df.filter(col(tsCol).isNotNull)
      .select(unix_micros(col(tsCol)).as("__us"))
      .select(expr("__us DIV 86400000000").as("epoch_day"),
        expr("(__us DIV 3600000000) % 24").as("hour"))
      .groupBy(col("epoch_day"), col("hour"))
      .agg(count(lit(1)).as("cnt"))
    val baseline = AggState.state(counts, Seq("hour"), "cnt")
    val nd = col("n").cast("double")
    val sd = col("s").cast("double")
    val s2d = col("s2").cast("double")
    val mean = sd / nd
    val std = sqrt(greatest((s2d - sd * sd / nd) / (nd - lit(1.0)), lit(0.0)))
    val z = (col("cnt").cast("double") - mean) / std
    counts.join(baseline, Seq("hour"))
      .filter(col("n") > 1L && std > 0.0 && abs(z) >= threshold)
      .select(col("epoch_day"), col("hour"), col("cnt"),
        round(mean, 6).as("mean_cnt"), round(std, 6).as("std_cnt"),
        round(z, 6).as("z"))
  }

  /** CUSUM change-point scan per group: the standardized maximum of the
    * cumulative mean-deviation process,
    * `C = max_t |Σ_{i≤t}(x_i − μ)| / (σ√N)`, with the timestamp where
    * the max is attained (the change-point estimate; Brownian-bridge
    * null, same ~1.36/1.63 reference levels as KS). The series order is
    * event time; all rows sharing a timestamp enter together.
    *
    * Same scale shape as [[ksTest]]: raw rows reduce ONCE to
    * per-(group, timestamp) sums (map-side combinable), then the
    * cumulative process comes from [[Ranking.rangeRankMulti]] weighted
    * prefix sums over the distinct-timestamp frame — the weighted mode
    * is a mechanical long prefix sum, so the DECIMAL(18,6)-quantized
    * micro-units (engine-exact, mirrored in the oracle) may be
    * negative. Zero-variance groups are dropped (no change evidence is
    * definable). Output: groupCols, `n`, `cusum_stat`, `change_us`.
    */
  def cusum(df: DataFrame, valueCol: String, tsCol: String,
            groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "cusum needs at least one group column")
    val gc = groupCols.map(col)
    val wq = (col(valueCol).cast("decimal(18,6)") * lit(1000000)).cast("long")
    val pre = df.filter(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(gc :+ unix_micros(col(tsCol)).as("us"): _*)
      .agg(sum(wq).as("__w"), count(lit(1)).as("__n"),
        sum((col(valueCol) * col(valueCol)).cast("decimal(30,6)")).as("__ss"))
    val cumW = Ranking.rangeRankMulti(pre, groupCols :+ "us",
      Seq(groupCols), Seq("__cw"), weightCol = Some("__w"),
      cacheInput = true) // pre ∝ distinct (group, ts) — bounded
    val cum = Ranking.rangeRankMulti(cumW, groupCols :+ "us",
      Seq(groupCols), Seq("__cn"), weightCol = Some("__n"),
      cacheInput = true) // same bounded cardinality as pre
    // totals from the cum frame itself (last-by-time, NOT max: the
    // quantized weights can be negative, so __cw is not monotone)
    val totals = cum.groupBy(gc: _*)
      .agg(max_by(col("__cw"), col("us")).as("__tw"),
        max_by(col("__cn"), col("us")).as("__tn"),
        sum(col("__ss")).as("__tss"))
    val j = FrameOps.statsJoinOn(cum, totals, groupCols)
    val tnD = col("__tn").cast("double")
    val twD = col("__tw").cast("double")
    val meanX = (twD / tnD) / lit(1000000.0)
    val varP = col("__tss").cast("double") / tnD - meanX * meanX
    val sAbs = abs((col("__cw").cast("double") -
      col("__cn").cast("double") * (twD / tnD)) / lit(1000000.0))
    val c = sAbs / (sqrt(varP) * sqrt(tnD))
    j.filter(varP > 0d)
      .withColumn("__c", c)
      .groupBy(gc: _*)
      .agg(max(col("__tn")).as("n"),
        min(struct((col("__c") * lit(-1.0)).as("nc"), col("us").as("us")))
          .as("__b"))
      .select(gc :+ col("n") :+
        round(col("__b.nc") * lit(-1.0), 6).as("cusum_stat") :+
        col("__b.us").as("change_us"): _*)
  }
}
