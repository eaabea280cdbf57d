package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classical hypothesis-test statistics as distributed aggregations —
  * the "is this difference real" layer over Profile's descriptive
  * stats. Everything reduces to map-side-combinable group counts or
  * decimal-exact sums; no sampling, no driver-side data.
  */
object Stats {

  /** Contingency scaffolding shared by [[chiSquare]] and
    * [[mutualInformation]]: per-cell counts plus both margins — one
    * definition so a null-filter or aggregation fix lands in both.
    */
  private def contingency(df: DataFrame, aCol: String, bCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowM = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__ra"))
    val colM = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__cb"))
    (cells, rowM, colM)
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, plus Cramér's V effect size. One contingency aggregation
    * (shuffle on the pair), margins re-aggregated from it and joined
    * back (category-cardinality frames — AQE broadcasts them when the
    * columns are genuinely categorical, and degrades to a shuffle join
    * rather than an OOM if a caller passes a high-cardinality column);
    * expected counts are exact integer ratios in double. Output: one
    * row — n, dof, chi2, cramers_v (6 dp).
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val (cells, rowM, colM) = contingency(df, aCol, bCol)
    val total = cells.agg(sum(col("__o")).as("__n"),
      countDistinct(col("__a")).as("__ka"),
      countDistinct(col("__b")).as("__kb"))
    val e = col("__ra").cast("double") * col("__cb") / col("__n")
    cells
      .join(rowM, "__a")
      .join(colM, "__b")
      .crossJoin(broadcast(total))
      .withColumn("__term",
        ((col("__o") - e) * (col("__o") - e) / e).cast("decimal(28,6)"))
      .agg(max(col("__n")).as("n"),
        ((max(col("__ka")) - 1) * (max(col("__kb")) - 1)).as("dof"),
        round(sum(col("__term")).cast("double"), 6).as("chi2"),
        round(sqrt(sum(col("__term")).cast("double") / (max(col("__n")) *
          least(max(col("__ka")) - 1, max(col("__kb")) - 1))), 6)
          .as("cramers_v"))
  }

  /** Mutual information between two categorical columns, in nats, with
    * the marginal entropies and the normalized variant
    * `NMI = MI / √(H_a·H_b)` — the information-theoretic companion to
    * [[chiSquare]] (feature-redundancy / clustering-agreement metric).
    * Same plan shape: one contingency shuffle, margins re-aggregated
    * and joined back (AQE picks broadcast for genuinely categorical
    * columns); every ln argument is a ratio of exact counts
    * (widened to double BEFORE multiplying, so no 64-bit overflow at
    * any scale), and per-cell terms are decimal-quantized before the
    * order-independent sum. Output one row: n, h_a, h_b, mi, nmi (6 dp).
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val (cells, rowM, colM) = contingency(df, aCol, bCol)
    val total = cells.agg(sum(col("__o")).as("__n"))
    def entropy(m: DataFrame, cnt: String): DataFrame = {
      val p = col(cnt).cast("double") / col("__n")
      m.crossJoin(broadcast(total))
        .withColumn("__t", (-p * log(p)).cast("decimal(28,12)"))
        .agg(round(sum(col("__t")).cast("double"), 6).as("h"))
    }
    val miTermArg = (col("__o").cast("double") * col("__n")) /
      (col("__ra").cast("double") * col("__cb"))
    val mi = cells
      .join(rowM, "__a")
      .join(colM, "__b")
      .crossJoin(broadcast(total))
      .withColumn("__t",
        ((col("__o").cast("double") / col("__n")) * log(miTermArg))
          .cast("decimal(28,12)"))
      .agg(max(col("__n")).as("n"),
        round(sum(col("__t")).cast("double"), 6).as("mi"))
    mi.crossJoin(broadcast(entropy(rowM, "__ra").withColumnRenamed("h", "h_a")))
      .crossJoin(broadcast(entropy(colM, "__cb").withColumnRenamed("h", "h_b")))
      // empty input: a global agg still emits one all-null row, but "no
      // data" must be zero rows (matching a GROUP BY SQL mirror)
      .filter(col("n").isNotNull)
      .select(col("n"), col("h_a"), col("h_b"), col("mi"),
        when(col("h_a") > 0d && col("h_b") > 0d,
          round(col("mi") / sqrt(col("h_a") * col("h_b")), 6)).as("nmi"))
  }

  /** Jensen–Shannon divergence per group between the `catCol`
    * distributions of two samples — the symmetric, bounded (≤ ln 2)
    * categorical drift measure (KL's asymmetry and infinities make it
    * unusable as a monitor when categories appear/disappear):
    * `JS = ½·KL(p‖m) + ½·KL(q‖m)`, `m = (p+q)/2`. Zeros need no
    * smoothing: a category absent from one side contributes only the
    * other side's finite term (0·ln 0 ≡ 0, and m > 0 whenever either
    * side is).
    *
    * Plan shape: ONE (group, category) count aggregate over the input
    * (map-side combinable, both tags pivoted in the same pass), totals
    * re-aggregated category-cardinality-sized and joined back (AQE
    * decides); per-category terms are exact-integer-ratio doubles in a
    * fixed tree, DECIMAL(28,12)-quantized before the order-free sum.
    * Output: one row per group — n_ref, n_cmp, js (6 dp, nats).
    */
  def jsDivergence(df: DataFrame, catCol: String, tagCol: String,
                   refTag: String, cmpTag: String,
                   groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "jsDivergence needs at least one group column")
    require(refTag != cmpTag, "refTag and cmpTag must differ")
    val gc = groupCols.map(col)
    val counts = df
      .filter(col(catCol).isNotNull &&
        (col(tagCol) === refTag || col(tagCol) === cmpTag))
      .groupBy(gc :+ col(catCol).as("__v"): _*)
      .agg(sum(when(col(tagCol) === refTag, 1L).otherwise(0L)).as("__cr"),
        sum(when(col(tagCol) === cmpTag, 1L).otherwise(0L)).as("__cc"))
    val totals = counts.groupBy(gc: _*)
      .agg(sum(col("__cr")).as("__nr"), sum(col("__cc")).as("__nc"))
    val p = col("__cr").cast("double") / col("__nr")
    val q = col("__cc").cast("double") / col("__nc")
    val m = (p + q) / 2d
    val term = (when(col("__cr") > 0L, p * log(p / m)).otherwise(0d) +
      when(col("__cc") > 0L, q * log(q / m)).otherwise(0d)) / 2d
    FrameOps.statsJoinOn(counts, totals, groupCols)
      // drop one-sided groups BEFORE the term projection: under ANSI
      // mode even the guarded branch's m = (p+q)/2 would evaluate q's
      // cc/0 division for a group with no cmp rows
      .filter(col("__nr") > 0L && col("__nc") > 0L)
      .withColumn("__t", term.cast("decimal(28,12)"))
      .groupBy(gc: _*)
      .agg(max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cmp"),
        round(sum(col("__t")).cast("double"), 6).as("js"))
  }

  /** Cohen's kappa inter-rater agreement between two categorical label
    * columns (annotator consistency, labeler-vs-model agreement — the
    * QA gate of any labeling pipeline): `κ = (p_o − p_e) / (1 − p_e)`
    * with `p_o` the observed agreement rate and `p_e` the chance
    * agreement implied by the raters' marginals.
    *
    * Same plan family as [[chiSquare]]: ONE contingency aggregation
    * (map-side combinable), marginals re-aggregated from the cell frame
    * and joined label-to-label (labels only one rater ever uses
    * contribute zero chance mass — inner join). The marginal products
    * widen to DECIMAL(19,0)×DECIMAL(19,0) = DECIMAL(38,0) before the
    * order-free sum — no 64-bit overflow at any scale; `n²` runs in
    * double. Rows with a null label on either side are dropped.
    * Output one row: n, po, pe, kappa (6 dp; kappa null when p_e = 1 —
    * a single label saturates chance agreement and κ is undefined).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val (cells, rowM, colM) = contingency(df, aCol, bCol)
    val totals = cells.agg(sum(col("__o")).as("__n"),
      sum(when(col("__a") === col("__b"), col("__o"))).as("__agree"))
    val peNum = rowM.join(colM, col("__a") === col("__b"))
      .agg(sum(col("__ra").cast("decimal(19,0)") *
        col("__cb").cast("decimal(19,0)")).as("__pe_num"))
    val po = coalesce(col("__agree"), lit(0L)).cast("double") /
      col("__n").cast("double")
    val pe = coalesce(col("__pe_num"), lit(0L)).cast("double") /
      (col("__n").cast("double") * col("__n").cast("double"))
    totals.join(peNum, lit(true))
      .select(col("__n").cast("long").as("n"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        when(lit(1.0) - pe =!= 0.0,
          round((po - pe) / (lit(1.0) - pe), 6) + lit(0.0)).as("kappa"))
  }

  /** Welch's unequal-variance t-test per group: compare the `valueCol`
    * means of the two samples `tagCol` splits each group into. Means
    * and variances come from DECIMAL-exact sums (the engine-portable
    * double-sum rule); t and the Welch–Satterthwaite dof are then fixed
    * double expression trees, rounded 6 dp. Sample `a` is the
    * lexicographically smaller tag; groups without EXACTLY two samples
    * of size ≥ 2 are dropped (a two-sample test is undefined otherwise).
    *
    * One aggregation shuffle on (group, tag); the pivot to a/b columns
    * is `FrameOps.twoSamplePivot`, a tag-cardinality-sized window.
    */
  def welchTTest(df: DataFrame, valueCol: String, tagCol: String,
                 groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "welchTTest needs at least one group column")
    val gc = groupCols.map(col)
    val d = "decimal(30,6)"
    val v = col(valueCol)
    val perTag = df.filter(v.isNotNull && col(tagCol).isNotNull)
      .groupBy(gc :+ col(tagCol): _*)
      .agg(count(lit(1)).as("__n"),
        sum(v.cast(d)).as("__s"),
        sum((v * v).cast(d)).as("__ss"))
      .filter(col("__n") >= 2L)
    val n = col("__n").cast("double")
    val mean = col("__s").cast("double") / n
    val variance = (col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / n) / (n - 1d)
    val stats = perTag.select(gc :+ col(tagCol) :+ col("__n") :+
      mean.as("__m") :+ variance.as("__v2"): _*)
    val both = FrameOps.twoSamplePivot(stats, groupCols, tagCol,
      Seq("__n", "__m", "__v2"))
    val sea = col("__v2_a") / col("__n_a")
    val seb = col("__v2_b") / col("__n_b")
    val se2 = sea + seb
    val dof = se2 * se2 /
      (sea * sea / (col("__n_a").cast("double") - 1d) +
        seb * seb / (col("__n_b").cast("double") - 1d))
    both
      .withColumn("mean_a", round(col("__m_a"), 6))
      .withColumn("mean_b", round(col("__m_b"), 6))
      .withColumn("t_stat", when(se2 > 0d,
        round((col("__m_a") - col("__m_b")) / sqrt(se2), 6)))
      .withColumn("dof", when(se2 > 0d, round(dof, 6)))
      .select(gc :+ col(s"${tagCol}_a").as("tag_a") :+
        col(s"${tagCol}_b").as("tag_b") :+ col("__n_a").as("n_a") :+
        col("__n_b").as("n_b") :+ col("mean_a") :+ col("mean_b") :+
        col("t_stat") :+ col("dof"): _*)
  }

  /** Benford first-digit conformance per group — the fraud /
    * fabricated-data screen: χ² of the observed leading-digit
    * distribution of a positive 2-decimal amount against
    * P(d) = ln(1 + 1/d)/ln(10), plus the max absolute share deviation.
    * The leading digit comes from the DECIMAL(18,2)-exact integer cents
    * rendered as a string — no float log10/pow digit extraction, so the
    * digit is engine-identical by construction. Digits a group never
    * produces still contribute their expected mass (n·p) via the dense
    * 1–9 grid. The per-digit χ² terms are decimal-quantized before the
    * 9-row sum (order-free); everything is two map-side-combinable
    * aggregations on (group, digit) — at any scale the post-reduction
    * frames are 9 rows per group.
    */
  def benford(df: DataFrame, valueCol: String,
              groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "benford needs at least one group column")
    val gc = groupCols.map(col)
    val cents = (col(valueCol).cast("decimal(18,2)") * lit(100)).cast("long")
    val obs = df.filter(col(valueCol).isNotNull && col(valueCol) > 0d)
      .select(gc :+ substring(cents.cast("string"), 1, 1).cast("int")
        .as("digit"): _*)
      .groupBy(gc :+ col("digit"): _*)
      .agg(count(lit(1)).as("n_d"))
    val totals = obs.groupBy(gc: _*).agg(sum(col("n_d")).as("n"))
    val grid = totals.select(gc :+ col("n") :+
      explode(sequence(lit(1), lit(9))).as("digit"): _*)
    val joined = grid.join(obs, groupCols :+ "digit", "left")
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
    val p = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    val ndD = col("n_d").cast("double")
    val nD = col("n").cast("double")
    val term = ((ndD - nD * p) * (ndD - nD * p) / (nD * p))
      .cast("decimal(28,12)")
    joined
      .withColumn("__term", term)
      .withColumn("__dev", abs(ndD / nD - p))
      .groupBy(gc: _*)
      .agg(max(col("n")).as("n"),
        round(sum(col("__term")).cast("double"), 6).as("chi2_stat"),
        round(max(col("__dev")), 6).as("max_abs_dev"))
  }

  /** Pairwise Pearson correlation matrix over named numeric columns,
    * per group, from ONE wide aggregation: d sums, d square-sums and
    * d(d−1)/2 cross-sums (all per-row 6-dp-quantized and summed exactly
    * via [[ExactSum]], so order-free at long-sum speed — the decimal-sum
    * form of this agg measured ~8x slower) ride a single map-side-
    * combinable shuffle — never d² passes, never a driver-side matrix.
    * Output: one row per unordered pair,
    * `(groupCols…, col_a, col_b, n, r)`; pairs where either column is
    * constant report null r. Rows with a null in ANY of `cols` are
    * excluded entirely (listwise deletion), keeping every pair on the
    * same n. Domain contract: per-row cross products must stay ≤ ~9.2e12
    * (the 6-dp long-quantization bound; ANSI fails loudly past it).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 groupCols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    require(groupCols.nonEmpty, "corrMatrix needs at least one group column")
    val gc = groupCols.map(col)
    def cd(c: String) = col(c).cast("double")
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    val aggs =
      cols.flatMap(c => ExactSum.aggs(s"s_$c", cd(c))) ++
      cols.flatMap(c => ExactSum.aggs(s"ss_$c", cd(c) * cd(c))) ++
      pairs.flatMap { case (a, b) =>
        ExactSum.aggs(s"sp_${a}_$b", cd(a) * cd(b)) }
    val agged = complete.groupBy(gc: _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
      .filter(col("n") >= 2L)
    val nD = col("n").cast("double")
    def sD(c: String) = ExactSum.totalDouble(s"s_$c")
    def ssD(c: String) = ExactSum.totalDouble(s"ss_$c")
    val pairRows = pairs.map { case (a, b) =>
      val num = nD * ExactSum.totalDouble(s"sp_${a}_$b") - sD(a) * sD(b)
      val da = nD * ssD(a) - sD(a) * sD(a)
      val db = nD * ssD(b) - sD(b) * sD(b)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(da > 0d && db > 0d,
          round(num / sqrt(da * db), 6)).as("r"))
    }
    agged.select(gc :+ col("n") :+
      explode(array(pairRows: _*)).as("__p"): _*)
      .select(gc :+ col("__p.col_a").as("col_a") :+
        col("__p.col_b").as("col_b") :+ col("n") :+ col("__p.r").as("r"): _*)
  }

  /** One-way ANOVA per group: does `valueCol`'s mean differ across the
    * `tagCol` levels? F = MSB/MSW via the computational identity
    * (SSB = A − T²/N, SSW = TSS − A, A = Σ_j s_j²/n_j), so everything
    * reduces to one per-(group, tag) aggregation — map-side combinable,
    * k-sized per group after it. The per-tag terms s_j²/n_j are
    * DECIMAL(28,12)-quantized before the cross-tag sum (double addition
    * order varies with partitioning; decimal is order-free), the same
    * portability rule every stats operator here follows. Output:
    * groupCols, `k` (levels), `n`, `f_stat`, `eta_sq` — groups need
    * k ≥ 2, N > k, and positive within-variance (else dropped).
    */
  def anovaOneWay(df: DataFrame, valueCol: String, tagCol: String,
                  groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "anovaOneWay needs at least one group column")
    val gc = groupCols.map(col)
    val d = "decimal(30,6)"
    val v = col(valueCol).cast("double")
    val perTag = df.filter(col(valueCol).isNotNull && col(tagCol).isNotNull)
      .groupBy(gc :+ col(tagCol): _*)
      .agg(count(lit(1)).as("__n"),
        sum(v.cast(d)).as("__s"),
        sum((v * v).cast(d)).as("__ss"))
    val aTerm = (col("__s").cast("double") * col("__s").cast("double") /
      col("__n").cast("double")).cast("decimal(28,12)")
    val perGroup = perTag.groupBy(gc: _*)
      .agg(count(lit(1)).as("k"), sum(col("__n")).as("n"),
        sum(col("__s")).as("__t"), sum(col("__ss")).as("__tss"),
        sum(aTerm).as("__a"))
      .filter(col("k") >= 2L && col("n") > col("k"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val aD = col("__a").cast("double")
    val tD = col("__t").cast("double")
    val ssb = aD - tD * tD / nD
    val ssw = col("__tss").cast("double") - aD
    val f = (ssb / (kD - 1d)) / (ssw / (nD - kD))
    perGroup
      .filter(ssw > 0d)
      .select(gc :+ col("k") :+ col("n") :+
        round(f, 6).as("f_stat") :+
        round(ssb / (ssb + ssw), 6).as("eta_sq"): _*)
  }

  /** Per-group simple linear regression (OLS of y on x) from the five
    * closed-form sums — slope, intercept, and R², one shuffle, fully
    * map-side combinable. Sums are per-row DECIMAL(30,6)-quantized (the
    * Welch idiom) so the statistics are order-free and engine-exact;
    * the final algebra runs in double on the exact sums. Groups need
    * n ≥ 2; zero x-variance groups report null slope/intercept/r2
    * (vertical data has no OLS line), zero y-variance reports r2 null
    * with slope 0.
    */
  def groupOls(df: DataFrame, xCol: String, yCol: String,
               groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupOls needs at least one group column")
    val gc = groupCols.map(col)
    val d = "decimal(30,6)"
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val sums = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"),
        sum(x.cast(d)).as("__sx"), sum(y.cast(d)).as("__sy"),
        sum((x * x).cast(d)).as("__sxx"),
        sum((y * y).cast(d)).as("__syy"),
        sum((x * y).cast(d)).as("__sxy"))
      .filter(col("n") >= 2L)
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val denX = n * col("__sxx").cast("double") - sx * sx
    val denY = n * col("__syy").cast("double") - sy * sy
    val num = n * col("__sxy").cast("double") - sx * sy
    val slope = num / denX
    sums
      .withColumn("slope", when(denX > 0d, round(slope, 6)))
      .withColumn("intercept", when(denX > 0d,
        round((sy - slope * sx) / n, 6)))
      .withColumn("r2", when(denX > 0d && denY > 0d,
        round(num * num / (denX * denY), 6)))
      .select(gc :+ col("n") :+ col("slope") :+ col("intercept") :+
        col("r2"): _*)
  }

  /** Benjamini–Hochberg FDR control: adjusted q-values and reject flags
    * for a frame of per-test p-values — the multiple-testing step after
    * any per-group test battery (thousands of A/B cells, per-feature
    * drift scans). `q_i = min(1, min_{j ≥ i} p_j·m/j)` over the p-sorted
    * order.
    *
    * Distributed plan: the global p-rank comes from [[Ranking.rangeRank]]
    * (range sort — no single-task `OVER ()` window). The suffix-min that
    * makes q monotone is computed WITHOUT a global reverse sort task:
    * a second range exchange on descending rank, per-partition minima of
    * the adjusted values (one map-side-combinable metadata agg, bounded
    * at numPartitions rows on the driver), a driver prefix-min scan over
    * those partition minima for the carry-ins, and a forward streaming
    * min per partition. Each q is a `min` over exact double terms
    * `p·m/rank` — no accumulation, so no quantization is needed; the
    * stored q is rounded to 6 dp.
    *
    * Output: input columns + `rank`, `q_value`, `reject`
    * (q ≤ alpha, on the UNROUNDED q). Null p-values are dropped.
    */
  /** Fleiss' kappa: chance-corrected agreement for `n` raters per item
    * over any number of categories — the multi-rater generalization of
    * [[cohenKappa]], the standard QA statistic for labeling/annotation
    * pipelines. Items whose rating count ≠ `n` are dropped (the
    * statistic is undefined for ragged panels; silent inclusion would
    * skew P̄).
    *
    * Everything reduces to exact integer sums — `P̄ = (Σ_{i,j} n_ij² −
    * N·n) / (N·n·(n−1))` needs only the global sum of squared cell
    * counts, and `P̄_e = Σ_j c_j² / (N·n)²` the squared category
    * margins — so the plan is: one (item, category) count shuffle, one
    * item-cardinality agg for the panel filter, one category-margin
    * agg. Squared margins accumulate in DECIMAL(38,0) (the Cohen
    * marginal-product lesson: c_j can reach N·n, whose square overflows
    * long at ~3e9 ratings). κ is a fixed double tree on the exact sums,
    * rounded 6 dp; null when P̄_e = 1 (a single category — chance
    * agreement is saturated).
    *
    * Output: one row — n_items, n_raters, p_bar, p_e, kappa.
    */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String,
                  n: Int): DataFrame = {
    require(n >= 2, s"fleissKappa needs n >= 2 raters per item, got $n")
    val cells = df.filter(col(itemCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__nij"))
    // keep only complete panels: items with exactly n ratings
    val complete = cells.groupBy(col("__i"))
      .agg(sum(col("__nij")).as("__ni"))
      .filter(col("__ni") === n.toLong)
      .select(col("__i"))
    val kept = cells.join(complete, Seq("__i"))
    val margins = kept.groupBy(col("__c"))
      .agg(sum(col("__nij")).as("__cj"))
      .agg(sum(col("__cj").cast("decimal(19,0)") *
        col("__cj").cast("decimal(19,0)")).as("__sc2"))
    val totals = kept.agg(
      countDistinct(col("__i")).as("n_items"),
      sum(col("__nij").cast("decimal(19,0)") *
        col("__nij").cast("decimal(19,0)")).as("__s2"))
    val nItems = col("n_items").cast("double")
    val nD = lit(n.toDouble)
    val pBar = (col("__s2").cast("double") - nItems * nD) /
      (nItems * nD * lit((n - 1).toDouble))
    val pE = col("__sc2").cast("double") /
      ((nItems * nD) * (nItems * nD))
    totals.crossJoin(broadcast(margins))
      .filter(col("n_items") > 0L)
      .withColumn("n_raters", lit(n.toLong))
      .withColumn("p_bar", round(pBar, 6))
      .withColumn("p_e", round(pE, 6))
      .withColumn("kappa",
        when(lit(1.0) - pE =!= 0d, round((pBar - pE) / (lit(1.0) - pE), 6)))
      .select(col("n_items"), col("n_raters"), col("p_bar"), col("p_e"),
        col("kappa"))
  }

  def bhFdr(df: DataFrame, pCol: String, tieCols: Seq[String],
            alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val v = df.filter(col(pCol).isNotNull)
    val ranked = Ranking.rangeRank(v, Nil, pCol +: tieCols, "rank")
    val m = ranked.agg(count(lit(1)).as("__m"))
    val withA = ranked.crossJoin(broadcast(m))
      .withColumn("__a", col(pCol).cast("double") *
        col("__m").cast("double") / col("rank").cast("double"))
      .drop("__m")
    // descending-rank range pass: a forward running min with
    // carry-ins IS the suffix min in rank order
    FrameOps.orderedRunning(withA, Seq(col("rank").desc), "__a", "__q",
        isMin = true, inclusive = true)
      .withColumn("q_value", round(least(col("__q"), lit(1.0)), 6))
      .withColumn("reject", least(col("__q"), lit(1.0)) <= lit(alpha))
      .drop("__a", "__q")
  }

  /** Poisson(1) CDF thresholds for the deterministic bootstrap's inverse
    * CDF. These exact double literals ARE the contract (an engine
    * replaying the bootstrap compares the same u against the same
    * literals); the tail is capped at multiplicity 9 (P ≈ 1.1e-6, bias
    * far below the CI resolution).
    */
  private[graft] val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402)

  /** Poisson(1) inverse-CDF multiplicity from a uniform column. */
  private def poissonInv(u: Column): Column =
    PoissonCdf.zipWithIndex
      .foldRight(lit(PoissonCdf.length): Column) { case ((c, k), other) =>
        when(u <= lit(c), lit(k)).otherwise(other)
      }

  /** The ×b deterministic Poisson draw plan shared by both bootstrap
    * forms: each row explodes to ceil(b/2) DIGESTS and derives TWO lane
    * uniforms per digest (md5 yields 128 bits; the ring reads 52 per
    * lane — [[graft.functions.TextHashes.md5TwoUniformsImpl]]), so b
    * resamples cost b/2 md5s per row — the dominant term of the whole
    * operator, halved with no statistical change (lanes are disjoint
    * digest bits) and no loss of SQL replayability (resample
    * `b = 2d + lane` reads `substr(md5(k#d), 1 + 16·lane, 13)`).
    * Adds `__b` (resample index) and `__m` (multiplicity).
    */
  private def withPoissonDraws(base: DataFrame, b: Int): DataFrame = {
    val us = graft.functions.TextHashes.md5Uniforms2(
      concat(col("__k"), lit("#"), col("__d").cast("string")))
    base
      .withColumn("__d", explode(sequence(lit(0), lit((b + 1) / 2 - 1))))
      .select(col("*"), posexplode(us).as(Seq("__lane", "__u")))
      .withColumn("__b", col("__d") * 2 + col("__lane"))
      .filter(col("__b") < b) // odd b: drop the unused trailing lane
      .withColumn("__m", poissonInv(col("__u")).cast("long"))
      .drop("__d", "__lane", "__u")
  }

  /** The explode multiplies per-row work ×b (md5 + inverse CDF per
    * lane); when the scan yields fewer splits than the session's
    * parallelism (small local files), that work would pile onto 1-2
    * cores — spread the narrow projection first. At cluster scale the
    * input's own splits already provide this and the repartition is a
    * no-op branch. The probe reads the INTERNAL-row RDD's partition
    * count: one physical planning pass, no row-conversion lineage, no
    * job (the public `.rdd` would build the full deserializer chain —
    * round-7 verdict nit).
    */
  private def spreadNarrow(base: DataFrame): DataFrame = {
    val nPart = base.sparkSession.sessionState.conf.numShufflePartitions
    if (base.queryExecution.toRdd.getNumPartitions < nPart)
      base.repartition(nPart)
    else base
  }

  /** Deterministic Poisson bootstrap percentile CI for the mean, per
    * group (Chamandy et al. 2012 — the streaming/distributed bootstrap):
    * resample `b`'s multiplicity for a row is PoissonInv(u) with u read
    * from lane `b mod 2` of md5(row key, b div 2) — two 52-bit draws per
    * digest — so the ENTIRE resampling plan is a pure function of the
    * data: rerun-stable, engine-replayable, no RNG state. Classical multinomial resampling needs the global n at draw
    * time and a sequential RNG; Poisson(1) factorizes per row, which is
    * what makes the bootstrap embarrassingly parallel at 100 TB.
    *
    * Each of the `b` resamples aggregates `Σ m·x / Σ m` with the product
    * routed through DECIMAL(28,6) (order-free exact sums → bit-identical
    * means in any engine); the CI is the type-1 percentile pair of the b
    * resample means, ranked inside each group by (mean, b) — a window
    * over the `b`-bounded frame, never the corpus. Cost: one map-side
    * explode ×b feeding a (group, b)-keyed partial agg — rows×b
    * lightweight tuples combined before the shuffle, which carries only
    * groups×b partials.
    *
    * `keyCols` must identify rows uniquely (duplicate keys would
    * correlate multiplicities); output per group: `n`, `mean` (exact
    * point estimate), `ci_lo`, `ci_hi`, `n_resamples`.
    */
  def bootstrapMeanCI(df: DataFrame, valueCol: String, keyCols: Seq[String],
                      groupCols: Seq[String], b: Int = 50,
                      alpha: Double = 0.05): DataFrame = {
    require(b >= 4, s"need >= 4 resamples, got $b")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    require(keyCols.nonEmpty, "bootstrapMeanCI needs row-identifying keyCols")
    val gc = groupCols.map(col)
    val keyStr = concat_ws("#", keyCols.map(col(_).cast("string")): _*)
    val base = df.filter(col(valueCol).isNotNull)
      .select(gc :+ col(valueCol).cast("double").as("__x")
        :+ keyStr.as("__k"): _*)
    val point = base.groupBy(gc: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(28,6)")).as("__sx"))
    // Σ m·x as a LONG-speed exact sum: m ≤ 9 times the 6-dp-quantized
    // value is an exact long product (|x| loud-overflows past ~9e12 —
    // ANSI), digit-split-summed order-free (ExactSum — the decimal
    // formulation boxed a Decimal per row, ~8× slower on this ×b-fanned
    // aggregation, the round-8 bootstrap profile)
    val mAggs = ExactSum.aggsLong("sm",
      col("__m") * ExactSum.quantize6(col("__x"))) :+
      sum(col("__m")).as("__nm")
    val resampled = withPoissonDraws(spreadNarrow(base), b)
      .groupBy(gc :+ col("__b"): _*)
      .agg(mAggs.head, mAggs.tail: _*)
      .filter(col("__nm") > 0L)
      .withColumn("__mean",
        ExactSum.totalDouble("sm") / col("__nm").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gc: _*).orderBy(col("__mean"), col("__b"))
    val loRank = math.ceil(alpha / 2 * b).toLong.max(1L)
    val hiRank = math.ceil((1 - alpha / 2) * b).toLong
    val ci = resampled.withColumn("__rn", row_number().over(w))
      .groupBy(gc: _*)
      .agg(max(when(col("__rn") === loRank, col("__mean"))).as("ci_lo"),
        max(when(col("__rn") === hiRank, col("__mean"))).as("ci_hi"),
        count(lit(1)).as("n_resamples"))
    point.join(ci, groupCols)
      .select(gc ++ Seq(col("n"),
        (col("__sx").cast("double") / col("n").cast("double")).as("mean"),
        col("ci_lo"), col("ci_hi"), col("n_resamples")): _*)
  }

  /** [[bootstrapMeanCI]]'s A/B form: percentile CI for the DIFFERENCE in
    * means between two arms (cmp − ref) — the uplift interval an A/B
    * readout actually wants, where the parametric alternative (Welch)
    * assumes approximate normality this makes no claim about. Both arms
    * resample inside the SAME Poisson draw per b (multiplicities keyed on
    * (row, b) exactly as the one-sample form), so diff_b is a paired
    * statistic. One arm-conditional aggregation per b — the same single
    * shuffle of b partials; the CI window runs over the b-bounded frame.
    * Output one row: n_ref, n_cmp, diff (exact point estimate), ci_lo,
    * ci_hi, n_resamples.
    */
  def bootstrapDiffCI(df: DataFrame, valueCol: String, keyCols: Seq[String],
                      armCol: String, refArm: String, cmpArm: String,
                      b: Int = 50, alpha: Double = 0.05): DataFrame = {
    require(b >= 4, s"need >= 4 resamples, got $b")
    require(refArm != cmpArm, "refArm and cmpArm must differ")
    require(keyCols.nonEmpty, "bootstrapDiffCI needs row-identifying keyCols")
    val keyStr = concat_ws("#", keyCols.map(col(_).cast("string")): _*)
    val base = df
      .filter(col(valueCol).isNotNull &&
        (col(armCol) === refArm || col(armCol) === cmpArm))
      .select((col(armCol) === cmpArm).as("__cmp"),
        col(valueCol).cast("double").as("__x"), keyStr.as("__k"))
    val point = base.agg(
      count(when(!col("__cmp"), lit(1))).as("n_ref"),
      count(when(col("__cmp"), lit(1))).as("n_cmp"),
      sum(when(!col("__cmp"), col("__x").cast("decimal(28,6)"))).as("__sr"),
      sum(when(col("__cmp"), col("__x").cast("decimal(28,6)"))).as("__sc"))
    // the q201 long-speed Σ m·x (see bootstrapMeanCI), arm-conditional:
    // the un-matched arm contributes null, which every digit sum skips
    val mq = col("__m") * ExactSum.quantize6(col("__x"))
    val mAggs = ExactSum.aggsLong("smr", when(!col("__cmp"), mq)) ++
      ExactSum.aggsLong("smc", when(col("__cmp"), mq)) ++ Seq(
        sum(when(!col("__cmp"), col("__m"))).as("__nmr"),
        sum(when(col("__cmp"), col("__m"))).as("__nmc"))
    val resampled = withPoissonDraws(spreadNarrow(base), b)
      .groupBy(col("__b"))
      .agg(mAggs.head, mAggs.tail: _*)
      .filter(col("__nmr") > 0L && col("__nmc") > 0L)
      .withColumn("__diff",
        ExactSum.totalDouble("smc") / col("__nmc").cast("double") -
          ExactSum.totalDouble("smr") / col("__nmr").cast("double"))
    // b-bounded frame (<= b rows): the unpartitioned window is fixed-size
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__diff"), col("__b"))
    val loRank = math.ceil(alpha / 2 * b).toLong.max(1L)
    val hiRank = math.ceil((1 - alpha / 2) * b).toLong
    val ci = resampled.withColumn("__rn", row_number().over(w))
      .agg(max(when(col("__rn") === loRank, col("__diff"))).as("ci_lo"),
        max(when(col("__rn") === hiRank, col("__diff"))).as("ci_hi"),
        count(lit(1)).as("n_resamples"))
    point.crossJoin(ci)
      .filter(col("n_ref") > 0L && col("n_cmp") > 0L)
      .select(col("n_ref"), col("n_cmp"),
        (col("__sc").cast("double") / col("n_cmp").cast("double") -
          col("__sr").cast("double") / col("n_ref").cast("double")).as("diff"),
        col("ci_lo"), col("ci_hi"), col("n_resamples"))
  }

  /** Per-class precision / recall / F1 from (true, predicted) label
    * pairs — the classifier-eval report behind every heuristic-labeler
    * audit (langid vs gold labels, quality-filter vs human raters). One
    * |classes|²-bounded (true, pred) count aggregation; every rollup
    * after it runs on that structurally small frame (AQE-sized joins,
    * never the corpus). A class appearing only in predictions (or only
    * in truth) still reports, with the undefined ratio null rather than
    * 0 — absence of evidence, not zero skill. Null labels on either
    * side are dropped. Ratios are exact long divisions in fixed double
    * trees, rounded 6 dp.
    */
  def classificationReport(df: DataFrame, trueCol: String,
                           predCol: String): DataFrame = {
    val pairs = df
      .filter(col(trueCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(trueCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("c"))
    val byTrue = pairs.groupBy(col("t").as("label"))
      .agg(sum(col("c")).as("n_true"))
    val byPred = pairs.groupBy(col("p").as("label"))
      .agg(sum(col("c")).as("n_pred"))
    val tp = pairs.filter(col("t") === col("p"))
      .select(col("t").as("label"), col("c").as("tp"))
    val prec = col("tp").cast("double") / col("n_pred").cast("double")
    val rec = col("tp").cast("double") / col("n_true").cast("double")
    byTrue.join(byPred, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0L, round(prec, 6)))
      .withColumn("recall",
        when(col("n_true") > 0L, round(rec, 6)))
      .withColumn("f1",
        when(col("n_pred") > 0L && col("n_true") > 0L,
          when((prec + rec) > 0.0,
            round(lit(2.0) * prec * rec / (prec + rec), 6))
            .otherwise(lit(0.0)))) // both defined, zero skill → 0 (sklearn)
  }

  /** Feature–label mutual information ranking — the model-free feature-
    * importance screen: every numeric feature is equi-width binned
    * (q90's explicit floor arithmetic) and scored by I(bin; label) in
    * nats; the output ranks features by how much label information they
    * carry. Listwise per feature (each feature uses its own non-null
    * rows, like [[corrMatrix]]'s pairs).
    *
    * Scale shape: ALL features melt in ONE corpus pass (k× row
    * amplification, no per-feature rescans); per-feature bounds are a
    * k-row aggregate joined back hint-free; every frame after the
    * (feature, bin, label) cell aggregation is k·bins·|labels|-bounded.
    * MI terms are DECIMAL(28,12)-quantized before the order-free sum;
    * the final rank window runs over the k-row result frame only (the
    * bounded-frame contract).
    */
  def featureMiRanking(df: DataFrame, labelCol: String,
                       features: Seq[String], bins: Int = 10): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val melted = df.filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("label"),
        explode(array(features.map(f => struct(lit(f).as("feature"),
          col(f).cast("double").as("x"))): _*)).as("s"))
      .select(col("label"), col("s.feature").as("feature"), col("s.x").as("x"))
      .filter(col("x").isNotNull)
    val bounds = melted.groupBy(col("feature"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val binned = melted.join(bounds, Seq("feature"))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("lo")) / (col("hi") - col("lo")) * bins)
              .cast("long"),
            lit(bins - 1L))))
    val cells = binned.groupBy(col("feature"), col("bin"), col("label"))
      .agg(count(lit(1)).as("c"))
    val binMar = cells.groupBy(col("feature"), col("bin"))
      .agg(sum(col("c")).as("cb"))
    val labMar = cells.groupBy(col("feature"), col("label"))
      .agg(sum(col("c")).as("cl"))
    val tot = cells.groupBy(col("feature")).agg(sum(col("c")).as("n"))
    val term = ((col("c").cast("double") / col("n").cast("double")) *
      log((col("c").cast("double") * col("n").cast("double")) /
        (col("cb").cast("double") * col("cl").cast("double"))))
      .cast("decimal(28,12)")
    val mi = cells
      .join(binMar, Seq("feature", "bin"))
      .join(labMar, Seq("feature", "label"))
      .join(tot, Seq("feature"))
      .groupBy(col("feature"))
      .agg(max(col("n")).as("n_rows"),
        round(sum(term).cast("double"), 6).as("mi_nats"))
    // rank window over the k-feature result frame only (bounded frame)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mi_nats").desc, col("feature"))
    mi.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Difference-in-differences — the standard two-group two-period
    * causal contrast for a rollout/experiment with a pre-period:
    * DiD = (treat_post − treat_pre) − (ctrl_post − ctrl_pre) over
    * cell means. One 2×2-cell aggregation: per-cell counts and
    * DECIMAL(30,6)-quantized value sums (exact, order-free), cell
    * means and the contrast as fixed double trees. Cells with no rows
    * make the estimate null rather than silently zero.
    */
  def diffInDiff(df: DataFrame, treatCol: Column, postCol: Column,
                 valueCol: String): DataFrame = {
    val cells = df.filter(col(valueCol).isNotNull &&
        treatCol.isNotNull && postCol.isNotNull)
      .groupBy(treatCol.as("__t"), postCol.as("__p"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(30,6)")).as("__s"))
    def cell(t: Boolean, p: Boolean, c: String) =
      max(when(col("__t") === t && col("__p") === p, col(c)))
    val wide = cells.agg(
      cell(true, false, "__n").as("n_treat_pre"),
      cell(true, true, "__n").as("n_treat_post"),
      cell(false, false, "__n").as("n_ctrl_pre"),
      cell(false, true, "__n").as("n_ctrl_post"),
      (cell(true, false, "__s").cast("double") /
        cell(true, false, "__n").cast("double")).as("__mtp"),
      (cell(true, true, "__s").cast("double") /
        cell(true, true, "__n").cast("double")).as("__mtq"),
      (cell(false, false, "__s").cast("double") /
        cell(false, false, "__n").cast("double")).as("__mcp"),
      (cell(false, true, "__s").cast("double") /
        cell(false, true, "__n").cast("double")).as("__mcq"))
    wide.select(col("n_treat_pre"), col("n_treat_post"),
      col("n_ctrl_pre"), col("n_ctrl_post"),
      round(col("__mtp"), 6).as("mean_treat_pre"),
      round(col("__mtq"), 6).as("mean_treat_post"),
      round(col("__mcp"), 6).as("mean_ctrl_pre"),
      round(col("__mcq"), 6).as("mean_ctrl_post"),
      round((col("__mtq") - col("__mtp")) - (col("__mcq") - col("__mcp")), 6)
        .as("did"))
  }

  /** Split-conformal upper bound per group (Vovk's distribution-free
    * coverage guarantee, the split/inductive form): a deterministic
    * md5-hash calibration split, the bound q̂ = the
    * ⌈(n_cal + 1)(1 − α)⌉-th smallest calibration value (the
    * finite-sample-corrected rank — NOT the plain quantile), and the
    * held-out coverage check P(value ≤ q̂), which the guarantee says is
    * ≥ 1 − α in expectation regardless of the value distribution.
    * When the corrected rank exceeds n_cal the bound is vacuous (+∞):
    * q̂ reports null and coverage 1.
    *
    * Determinism: the split is the md5-bucket rule (q48), the rank is
    * exact (rank core + conditional-max value-at-rank, the q186
    * shape), and coverage is one exact long division. ⌈(n+1)(1−α)⌉
    * computes in doubles — one multiply + ceil, identical both
    * engines.
    *
    * Scale: one rank-core pass over the calibration side, group-
    * bounded bound frame joined back hint-free, one eval aggregation.
    */
  def conformalUpperBound(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, idCol: String,
                          alpha: Double = 0.1,
                          calFraction: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    require(calFraction > 0 && calFraction < 1,
      s"calFraction out of (0,1): $calFraction")
    val gc = groupCols.map(col)
    val base = df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .withColumn("__b", substring(md5(col(idCol).cast("string")
        .cast("binary")), 1, 4))
    val thr = graft.operators.Sampling.hexThreshold(calFraction)
    val cal = base.filter(col("__b") < thr)
    val eval_ = base.filter(col("__b") >= thr)
    val sizes = cal.groupBy(gc: _*).agg(count(lit(1)).as("n_cal"))
    val ranked = Ranking.rangeRank(cal, groupCols,
      Seq(valueCol, idCol), "__cr")
    val bounds = ranked.join(sizes, groupCols)
      .withColumn("__k",
        ceil((col("n_cal") + lit(1L)).cast("double") * (1.0 - alpha))
          .cast("long"))
      .groupBy(gc: _*)
      .agg(max(col("n_cal")).as("n_cal"),
        max(when(col("__cr") === col("__k"), col(valueCol))).as("q_hat"))
    eval_.join(bounds, groupCols)
      .groupBy(gc: _*)
      .agg(max(col("n_cal")).as("n_cal"),
        max(col("q_hat")).as("q_hat"),
        count(lit(1)).as("n_eval"),
        round(count(when(col("q_hat").isNull ||
            col(valueCol) <= col("q_hat"), lit(1))).cast("double") /
          count(lit(1)).cast("double"), 6).as("coverage"))
  }
}
