package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass data profiling (the Deequ/"dataset statistics" shape):
  * per column, row/null/distinct counts plus numeric min/max/mean — the
  * health check a pipeline runs over every new data drop before it
  * enters the training mix.
  *
  * One aggregation over the input computes every statistic for every
  * profiled column (the exact-distinct counts make Catalyst plan an
  * Expand — k+1 copies of each row for k distinct-aggregates — then ONE
  * shuffle with map-side partial aggregation; there is no per-column
  * scan). The single result row is exploded into long format
  * (one row per column) at zero cost.
  *
  * 100 TB note: exact distinct counts are the expensive part (the
  * Expand multiplies scan output k+1×). `approxDistinct = true` swaps
  * them for HyperLogLog++ `approx_count_distinct` (no Expand, constant
  * sketch state per column) — the right default at petabyte scale when
  * the count feeds a dashboard rather than an exactness gate.
  *
  * Numeric statistics are engine-portable by construction: min/max are
  * order-independent; the mean divides a DECIMAL(18,6)-exact sum by the
  * non-null count in double (bit-identical across engines — the same
  * rule as every other double aggregate in this repo). Non-numeric
  * columns emit null min/max/mean.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"column $c not in schema ${schema.fieldNames.mkString(", ")}"))
    def isNumeric(c: String): Boolean = schema(c).dataType match {
      case _: NumericType => true
      case _ => false
    }
    val aggs = cols.flatMap { c =>
      val nd = if (approxDistinct) approx_count_distinct(col(c))
               else countDistinct(col(c))
      val numeric = isNumeric(c)
      def num(f: => org.apache.spark.sql.Column) =
        if (numeric) f else lit(null).cast("double")
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        nd.cast("long").as(s"__nd_$c"),
        num(min(col(c)).cast("double")).as(s"__min_$c"),
        num(max(col(c)).cast("double")).as(s"__max_$c"),
        num(sum(col(c).cast("decimal(18,6)")).cast("double") /
          count(col(c))).as(s"__mean_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"),
        col(s"__max_$c").as("max_num"),
        col(s"__mean_$c").as("mean_num"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Exact equi-width histogram of a numeric column: `nBuckets` buckets
    * over [lo, hi), plus underflow (-1) and overflow (nBuckets) buckets —
    * explicit edge arithmetic (floor((x-lo)/width) in double, identical
    * across engines) instead of engine-specific `width_bucket` variants.
    * One map-side-combinable aggregation; NULLs are excluded. Empty
    * buckets are absent from the output (dense output would need a
    * bucket-spine join — callers chart from the sparse form).
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / nBuckets
    val v = col(valueCol)
    val bucket = when(v < lo, lit(-1L))
      .when(v >= hi, lit(nBuckets.toLong))
      .otherwise(floor((v - lit(lo)) / lit(width)).cast("long"))
    df.filter(v.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(v), 6).as("min_val"), round(max(v), 6).as("max_val"))
      // finite in-range edges only; the under/overflow buckets have no
      // finite lower edge by construction
      .withColumn("lo_edge",
        when(col("bucket") >= 0L && col("bucket") < nBuckets.toLong,
          round(lit(lo) + col("bucket") * lit(width), 6)))
  }

  /** Spearman rank correlation of two numeric columns per group —
    * monotone-association strength, robust to outliers and nonlinear
    * scales where Pearson ([[exactCorr]]) is not. Ranks are
    * `row_number` over (value, `tieCols`): a DETERMINISTIC tie-break
    * (both engines replay it exactly) rather than the textbook averaged
    * ranks — documented divergence, negligible when ties are rare.
    *
    * Because tie-broken ranks are permutations of 1..n, Pearson-on-ranks
    * collapses to the classic difference identity
    * `ρ = 1 − 6·Σ(rx−ry)² / (n(n²−1))` — ONE exact integer sum (via
    * [[ExactSum.aggsLong]], pure long arithmetic) instead of five
    * decimal product sums. Per-row `(rx−ry)²` must fit a long, so the
    * bound is n ≤ ~3e9 rows per group (≈ 400 TB of lineitem in a single
    * group); ANSI multiplication overflow fails loudly past it. Groups
    * with n < 2 report null ρ.
    *
    * `rangeRanks = true` (default) computes both rank columns with
    * [[Ranking.rangeRank]] — full cluster parallelism even when
    * `groupCols` has 3 values over a billion rows (the per-group window
    * sort would run 3 tasks). Set false for the plain window form when
    * groups are numerous (rangeRank's per-(partition, group) metadata
    * would dominate) — both produce IDENTICAL ranks.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
               groupCols: Seq[String], tieCols: Seq[String],
               rangeRanks: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tieCols.nonEmpty,
      "tieCols must totally order rows within a group, or ranks are nondeterministic")
    // project to the involved columns BEFORE ranking: the two rank
    // sorts otherwise carry the input's full row width through both
    // shuffles (measured ~2x on a wide fact table)
    val needed = (groupCols ++ Seq(xCol, yCol) ++ tieCols).distinct.map(col)
    val filtered = df.select(needed: _*)
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val ranked = if (rangeRanks) {
      val rx = Ranking.rangeRank(filtered, groupCols, xCol +: tieCols, "__rxl")
      Ranking.rangeRank(rx, groupCols, yCol +: tieCols, "__ryl")
    } else {
      val wx = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col(xCol) +: tieCols.map(col): _*)
      val wy = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col(yCol) +: tieCols.map(col): _*)
      filtered
        .withColumn("__rxl", row_number().over(wx).cast("long"))
        .withColumn("__ryl", row_number().over(wy).cast("long"))
    }
    val d = col("__rxl") - col("__ryl")
    val g = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        ExactSum.aggsLong("sd2", d * d): _*)
    val nD = col("n").cast("double")
    g.withColumn("spearman_rho",
        when(col("n") > 1L, round(lit(1d) -
          lit(6d) * ExactSum.total("sd2").cast("double") /
            (nD * (nD * nD - lit(1d))), 6)))
      .drop("__es2_sd2", "__es1_sd2", "__es0_sd2")
  }

  /** Join-key skew diagnosis — the measurement that decides between a
    * plain shuffle join, AQE skew split, and [[SkewJoin]]'s explicit
    * salting: per-key counts (one hash-agg shuffle, map-side combined),
    * reduced to a one-row report of total rows, distinct keys, the max
    * and mean key frequency, their ratio (`skew_ratio` — a uniform key
    * is ~1, a power-law head is orders of magnitude above), and the
    * heaviest key itself. NULL keys count as a key (they hash-collide
    * into one reducer exactly like a real value).
    *
    * 100 TB: two aggregations, both map-side combinable; state is one
    * row per distinct key, spillable. No driver-side structures.
    */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    counts.agg(
        sum(col("cnt")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        max_by(col("k"), struct(col("cnt"), col("k"))).as("heaviest_key"),
        round(avg(col("cnt")), 6).as("mean_cnt"))
      .withColumn("skew_ratio",
        round(col("max_cnt") / (col("n_rows").cast("double") / col("n_keys")), 6))
  }

  /** φ-heavy hitters: every key whose frequency is at least
    * `phi × total rows` — stopword discovery over a token stream,
    * dominant-domain / hot-entity detection, the exact companion to
    * [[keySkew]]'s single heaviest key. Two map-side-combinable
    * aggregations (per-key counts, then their one-row total — the
    * broadcast is structurally small); the threshold compare runs in
    * double exactly as the oracle replays it. Null keys are dropped
    * (they are absence, not a value; [[keySkew]] counts them instead).
    * Output: key, cnt, share (6 dp), n_rows. At 100 TB the shuffle
    * carries one row per DISTINCT key after partial aggregation; for
    * streams where even that is too wide, a Misra-Gries/CMS sketch
    * bounds state at 1/φ — the exact form here is the oracle-checkable
    * batch path, and its candidate set is what a sketch would verify
    * against anyway.
    */
  def heavyHitters(df: DataFrame, keyCol: String, phi: Double): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1], got $phi")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("long").as("__n"))
    counts.join(broadcast(total), lit(true))
      .filter(col("cnt").cast("double") >= lit(phi) * col("__n").cast("double"))
      .select(col("k").as(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("__n").cast("double"), 6)
          .as("share"),
        col("__n").as("n_rows"))
  }

  /** Exact per-group Pearson correlation and sample covariance of two
    * numeric columns, computed from 6-dp-quantized [[ExactSum]] sums —
    * unlike the builtin `corr`/`covar_samp` (streaming double
    * accumulation, merge-order-dependent low bits), this is
    * deterministic under repartitioning and bit-identical across
    * engines: the five sums are exact integers, cast to double once,
    * and the closed-form formula runs in IEEE double with a fixed
    * expression tree. One shuffle (map-side partial long sums, ~8x
    * cheaper than the decimal-sum form); round(6) on the
    * transcendental outputs.
    *
    * Domain contract: per-row |x·y|, x², y² must stay ≤ ~9.2e12 so the
    * 6-dp quantized product fits a long (ANSI fails loudly past it) —
    * ample for price/measure domains; for wider domains or rank inputs
    * use [[spearman]]'s integer identity or a decimal fold.
    */
  def exactCorr(df: DataFrame, xCol: String, yCol: String,
                groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "exactCorr needs at least one group column")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val terms = Seq("sx" -> x, "sy" -> y, "sxx" -> (x * x),
      "syy" -> (y * y), "sxy" -> (x * y))
    val g = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        terms.flatMap { case (n, e) => ExactSum.aggs(n, e) }: _*)
    def t(n: String) = ExactSum.totalDouble(n)
    val nd = col("n").cast("double")
    g.withColumn("corr_xy", round(
        (nd * t("sxy") - t("sx") * t("sy")) /
          sqrt((nd * t("sxx") - t("sx") * t("sx")) *
            (nd * t("syy") - t("sy") * t("sy"))), 6))
      .withColumn("cov_samp", round(
        (nd * t("sxy") - t("sx") * t("sy")) / (nd * (nd - 1)), 6))
      .drop(terms.flatMap { case (n, _) =>
        Seq(s"__es2_$n", s"__es1_$n", s"__es0_$n") }: _*)
  }

  /** Worst-slice report: for every value of every dimension column, the
    * slice's metric mean and its one-sample z against the global
    * distribution `z = (m_slice − m_global)·√n_slice / sd_global` — the
    * "which slice is broken" triage behind a moved aggregate (a global
    * mean shift is almost always ONE source/segment, and eyeballing
    * per-dimension GROUP BYs one at a time misses cross-dimension
    * comparisons of deviation magnitude).
    *
    * Plan shape: dimensions are MELTED per row (one `explode` of a
    * k-struct array — a single corpus pass for all k dimensions, k·rows
    * intermediate), then ONE (dimension, value) aggregation with
    * map-side combine; global moments are a one-row aggregate joined
    * back by AQE's choice. Means/variances from DECIMAL-exact sums
    * (engine-portable); dimension values are stringified for the
    * uniform output schema. Output: one row per (dimension, value) —
    * n, mean, z (6 dp), plus the global mean for reference.
    */
  def sliceDeviation(df: DataFrame, metricCol: String,
                     dimCols: Seq[String]): DataFrame = {
    require(dimCols.nonEmpty, "sliceDeviation needs at least one dimension")
    val d = "decimal(30,6)"
    val m = col(metricCol)
    val rows = df.filter(m.isNotNull)
    val globals = rows.agg(count(lit(1)).as("__ng"),
      sum(m.cast(d)).cast("double").as("__sg"),
      sum((m * m).cast(d)).cast("double").as("__ssg"))
    val melted = rows.select(m.as("__m"),
      explode(array(dimCols.map(c =>
        struct(lit(c).as("dimension"), col(c).cast("string").as("value"))): _*))
        .as("__dv"))
      .select(col("__dv.dimension").as("dimension"),
        col("__dv.value").as("value"), col("__m"))
      .filter(col("value").isNotNull)
    val slices = melted.groupBy(col("dimension"), col("value"))
      .agg(count(lit(1)).as("n"),
        sum(col("__m").cast(d)).cast("double").as("__s"))
    val ngd = col("__ng").cast("double")
    val gMean = col("__sg") / ngd
    val gVar = (col("__ssg") - col("__sg") * col("__sg") / ngd) / (ngd - 1d)
    slices.join(globals, lit(true))
      .filter(col("__ng") > 1L)
      .withColumn("mean", col("__s") / col("n"))
      .withColumn("z",
        when(gVar > 0d,
          round((col("mean") - gMean) * sqrt(col("n").cast("double")) /
            sqrt(gVar), 6)))
      .select(col("dimension"), col("value"), col("n"),
        round(col("mean"), 6).as("mean"),
        round(gMean, 6).as("global_mean"), col("z"))
  }

  /** Key-containment check — the foreign-key discovery / referential-
    * integrity probe of schema profiling: what fraction of the child
    * column's DISTINCT values exist in the parent column. 1.0 → an FK
    * candidate (and a broadcast-dim join is safe); < 1.0 quantifies
    * orphaned keys. One distinct reduction per side, one left-anti
    * count — the distinct frames are key-cardinality, not row-count,
    * sized.
    */
  def containment(child: DataFrame, childCol: String,
                  parent: DataFrame, parentCol: String): DataFrame = {
    val c = child.filter(col(childCol).isNotNull)
      .select(col(childCol).as("__k")).distinct()
    val p = parent.filter(col(parentCol).isNotNull)
      .select(col(parentCol).as("__k")).distinct()
    val nChild = c.agg(count(lit(1)).as("n_child_distinct"))
    val orphans = c.join(p, Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("__orph"))
    nChild.crossJoin(orphans)
      .select(lit(s"$childCol->$parentCol").as("relation"),
        col("n_child_distinct"),
        (col("n_child_distinct") - col("__orph")).as("n_contained"),
        when(col("n_child_distinct") > 0L,
          round((col("n_child_distinct") - col("__orph")).cast("double") /
            col("n_child_distinct").cast("double"), 6)).as("containment"))
  }

  /** Per-source corpus data card — the one-frame dataset summary every
    * published training set ships (datasheet/data-card convention):
    * document counts, empty-text counts, exact-dup rate (distinct
    * md5(text) vs non-empty texts), token volume and vocabulary,
    * majority language and its share. Every number is a composition of
    * gates proven elsewhere (q12's dup semantics, q23's tokenization,
    * q187's lang counts) folded into source-bounded frames.
    *
    * Scale: one corpus pass for the text/dup aggregates (exact
    * distinct via the Expand strategy — group cardinality is the
    * bounded source count), one token-explode pass for volume/vocab,
    * one |sources×langs|-bounded mode window.
    */
  def corpusCard(docs: DataFrame, sourceCol: String = "source",
                 textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val nonEmpty = col(textCol).isNotNull && trim(col(textCol)) =!= ""
    val d1 = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        count(when(!nonEmpty, lit(1))).as("n_empty"),
        countDistinct(when(nonEmpty, md5(col(textCol).cast("binary"))))
          .as("__distinct_texts"),
        count(when(col(langCol).isNotNull, lit(1))).as("__n_lang"))
    val toks = docs.filter(nonEmpty)
      .select(col(sourceCol),
        explode(TextAnalysis.tokensCol(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("__tok")).as("vocab"))
    val langW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col("__lc").desc, col(langCol))
    val topLang = docs.filter(col(langCol).isNotNull)
      .groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("__lc"))
      .withColumn("__r", row_number().over(langW))
      .filter(col("__r") === 1)
      .select(col(sourceCol), col(langCol).as("top_lang"),
        col("__lc").as("__top_n"))
    d1.join(toks, Seq(sourceCol), "left")
      .join(topLang, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"), col("n_empty"),
        when(col("n_docs") - col("n_empty") > 0L,
          round(lit(1.0) - col("__distinct_texts").cast("double") /
            (col("n_docs") - col("n_empty")).cast("double"), 6))
          .as("dup_rate"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("vocab"), lit(0L)).as("vocab"),
        when(col("n_docs") - col("n_empty") > 0L,
          round(coalesce(col("n_tokens"), lit(0L)).cast("double") /
            (col("n_docs") - col("n_empty")).cast("double"), 6))
          .as("mean_tokens"),
        col("top_lang"),
        when(col("__n_lang") > 0L,
          round(col("__top_n").cast("double") /
            col("__n_lang").cast("double"), 6)).as("top_lang_share"))
  }
}
