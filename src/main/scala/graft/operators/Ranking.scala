package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exact ranking for the few-giant-groups regime.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY ...)` puts each group in
  * ONE task — correct, and the right plan when groups are numerous, but
  * a hard scale ceiling when there are 3 groups of a billion rows each:
  * three tasks sort the whole table no matter how many executors exist.
  *
  * [[rangeRank]] computes the identical ranks with full parallelism —
  * the classic range-sort + offset (zipWithIndex) decomposition:
  *   1. range-repartition on (group, order) keys and sort within
  *      partitions — every partition holds a contiguous slice of the
  *      total order, groups span partitions freely;
  *   2. one tiny metadata job counts rows per (partition, group) —
  *      driver state is `numPartitions × numGroups` longs (this operator
  *      is FOR small group counts; use the window form otherwise — the
  *      contract is ENFORCED by a bounded collect that fails fast past
  *      `maxDriverStateRows` instead of OOMing the driver);
  *   3. a per-partition pass assigns rank = group's offset before this
  *      partition + local position (mapPartitions — imperative, but
  *      per-row O(1) with zero shuffle; the sorted frame is cached so
  *      steps 2 and 3 share the single range exchange).
  *
  * Ranks are 1-based and identical to `row_number` when (orderCols) is
  * a total order within each group — same requirement the window form
  * has for determinism.
  */
object Ranking {

  def rangeRank(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                outCol: String = "rank", numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "rangeRank needs at least one order column")
    rangeRankMulti(df, groupCols ++ orderCols, Seq(groupCols), Seq(outCol),
      numPartitions)
  }

  /** Several group-level rankings from ONE range sort: every set in
    * `groupSets` gets its own rank column, all computed in the same
    * per-partition pass. Caller contract: restricted to any one group of
    * any set, `sortCols` must order that group's rows in the desired
    * rank order (e.g. sort (g, v, tag, id) serves both groups-by-(g)
    * and groups-by-(g, tag) ranked by v — a finer set's groups may
    * freely INTERLEAVE in the sort, the pass keeps one counter per
    * group). This is what lets a two-ranking consumer like the KS test
    * pay one shuffle + sort instead of two.
    */
  def rangeRankMulti(df: DataFrame, sortCols: Seq[String],
                     groupSets: Seq[Seq[String]], outCols: Seq[String],
                     numPartitions: Int = 0,
                     weightCol: Option[String] = None,
                     maxDriverStateRows: Int = 1 << 20,
                     cacheInput: Boolean = false): DataFrame = {
    require(groupSets.nonEmpty && groupSets.length == outCols.length,
      "need one output column per group set")
    // weights must be integral: the counts job and the per-row pass must
    // agree exactly, and a fractional weight would silently truncate in
    // one and crash in the other
    weightCol.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == LongType || dt == org.apache.spark.sql.types.IntegerType,
        s"weightCol $c must be integral (INT/BIGINT), got $dt")
    }
    val spark = df.sparkSession
    val nPart = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val keys = sortCols.map(col)
    // cacheInput: the range partitioner SAMPLES its child before the
    // real exchange runs it again, so an expensive upstream (a
    // distinct-value aggregation, the usual rank-stat input) executes
    // twice. Callers whose input frame is BOUNDED (∝ distinct values /
    // groups, never raw-corpus-sized) pass true and pay one cached
    // materialization instead — the cache is released as soon as the
    // sorted frame is materialized below. Raw-corpus callers keep the
    // default: persisting 100 TB to re-read it once is the worse trade.
    // respect a cache the CALLER already established on this plan:
    // persist/unpersist key off the shared CacheManager, so unpersisting
    // here would silently evict the caller's own entry mid-function
    val callerCached =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val ownCache = cacheInput && !callerCached
    val in = if (ownCache) TrackedCaches.track(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    else df
    // cached because the counts job and the rank pass must see the SAME
    // range boundaries and row order (and pay the sort once)
    val sorted = TrackedCaches.track(
      in.repartitionByRange(nPart, keys: _*)
        .sortWithinPartitions(keys: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // one metadata job covers every set: counts per (partition, union of
    // all grouping columns) — numPartitions × numGroups rows, the
    // few-groups contract of this operator. With a weight column the
    // "rank" generalizes to the INCLUSIVE cumulative weight — the
    // prefix-sum form consumers like the KS test run on pre-aggregated
    // per-value counts instead of raw rows.
    val allGroupCols = groupSets.flatten.distinct
    val weightAgg = weightCol.map(w => sum(col(w).cast("long")))
      .getOrElse(count(lit(1))).as("__n")
    val countRows = sorted
      .groupBy(spark_partition_id().as("__pid") +: allGroupCols.map(col): _*)
      .agg(weightAgg)
      // ENFORCED few-groups contract: the collect is bounded (limit+collect,
      // so an over-cardinality input never materializes on the driver) and
      // over-cap fails fast instead of silently OOMing the driver /
      // broadcasting a huge offsets map
      .take(maxDriverStateRows + 1)
    // the counts job above materialized every partition of `sorted`
    // (it aggregates the whole frame), so the input cache has served
    // both its readers — release it now rather than at scope end
    if (ownCache) in.unpersist(false)
    require(countRows.length <= maxDriverStateRows,
      s"rangeRankMulti materializes numPartitions × numGroups count rows on " +
        s"the driver and this input exceeds maxDriverStateRows=" +
        s"$maxDriverStateRows. The operator targets the FEW-GIANT-GROUPS " +
        s"regime; for a high-cardinality group set use " +
        s"row_number()/sum() OVER (PARTITION BY ...) — numerous groups give " +
        s"the window form its parallelism back.")
    val counts = countRows
      .map(r => (r.getInt(0),
        Seq.tabulate(allGroupCols.length)(i => r.get(i + 1))) ->
        r.getAs[Long]("__n"))
    // offset(set, group, pid) = rows of that group in partitions < pid
    val setIdxInAll = groupSets.map(_.map(allGroupCols.indexOf))
    val offsetsPerSet: Seq[Map[(Int, Seq[Any]), Long]] = setIdxInAll.map {
      idx =>
        counts
          .groupBy { case ((pid, g), _) => (pid, idx.map(g)) }
          .map { case (k, vs) => k -> vs.map(_._2).sum }
          .groupBy { case ((_, g), _) => g }
          .flatMap { case (g, perPid) =>
            val sortedPids = perPid.map { case ((pid, _), n) => (pid, n) }
              .toSeq.sortBy(_._1)
            val cum = sortedPids.scanLeft(0L)(_ + _._2)
            sortedPids.map(_._1).zip(cum).map { case (pid, off) =>
              (pid, g) -> off
            }
          }
    }
    val bOffsets = spark.sparkContext.broadcast(offsetsPerSet)
    val groupIdxPerSet = groupSets.map(_.map(df.schema.fieldIndex))
    val outSchema = outCols.foldLeft(sorted.schema)(
      (s, c) => s.add(c, LongType, nullable = false))
    val nSets = groupSets.length
    val weightIdx = weightCol.map(df.schema.fieldIndex)
    val ranked = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val offs = bOffsets.value
      // a finer group set INTERLEAVES under a coarser set's sort order
      // (e.g. tags alternate within a value run), so each set keeps a
      // per-group counter map — sized by the partition's distinct groups,
      // the few-groups contract — not a single running counter
      val counters = Array.fill(nSets)(
        scala.collection.mutable.HashMap.empty[Seq[Any], Long])
      rows.map { r =>
        val w = weightIdx.map(i => r.get(i) match {
          case l: Long => l
          case i2: Int => i2.toLong
          case null => 0L // null weight contributes nothing, like sum()
        }).getOrElse(1L)
        var i = 0
        val ranks = new Array[Any](nSets)
        while (i < nSets) {
          val g = groupIdxPerSet(i).map(r.get)
          val c = counters(i).getOrElse(g,
            offs(i).getOrElse((pid, g), 0L)) + w
          counters(i)(g) = c
          ranks(i) = c
          i += 1
        }
        Row.fromSeq(r.toSeq ++ ranks)
      }
    }
    spark.createDataFrame(ranked, outSchema)
  }

  /** Equi-depth (equal-frequency) binning: assign each row to one of `k`
    * buckets of near-identical population — `ntile(k)` semantics (bucket
    * sizes differ by at most one, larger buckets first), but WITHOUT
    * ntile's empty OVER () clause, which moves the entire table into a
    * single task. Built on [[rangeRank]]: bucket = ((rank−1)·k) div n,
    * which reproduces ntile's fill exactly. One range exchange + a
    * broadcast one-row count; fully parallel at any scale.
    */
  def equiDepthBins(df: DataFrame, valueCol: String, tieCols: Seq[String],
                    k: Int, outCol: String = "bin"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val ranked = rangeRank(df.filter(col(valueCol).isNotNull), Nil,
      valueCol +: tieCols, "__edb_rk")
    val n = ranked.agg(count(lit(1)).as("__edb_n"))
    ranked.crossJoin(broadcast(n))
      // ntile's exact fill arithmetic (NOT floor(rank·k/n), which spreads
      // the remainder across the range instead of front-loading it):
      // the first n mod k buckets hold ceil(n/k) rows, the rest floor(n/k)
      .withColumn(outCol, expr(
        s"""CAST(CASE
           |  WHEN __edb_rk <= (__edb_n % $k) * (__edb_n div $k + 1)
           |  THEN (__edb_rk - 1) div (__edb_n div $k + 1)
           |  ELSE (__edb_n % $k) +
           |    (__edb_rk - 1 - (__edb_n % $k) * (__edb_n div $k + 1))
           |      div (__edb_n div $k)
           |END AS BIGINT)""".stripMargin))
      .drop("__edb_rk", "__edb_n")
  }

  /** Exact distributed quantiles: the value at rank `ceil(p·n)` (the
    * lower empirical quantile) for each requested probability — exact
    * like `percentile()` but WITHOUT its per-group value buffer, and
    * distributed unlike a single sort: one [[rangeRank]] pass + a
    * broadcast probe of the target ranks. The third exactness tier next
    * to `percentile` (exact, buffering) and `approx_percentile`
    * (GK sketch): exact AND constant-memory at any scale.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, tieCols: Seq[String],
                     probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    import df.sparkSession.implicits._
    val ranked = rangeRank(df.filter(col(valueCol).isNotNull), Nil,
      valueCol +: tieCols, "__eq_rk")
    val n = ranked.agg(count(lit(1)).as("__eq_n"))
    val p = probs.toDF("p")
    ranked.crossJoin(broadcast(n))
      .join(broadcast(p),
        col("__eq_rk") === ceil(col("p") * col("__eq_n")))
      .select(col("p"), col(valueCol).as("value"),
        col("__eq_rk").as("rank"))
  }

  /** Per-group Gini coefficient — the inequality/concentration measure
    * ("how skewed is spend across customers / tokens across documents"),
    * from the closed form over ascending-ranked values:
    * `G = (2·Σ(i·x_i) − (n+1)·Σx_i) / (n·Σx_i)`. Ranks come from
    * [[rangeRank]] (full parallelism, no per-group sort task); the two
    * sums run as DECIMAL(30,6)-quantized aggregates — order-independent
    * and engine-portable — and the final form is a fixed double tree,
    * rounded 6 dp. Negative values are rejected (Gini is defined on
    * non-negative quantities); groups with a zero sum are dropped.
    */
  def gini(df: DataFrame, valueCol: String, groupCols: Seq[String],
           tieCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "gini needs at least one group column")
    val v = col(valueCol)
    val ranked = rangeRank(df.filter(v.isNotNull), groupCols,
      valueCol +: tieCols, "__gi_rk")
    val d = "decimal(30,6)"
    val agg = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        min(v).as("__min"),
        sum(v.cast(d)).as("__sx"),
        sum((col("__gi_rk") * v).cast(d)).as("__six"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val six = col("__six").cast("double")
    agg
      .withColumn("gini",
        when(col("__min") < 0d,
          raise_error(lit("gini requires non-negative values")))
          .otherwise(when(sx > 0d,
            round((six * 2d - (n + 1d) * sx) / (n * sx), 6))))
      .filter(col("gini").isNotNull)
      .select(groupCols.map(col) :+ col("n") :+
        round(sx, 6).as("sum_value") :+ col("gini"): _*)
  }

  /** Lorenz curve at `k` equal-population points — "the bottom 10% of
    * orders carry x% of revenue", the curve whose area [[gini]]
    * summarizes. Rows bin by [[equiDepthBins]] (ntile fill, full
    * parallelism); per-bin sums are decimal-exact; the cumulative share
    * runs over the k-row bin frame — a fixed-size window whatever the
    * data volume. Output per bin: n, bin_sum, cum_share (6 dp).
    */
  def lorenz(df: DataFrame, valueCol: String, tieCols: Seq[String],
             k: Int = 10): DataFrame = {
    val binned = equiDepthBins(df, valueCol, tieCols, k)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(30,6)")).as("__bs"))
    val total = binned.agg(sum(col("__bs")).as("__tot"))
    // k rows total: the unpartitioned running sum is a fixed-size frame,
    // not a data-sized single-task sort
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    binned
      .withColumn("__cum", sum(col("__bs")).over(w))
      .crossJoin(broadcast(total))
      .select(col("bin"), col("n"),
        round(col("__bs").cast("double"), 6).as("bin_sum"),
        round(col("__cum").cast("double") / col("__tot").cast("double"), 6)
          .as("cum_share"))
  }

  /** Per-group empirical quantile transform: map each value to its
    * percent rank q = (rank−1)/(n_group−1) in [0, 1] — the
    * rank-normalization step ("quantile scaling") that makes features
    * comparable across arbitrary distributions. `rank` is the
    * [[rangeRank]] row_number under (value, tieCols); with a total
    * tie-break it equals SQL `percent_rank()`, computed with full
    * parallelism instead of one task per group. Singleton groups map to
    * q = 0. Transcendental-free exact integer ratio, rounded to 6 dp.
    */
  def quantileTransform(df: DataFrame, valueCol: String,
                        groupCols: Seq[String], tieCols: Seq[String],
                        outCol: String = "q"): DataFrame = {
    val ranked = rangeRank(df.filter(col(valueCol).isNotNull), groupCols,
      valueCol +: tieCols, "__qt_rk")
    val counts =
      if (groupCols.isEmpty)
        ranked.agg(count(lit(1)).as("__qt_n"))
      else
        ranked.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("__qt_n"))
    val joined =
      if (groupCols.isEmpty) ranked.crossJoin(broadcast(counts))
      else FrameOps.statsJoinOn(ranked, counts, groupCols)
    joined
      .withColumn(outCol,
        when(col("__qt_n") === 1L, 0.0).otherwise(
          round((col("__qt_rk") - 1L).cast("double") /
            (col("__qt_n") - 1L).cast("double"), 6)))
      .drop("__qt_rk", "__qt_n")
  }

  /** Cross-group quantile normalization — the batch-effect remover
    * (microarray-classic, and the cross-source score-equalizer of a
    * curation pipeline): each row's value is replaced by the POOLED
    * distribution's value at the row's within-group quantile, so every
    * group ends up with the identical marginal distribution while
    * preserving within-group order. Exact value-at-rank form: target
    * pooled rank = ceil(r·N / n_g) — integer arithmetic, no
    * interpolation convention to diverge on.
    *
    * Scale: two passes of the distributed rank core (per-group ranks,
    * pooled ranks — range sorts, never a single-task `OVER ()`), one
    * group-bounded size join, one equi-join on the computed target
    * rank. `tieCols` must complete a total order. ANSI note: r·N is a
    * long multiply — overflow is loud; beyond ~3·10⁹ rows route the
    * target-rank arithmetic through DECIMAL(38,0).
    */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, tieCols: Seq[String],
                        outCol: String = "normalized"): DataFrame = {
    require(groupCols.nonEmpty, "quantileNormalize needs group columns")
    val base = df.filter(col(valueCol).isNotNull)
    val ranked = rangeRank(base, groupCols, valueCol +: tieCols, "__qn_r")
    val sizes = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__qn_ng"))
    val pooled = rangeRank(base.select((valueCol +: tieCols).map(col): _*),
        Nil, valueCol +: tieCols, "__qn_R")
      .select(col("__qn_R").as("__qn_target"), col(valueCol).as(outCol))
    val n = base.agg(count(lit(1)).as("__qn_n"))
    ranked.join(sizes, groupCols)
      .crossJoin(broadcast(n))
      .withColumn("__qn_target",
        expr("(__qn_r * __qn_n + __qn_ng - 1) DIV __qn_ng"))
      .join(pooled, Seq("__qn_target"))
      .drop("__qn_r", "__qn_ng", "__qn_n", "__qn_target")
  }
}
