package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Shared frame-shaping helpers for the statistics operators — ONE
  * definition of the two idioms they all lean on, so a semantics fix
  * lands everywhere at once. (private[graft]: [[parallelized]] is also
  * used by query bodies and fixture builders outside this package.)
  */
private[graft] object FrameOps {

  /** Un-starve a scan-backed frame whose input is too few files to
    * feed the session's cores — the optimization guide's §2.5
    * "one huge unsplittable file" input-skew case, which is ALSO the
    * shape of a compacted snapshot table smaller than
    * `maxPartitionBytes`: Spark plans one task per packed file split,
    * so a single-file parquet corpus runs every downstream per-row
    * computation (tokenize+shingle+MinHash, payload decode, vector
    * math) on ONE core no matter how many the box has. The fix the
    * guide prescribes — "repartition immediately after the read" — is
    * applied HERE, conditionally:
    *
    *  - only when the frame is scan-backed with a knowable file list
    *    (`inputFiles`; mid-pipeline/post-shuffle frames return empty
    *    and pass through untouched — they already carry the session's
    *    shuffle parallelism);
    *  - only when that file count is below the session's core count —
    *    at production scale the scan has hundreds+ of splits and this
    *    is the identity, so nothing here is a local-mode constant;
    *  - with an EXPLICIT partition count (`repartition(n)` =
    *    REPARTITION_BY_NUM), which AQE never coalesces — a
    *    size-targeted rebalance would immediately re-fuse a small
    *    corpus back to one partition and re-starve the build.
    *
    * Cost when it fires: one round-robin exchange of the scan's bytes
    * (the corpus rows, never derived/expanded data). Callers are the
    * HEAVY per-row compute entry points, where that one exchange buys
    * core-count parallelism for the dominant stage.
    */
  def parallelized(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // idempotence: a frame that already flowed through a repartition /
    // rebalance (e.g. the table loader un-starved it at read time)
    // must not pay a second exchange here
    val repartitioned = df.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
      case r: org.apache.spark.sql.catalyst.plans.logical
          .RepartitionByExpression => r
      case r: org.apache.spark.sql.catalyst.plans.logical
          .RebalancePartitions => r
    }.isDefined
    // inputFiles is metadata-only (no job, no physical planning); a
    // frame shape it cannot answer for is left untouched
    val nFiles = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (!repartitioned && nFiles > 0 && nFiles < cores) df.repartition(cores)
    else df
  }

  /** Null-safe equi-join of a per-group stats frame onto `d`: the stats
    * keys are prefixed (`__k_`) to avoid capture, compared with `<=>`
    * (a null group is a real group), and dropped after the join.
    * `stats` is group-cardinality-sized — usually tiny, but group sets
    * are caller-chosen, so join selection is deliberately left to
    * Catalyst/AQE (`<=>` extracts as an equi-key): a high-cardinality
    * group set degrades to a shuffle join instead of OOMing a forced
    * broadcast.
    */
  def statsJoinOn(d: DataFrame, stats: DataFrame,
                  keys: Seq[String]): DataFrame = {
    val statCols = stats.columns.filterNot(keys.contains).map(col)
    val keyed = stats.select(keys.map(c => col(c).as(s"__k_$c")) ++
      statCols: _*)
    d.join(keyed,
      keys.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _))
      .drop(keys.map(c => s"__k_$c"): _*)
  }

  /** Pivot a per-(group, tag) stats frame into one row per group with
    * `<carry>_a` / `<carry>_b` columns, where sample `a` is the
    * lexicographically smaller tag. Groups WITHOUT EXACTLY TWO tags are
    * dropped — a two-sample statistic is undefined otherwise (and a
    * silent first-two selection would diverge from an all-pairs SQL
    * mirror). The window partitions are tag-cardinality-sized.
    */
  def twoSamplePivot(stats: DataFrame, groupCols: Seq[String],
                     tagCol: String, carryCols: Seq[String]): DataFrame = {
    val gc = groupCols.map(col)
    val w = Window.partitionBy(gc: _*)
    val ranked = stats
      .withColumn("__rn", row_number().over(w.orderBy(col(tagCol))))
      .withColumn("__nt", count(lit(1)).over(w))
      .filter(col("__nt") === 2L)
    val sa = ranked.filter(col("__rn") === 1).select(
      gc ++ (tagCol +: carryCols).map(c => col(c).as(s"${c}_a")): _*)
    val sb = ranked.filter(col("__rn") === 2).select(
      groupCols.map(c => col(c).as(s"__kb_$c")) ++
        (tagCol +: carryCols).map(c => col(c).as(s"${c}_b")): _*)
    sa.join(sb,
      groupCols.map(c => col(c) <=> col(s"__kb_$c")).reduce(_ && _))
      .drop(groupCols.map(c => s"__kb_$c"): _*)
  }

  /** Distributed running min/max of a double column in `sortExprs`
    * order, WITHOUT the single-task `OVER ()` window: one range
    * exchange, a per-partition extremum metadata agg (bounded at
    * numPartitions rows on the driver), a driver prefix scan for the
    * carry-ins, and a forward streaming pass per partition. `inclusive`
    * includes the current row (the suffix-min shape, e.g. BH q-values);
    * exclusive emits the extremum over strictly-preceding rows — null
    * for the first row (the dominance-scan shape, e.g. skyline).
    * Extrema are single `min`/`max` comparisons over exact doubles — no
    * accumulation, so no quantization is needed for portability.
    */
  /** Distributed 1-based rank + INCLUSIVE running long sum in
    * `sortExprs` order, without the single-task `OVER ()` window: the
    * [[orderedRunning]] scheme with (row-count, Σ) carries — one range
    * exchange, a per-partition (rows, Σvalue) metadata agg (bounded at
    * numPartitions rows on the driver), a driver prefix scan for the
    * carry-ins, and one forward streaming pass per partition emitting
    * both columns. Long arithmetic throughout — exact and loud on
    * overflow. `sortExprs` must be a total order for deterministic
    * ranks; `valueCol` must be LongType and non-null.
    */
  def orderedPrefixSum(df: DataFrame, sortExprs: Seq[Column],
                       valueCol: String, rankCol: String,
                       sumCol: String): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"orderedPrefixSum needs a LongType $valueCol")
    val nPart = spark.sessionState.conf.numShufflePartitions
    val sorted = TrackedCaches.track(
      df.repartitionByRange(nPart, sortExprs: _*)
        .sortWithinPartitions(sortExprs: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val partStats = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // carry(pid) = (rows, Σ) over partitions BEFORE pid in sort order:
    // scanLeft's N prefixes are exclusive by construction
    val carryIn = partStats.map(_._1).zip(
      partStats.scanLeft((0L, 0L)) { case ((an, as), (_, n, s)) =>
        (an + n, as + s)
      }).toMap
    val bCarry = spark.sparkContext.broadcast(carryIn)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField(rankCol, LongType, nullable = false),
      StructField(sumCol, LongType, nullable = false)))
    val scanned = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var (rank, run) = bCarry.value.getOrElse(pid, (0L, 0L))
      rows.map { r =>
        rank += 1L
        run = Math.addExact(run, r.getLong(vIdx))
        Row.fromSeq(r.toSeq ++ Seq(rank, run))
      }
    }
    spark.createDataFrame(scanned, outSchema)
  }

  def orderedRunning(df: DataFrame, sortExprs: Seq[Column],
                     valueCol: String, outCol: String, isMin: Boolean,
                     inclusive: Boolean): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val sorted = TrackedCaches.track(
      df.repartitionByRange(nPart, sortExprs: _*)
        .sortWithinPartitions(sortExprs: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val extreme = if (isMin) min(col(valueCol)) else max(col(valueCol))
    val partExt = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(extreme.as("__ext")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    val init = if (isMin) Double.PositiveInfinity else Double.NegativeInfinity
    val op: (Double, Double) => Double =
      if (isMin) math.min else math.max
    // carry(pid) = extremum over partitions BEFORE pid in sort order
    val carryIn = partExt.map(_._1)
      .zip(partExt.map(_._2).scanLeft(init)(op)).toMap
    val bCarry = spark.sparkContext.broadcast(carryIn)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(outCol, DoubleType, nullable = !inclusive))
    val scanned = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var running = bCarry.value.getOrElse(pid, init)
      rows.map { r =>
        val v = r.getDouble(vIdx)
        val emitted: Any =
          if (inclusive) { running = op(running, v); running }
          else {
            val prev = if (running == init) null else (running: Any)
            running = op(running, v)
            prev
          }
        Row.fromSeq(r.toSeq :+ emitted)
      }
    }
    spark.createDataFrame(scanned, outSchema)
  }
}
