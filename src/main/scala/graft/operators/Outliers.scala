package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Outlier treatment for numeric feature columns: per-group
  * winsorization — clip values to the group's [lower, upper] exact
  * percentiles — the standard robust-statistics cleanup before loss
  * weighting / reward normalization (a handful of corrupt readings
  * otherwise drag a whole group's statistics).
  *
  * Plan shape: one group-aggregate computes the two percentile bounds
  * (rows out = number of groups), broadcast back onto the input, then a
  * per-row clip — the data is scanned twice but shuffled ZERO times for
  * the clip itself (the bounds frame is the only exchange, one row per
  * group).
  *
  * 100 TB note: exact `percentile` buffers each group's values during
  * aggregation — fine for bounded group counts with bounded cardinality
  * per value (it buffers value→count), but the petabyte default should
  * be `exact = false`, which swaps in `approx_percentile`
  * (GK-sketch, constant state per group, rank error ≤ 1/accuracy).
  */
object Outliers {

  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                lower: Double = 0.01, upper: Double = 0.99,
                exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(lower >= 0 && upper <= 1 && lower < upper,
      s"need 0 <= lower < upper <= 1, got [$lower, $upper]")
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    val boundsAgg =
      if (exact) Seq(
        expr(s"percentile($valueCol, $lower)").as("__lo"),
        expr(s"percentile($valueCol, $upper)").as("__hi"))
      else Seq(
        expr(s"approx_percentile($valueCol, $lower, $accuracy)").cast("double").as("__lo"),
        expr(s"approx_percentile($valueCol, $upper, $accuracy)").cast("double").as("__hi"))
    val bounds = df.groupBy(groupCols.map(col): _*).agg(boundsAgg.head, boundsAgg.tail: _*)
    // null-SAFE join keys: groupBy treats a null key as a real group (so
    // the bounds frame has a row for it), but a plain equi-join would
    // silently DROP every null-group input row (null != null) — the
    // null group must clip against its own bounds like any other
    val renamedBounds = bounds.select(
      (groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__lo") :+ col("__hi")): _*)
    val joinCond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(broadcast(renamedBounds), joinCond, "left")
      // greatest/least skip nulls (Postgres semantics in Spark AND
      // DuckDB) — they would clip a null value to the lower bound;
      // a null measurement must stay null
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop(groupCols.map(c => s"__g_$c") :+ "__lo" :+ "__hi": _*)
  }
}
