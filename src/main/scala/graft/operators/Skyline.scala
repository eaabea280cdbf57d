package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) query: the points no other point strictly
  * dominates — "best totalprice for every delivery-speed tradeoff",
  * model checkpoints on the quality/cost frontier, etc.
  *
  * Semantics: over the DISTINCT (x, y) value pairs (both maximized —
  * negate a column to minimize), a point survives iff no other point
  * has x' ≥ x AND y' ≥ y with strict inequality in at least one
  * dimension. Equal points collapse to one output row carrying
  * `n_rows`, the number of input rows at that exact point.
  *
  * Relational plan — never the O(n²) dominance self-join:
  *   1. distinct points with counts: one (x, y) aggregation;
  *   2. per-x best y: any same-x point below its x's maximum is
  *      strictly dominated — one x-keyed aggregation + equi-join,
  *      leaving ONE candidate per distinct x;
  *   3. dominance scan: in descending-x order, a candidate survives
  *      iff its y exceeds the running maximum y of all strictly-larger
  *      x — [[FrameOps.orderedRunning]]'s exclusive prefix-max (range
  *      exchange + bounded per-partition carry-ins, no single-task
  *      `OVER ()` window).
  * Output size is the frontier, never the input. The scan compares y
  * in double: exact for doubles/decimals ≤ 2^53 — callers with wider
  * longs should pre-scale.
  */
object Skyline {

  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val pts = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(x, y).agg(count(lit(1)).as("n_rows"))
    val bestPerX = pts.groupBy(x).agg(max(y).as(yCol))
    val cand = pts.join(bestPerX, Seq(xCol, yCol))
      .withColumn("__y", y.cast("double"))
    FrameOps.orderedRunning(cand, Seq(x.desc), "__y", "__pm",
        isMin = false, inclusive = false)
      .filter(col("__pm").isNull || col("__y") > col("__pm"))
      .select(x, y, col("n_rows"))
  }
}
