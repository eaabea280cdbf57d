package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable per-group aggregate STATE — the map-side-combine principle
  * reified as a user-level artifact. A 100 TB history never needs
  * rescanning: each ingest batch reduces to one state row per group
  * ([[state]]), states from any partitioning of the data merge exactly
  * ([[merge]] — decimal sums are associative, min/max idempotent), and
  * the statistics a consumer wants are a pure projection of the state
  * ([[finalizeStats]]). `state(A ∪ B) = merge(state(A), state(B))`
  * bit-for-bit, which is what makes nightly-state + rollup maintenance
  * EXACT, not approximate — unlike double-accumulated running stats,
  * whose low bits depend on merge order.
  *
  * State columns per group: `n` (non-null count), `s` (DECIMAL(·,6)
  * value sum), `s2` (DECIMAL(·,12) sum of squared doubles), `min_v`,
  * `max_v`. Null values carry no information and are dropped; inserts
  * only (a retractable variant would need sum/count deltas and cannot
  * support min/max without group recompute — the documented trade).
  *
  * Value-domain bound: the per-row DECIMAL(28,12) square keeps 16
  * integer digits, so |value| must stay below 1e8 (the square below
  * 1e16) — exceeding it fails LOUDLY under ANSI mode rather than
  * corrupting state. Rescale larger-magnitude units (e.g. cents →
  * dollars) before the state pass; the SUM side has 10 further digits
  * of headroom and is not the binding constraint.
  */
object AggState {

  /** Reduce a batch to one mergeable state row per group. */
  def state(df: DataFrame, groupCols: Seq[String],
            valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "state needs at least one group column")
    val v = col(valueCol)
    df.filter(v.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(v.cast("decimal(18,6)")).as("s"),
        sum((v.cast("double") * v.cast("double")).cast("decimal(28,12)"))
          .as("s2"),
        min(v.cast("double")).as("min_v"),
        max(v.cast("double")).as("max_v"))
  }

  /** Merge state frames from disjoint batches: union + re-aggregate.
    * Exact — decimal sums are order-free, so the result equals the
    * state of the concatenated input. Groups may appear in any subset
    * of the batches.
    */
  def merge(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"), sum(col("s")).as("s"),
        sum(col("s2")).as("s2"), min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Project consumer statistics out of a state frame: n, mean, sample
    * stddev (null for n = 1), min, max. The variance runs in a fixed
    * double tree over the exact decimal sums (`greatest(·, 0)` guards
    * the tiny negative epsilon double rounding can leave); 6 dp.
    */
  def finalizeStats(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    val nd = col("n").cast("double")
    val sd = col("s").cast("double")
    val s2d = col("s2").cast("double")
    val variance = greatest((s2d - sd * sd / nd) / (nd - lit(1.0)), lit(0.0))
    state.select(groupCols.map(col) ++ Seq(col("n"),
      round(sd / nd, 6).as("mean"),
      when(col("n") > 1L, round(sqrt(variance), 6)).as("stddev"),
      col("min_v"), col("max_v")): _*)
  }
}
