package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state — the continuous
  * counterpart of the batch as-of/interval joins: correlating two live
  * event streams (e.g. purchases against the signup stream, impressions
  * against clicks) where BOTH sides keep arriving.
  *
  * Scale design: Spark buffers each side's rows as join state sharded by
  * the equi-join key across executors; the time-interval condition plus
  * both watermarks give the engine a provable bound for state eviction —
  * without them stream-stream state grows forever. State is per-key and
  * horizontal, no driver structures; a 1000-executor cluster holds it the
  * same way it holds streaming-aggregation state.
  */
object StreamingJoin {

  /** Inner-join two event streams on `keyCol` where the right event falls
    * within `[left.ts − lookback, left.ts]` — "the most recent context a
    * correlated stream provides", e.g. each purchase joined to the signup
    * that preceded it within the lookback horizon. Emits one row per
    * qualifying pair (NOT only the latest — dedup/argmax over unbounded
    * streams is a separate aggregation concern); columns are the left
    * row's plus the right's `payloadCols` prefixed `r_`.
    *
    * Both sides are watermarked with `watermarkDelay`: left state can be
    * dropped once the right watermark passes `ts`, right state once the
    * left watermark passes `ts + lookback` — Spark derives both bounds
    * from the join condition.
    */
  def joinWithin(left: DataFrame, right: DataFrame, keyCol: String,
                 lookback: String, watermarkDelay: String = "10 minutes",
                 tsCol: String = "ts",
                 payloadCols: Seq[String] = Seq.empty): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay).alias("l")
    // right key is the join key — it never appears in the output
    val rCols = col(s"r.$tsCol").as("r_ts") +:
      payloadCols.map(c => col(s"r.$c").as(s"r_$c"))
    val r = right.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol) +: col(tsCol) +: payloadCols.map(col): _*)
      .alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") - expr(s"INTERVAL $lookback") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol"))
      .select(col("l.*") +: rCols: _*)
  }
}
