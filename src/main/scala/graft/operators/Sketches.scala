package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, via
  * Spark's built-in `hll_sketch_agg` family): the INCREMENTAL path for
  * corpus-wide cardinality at 100 TB. `approx_count_distinct` answers
  * one query in one pass but leaves nothing behind; a persisted sketch
  * frame (one binary column per partition/source/day) lets tomorrow's
  * job fold ONLY tomorrow's data and union register-wise — the same
  * additivity shape as [[Fingerprint]] checksums, for cardinality.
  *
  * Register-wise union takes the per-register MAX, so the merged
  * estimate is order- and partitioning-independent (deterministic for a
  * fixed input set, same as any one-pass build over the union — the
  * [[graft]] reproducibility bar), and sketch bytes survive a parquet
  * round trip losslessly.
  *
  * Accuracy is the standard HLL bound (~1.04/√2^lgK ≈ 1.6% relative
  * error at the default lgK=12, ~4 KB per sketch); exact distinct
  * stays available from [[Profile.profile]] where the corpus is small
  * enough to afford it.
  */
object Sketches {

  /** One row per group: `(groupCols…, sketch BINARY, estimate BIGINT)`.
    * Null keys are excluded (HLL counts values; `count_distinct`
    * semantics), matching the exact-distinct convention.
    */
  def distinctSketch(df: DataFrame, keyCol: String, groupCols: Seq[String],
                     lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK out of DataSketches range: $lgK")
    val gc = groupCols.map(col)
    val base = df.filter(col(keyCol).isNotNull)
      .groupBy(gc: _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))
    base.withColumn("estimate", hll_sketch_estimate(col("sketch")))
  }

  /** Fold a sketch frame down to one row per coarser group set (empty =
    * whole corpus): register-wise union, then the merged estimate —
    * runs on the SKETCH frame (∝ groups × 4 KB), never the corpus.
    */
  def mergeSketches(sketches: DataFrame,
                    groupCols: Seq[String] = Nil): DataFrame = {
    val merged =
      if (groupCols.isEmpty) sketches.groupBy()
        .agg(hll_union_agg(col("sketch")).as("sketch"))
      else sketches.groupBy(groupCols.map(col): _*)
        .agg(hll_union_agg(col("sketch")).as("sketch"))
    merged.withColumn("estimate", hll_sketch_estimate(col("sketch")))
  }
}
