package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the shuffle-volume lever for big×medium
  * joins at 100 TB: when the probe side is far larger than the build side
  * but the build side is too big to broadcast-join OUTRIGHT, build a
  * Bloom filter over the build side's join keys (one aggregation), ship
  * it to every scan task, and drop probe rows that cannot possibly match
  * BEFORE they are shuffled. With join selectivity s and false-positive
  * rate p, shuffle volume falls to ~(s + p) of the probe side for one
  * extra scan-side membership test per row.
  *
  * This is what Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, the
  * InjectRuntimeFilter rule) does adaptively; this operator is the
  * explicit, always-on form with a verifiable contract:
  * [[prunedJoin]] ≡ the plain join (Bloom filters have NO false
  * negatives; false positives survive the pre-filter but are eliminated
  * by the real join that follows).
  *
  * The membership test is a Scala UDF over the broadcast sketch — the
  * one documented UDF in this library: the test runs once per probe row
  * at the scan (before the exchange), where its cost is noise against
  * the shuffle bytes it saves, and Spark's codegen'd
  * `BloomFilterMightContain` expression is optimizer-internal (not
  * constructible from the public API).
  */
object BloomPrune {

  /** Build a [[BloomFilter]] on `small`'s `key` column (driver-side
    * sketch via `DataFrameStatFunctions.bloomFilter` — one pass, merged
    * per partition; size it with `expectedItems` ≈ |distinct keys|).
    */
  def buildFilter(small: DataFrame, key: String, expectedItems: Long,
                  fpp: Double = 0.01): BloomFilter =
    small.stat.bloomFilter(key, expectedItems, fpp)

  /** `big` restricted to rows whose `key` MIGHT be in `filter` (no false
    * negatives — every truly-matching row survives).
    */
  def pruned(big: DataFrame, key: String, filter: BloomFilter): DataFrame = {
    val bc = big.sparkSession.sparkContext.broadcast(filter)
    // boxed Long: a NULL key reaches the lambda as null (a primitive
    // parameter would silently read as 0) and never matches — same as the
    // equi-join it guards
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big.filter(mightContain(col(key)))
  }

  /** The pruned equi-join: semantically identical to
    * `big.join(small, big(key) === small(smallKey))`, with the probe side
    * Bloom-pruned before the shuffle. Keys must be integral (long-typed
    * membership test — the common key shape; string keys hash first at
    * the caller).
    */
  def prunedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(small, smallKey, expectedItems, fpp)
    pruned(big, bigKey, bf).join(small, col(bigKey) === col(smallKey))
  }

  /** Bloom-accelerated ANTI join — the incremental-dedup accelerator for
    * the common case where most of a new batch is genuinely new: rows
    * whose key the filter has NEVER seen are definitely-new (no false
    * negatives) and bypass the join entirely; only the might-match
    * minority pays the anti-join shuffle. Semantically identical to
    * `big.join(hist, bigKey === histKey, "left_anti")`: false positives
    * go through the real anti-join and come out correctly.
    *
    * `big` is EVALUATED TWICE (the two complementary filter branches) —
    * deliberate: the typical probe side is a column-pruned scan, and
    * re-scanning it is far cheaper than shuffling the definitely-new
    * majority through the join (a single-plan anti-join with the flag as
    * a residual condition would shuffle every row and erase the win).
    * Pass a scan-rooted or persisted frame, not an expensive uncached
    * subtree.
    */
  def prunedAntiJoin(big: DataFrame, hist: DataFrame,
                     bigKey: String, histKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(hist, histKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    // NULL keys: never in the filter -> definitely-new, matching anti-join
    // semantics (a null key matches no history row)
    val definitelyNew = big.filter(!mightContain(col(bigKey)))
    val maybe = big.filter(mightContain(col(bigKey)))
      .join(hist, col(bigKey) === col(histKey), "left_anti")
    definitelyNew.unionByName(maybe)
  }

  /** Observability hook for specs/operators: fraction of `big` surviving
    * the pre-filter (1.0 means the filter prunes nothing).
    */
  def survivalFraction(big: DataFrame, key: String, filter: BloomFilter): Double = {
    val total = big.count()
    if (total == 0) 1.0 else pruned(big, key, filter).count().toDouble / total
  }
}
