package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT an equi-key — "which maintenance
  * windows / campaign flights / outage intervals does this event fall
  * in". Spark plans a bare `p BETWEEN s AND e` join as a broadcast
  * nested-loop (or cartesian) join: O(|points| × |intervals|) compares
  * and a full broadcast of one side — the classic scale killer.
  *
  * This operator makes it an equi-join: points hash into fixed-width
  * buckets (`bucket = floor(point / bucketWidth)`), each interval is
  * exploded to the buckets it covers, the two sides equi-join on the
  * bucket id, and the exact BETWEEN predicate refines. A point's single
  * bucket appears once in each covering interval's bucket list, so every
  * true (point, interval) pair joins exactly once — no dedup step.
  *
  * Scale properties:
  *  - shuffle is hash-partitioned on the bucket id — normal exchange,
  *    no broadcast of a big side, AQE-manageable;
  *  - interval replication = number of buckets covered; pick
  *    `bucketWidth` near the typical interval length so replication
  *    stays a small constant (width much smaller than intervals →
  *    replication blowup; much larger → every interval in a bucket is
  *    compared against every point in it);
  *  - false candidates (same bucket, no containment) are discarded by
  *    the refine filter at join time — never materialized;
  *  - a time-skewed workload (all points in one hot bucket) degrades to
  *    the true-match density of that bucket, which is output the join
  *    must produce anyway.
  *
  * Semantics: inclusive on both ends (`s <= p <= e`, SQL BETWEEN). Rows
  * with a null point or null bound never match; intervals with
  * `start > end` match nothing (as BETWEEN). Bound columns must be
  * integral (epoch days/seconds/micros — caller converts timestamps).
  */
object RangeJoin {

  /** `floor(c / w)` in exact integer arithmetic: subtracting `pmod`
    * (always in [0, w)) lands on the floor multiple while staying in
    * LONG — `floor(col / w)` would round-trip epoch-micros-sized longs
    * through double and lose low bits; the decimal division of an exact
    * multiple is exact, and truncation to long equals the floor.
    */
  private def bucketOf(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol), bucketWidth))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(startCol), bucketWidth),
        bucketOf(col(endCol), bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval × interval overlap join (`ls <= re AND rs <= le`,
    * inclusive) — "which outages intersect which deploy windows". Same
    * bucketing idea as [[pointInInterval]], with one extra subtlety: two
    * overlapping intervals share EVERY bucket their intersection covers,
    * so a plain bucket equi-join would emit the pair once per shared
    * bucket. Instead of a distinct pass (a full extra shuffle of the
    * output), each pair is kept only at its FIRST shared bucket —
    * `max(bucket(ls), bucket(rs))`, a value both sides compute locally —
    * which exists for every truly overlapping pair and is unique per
    * pair, so each match emits exactly once with no dedup.
    *
    * Column names from the two inputs must not collide (callers rename;
    * the operator's own bucket column is transient).
    */
  def intervalOverlap(left: DataFrame, leftStart: String, leftEnd: String,
                      right: DataFrame, rightStart: String, rightEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // each side carries its start bucket as a column so the
    // first-shared-bucket filter below compares precomputed values —
    // re-deriving bucketOf per joined candidate would redo the decimal
    // arithmetic once per candidate pair instead of once per input row
    def exploded(df: DataFrame, s: String, e: String, b0: String) = df
      .filter(col(s) <= col(e))
      .withColumn(b0, bucketOf(col(s), bucketWidth))
      .withColumn("__bucket", explode(sequence(
        col(b0), bucketOf(col(e), bucketWidth))))
    exploded(left, leftStart, leftEnd, "__lb0")
      .join(exploded(right, rightStart, rightEnd, "__rb0"), Seq("__bucket"))
      .filter(col("__bucket") === greatest(col("__lb0"), col("__rb0")))
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd))
      .drop("__bucket", "__lb0", "__rb0")
  }
}
