package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

/** The distributed prefix core: rank + inclusive running sum computed
  * via range partitioning + carry-ins, never a single-task `OVER ()`.
  */
class FrameOpsSpec extends SparkSpecBase {

  import spark.implicits._

  test("orderedPrefixSum: ranks and inclusive sums match the hand trace") {
    val df = Seq(("c", 5L), ("a", 2L), ("b", 3L), ("d", 1L))
      .toDF("k", "v")
    val out = FrameOps
      .orderedPrefixSum(df, Seq(col("k")), "v", "rank", "cum")
      .orderBy("rank")
      .select("k", "v", "rank", "cum")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 2L, 1L, 2L), ("b", 3L, 2L, 5L),
      ("c", 5L, 3L, 10L), ("d", 1L, 4L, 11L)))
  }

  test("orderedPrefixSum: descending order, partition-count invariant") {
    val n = 500
    val df = (1 to n).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) = FrameOps
      .orderedPrefixSum(d, Seq(col("v").desc, col("id")), "v",
        "rank", "cum")
      .orderBy("rank").select("id", "rank", "cum")
      .as[(Long, Long, Long)].collect().toSeq
    val base = run(df)
    assert(base === run(df.repartition(13)))
    // rank is a permutation of 1..n; cum is non-decreasing and ends at Σv
    assert(base.map(_._2) === (1L to n.toLong))
    assert(base.last._3 === (1 to n).map(_ % 7).sum.toLong)
    assert(base.map(_._3).sliding(2).forall(p => p.head <= p.last))
  }

  test("orderedPrefixSum rejects a non-long value column") {
    val df = Seq(("a", 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      FrameOps.orderedPrefixSum(df, Seq(col("k")), "v", "rank", "cum")
    }
  }
}
