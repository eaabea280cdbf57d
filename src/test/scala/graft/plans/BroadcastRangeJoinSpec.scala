package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BroadcastRangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  BroadcastRangeJoin.register(spark)

  // AQE wraps the real plan; TreeNode.collect does not descend into
  // AdaptiveSparkPlanExec's captive plan, so unwrap it first
  private def unwrapped(df: DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  private def hasExec(df: DataFrame): Boolean =
    unwrapped(df).collect {
      case e: BroadcastPointInIntervalJoinExec => e
    }.nonEmpty

  private def points = Seq(0L, 3L, 4L, 5L, 10L, 12L, 15L, 99L).toDF("p")
  private def intervals = Seq(
    ("a", 0L, 5L), ("b", 4L, 12L), ("c", 20L, 30L), ("d", 4L, 4L))
    .toDF("name", "s", "e")

  test("hinted range join plans through the custom exec, not BNLJ") {
    val out = points.join(intervals.hint("broadcast"),
      col("p") >= col("s") && col("p") <= col("e"))
    assert(hasExec(out), out.queryExecution.executedPlan.toString)
    assert(!unwrapped(out).toString.contains("BroadcastNestedLoopJoin"))
    // the big side must not shuffle: no Exchange above the left scan
    val exchanges = unwrapped(out).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty)
  }

  test("matches the naive join exactly, including duplicates and bounds") {
    val fast = points.join(intervals.hint("broadcast"),
      col("p") >= col("s") && col("p") <= col("e"))
    assert(hasExec(fast))
    val naive = points.join(intervals,
      col("p") >= col("s") && col("p") <= col("e"))
    assert(!hasExec(naive)) // no hint -> Spark's own plan
    val k = (df: DataFrame) => df.select("p", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(k(fast) == k(naive))
    assert(k(fast).nonEmpty)
  }

  test("strict bounds and reversed operand order are honored") {
    for ((cond, expect) <- Seq(
      (col("p") > col("s") && col("p") < col("e"),
        Set((3L, "a"), (4L, "a"), (5L, "b"), (10L, "b"))),
      // reversed operands: s <= p, e >= p
      (col("s") <= col("p") && col("e") >= col("p"),
        Set((0L, "a"), (3L, "a"), (4L, "a"), (5L, "a"), (4L, "b"), (5L, "b"),
          (10L, "b"), (12L, "b"), (4L, "d"))))) {
      val out = points.join(intervals.hint("broadcast"), cond)
      assert(hasExec(out), cond.toString)
      val got = out.select("p", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expect, cond.toString)
    }
  }

  test("null points, null bounds, inverted intervals never match") {
    val ps = Seq(Some(5L), None).toDF("p")
    val ivs = Seq(
      (Some(10L), Some(0L)),  // inverted
      (None, Some(10L)),      // null start
      (Some(0L), None))       // null end
      .toDF("s", "e")
    val out = ps.join(ivs.hint("broadcast"),
      col("p") >= col("s") && col("p") <= col("e"))
    assert(hasExec(out))
    assert(out.isEmpty)
  }

  test("overlapping interval pileups emit every match once (prefix-max-end walk)") {
    // nested + staggered intervals around p=50, plus decoys with large
    // starts; exercises the back-walk early stop
    val ivs = (0L until 40L).map(i => (s"i$i", i, 100L - i)).toDF("name", "s", "e")
    val ps = Seq(50L).toDF("p")
    val fast = ps.join(ivs.hint("broadcast"),
      col("p") >= col("s") && col("p") <= col("e"))
    assert(hasExec(fast))
    // all 40 intervals contain 50
    assert(fast.count() == 40L)
    assert(fast.select("name").distinct().count() == 40L)
  }

  test("does not fire on conditions with extra conjuncts or equi-joins") {
    val ivs = intervals.withColumn("grp", lit(1L))
    val ps = points.withColumn("grp", lit(1L))
    val mixed = ps.join(ivs.hint("broadcast"),
      ps("grp") === ivs("grp") && ps("p") >= ivs("s") && ps("p") <= ivs("e"))
    assert(!hasExec(mixed)) // three conjuncts -> leave to Spark
    val equi = ps.join(ivs.hint("broadcast"), ps("grp") === ivs("grp"))
    assert(!hasExec(equi))
  }

  test("timestamp-typed bounds work (orderable non-numeric type)") {
    val ps = Seq("2024-01-05", "2024-02-01").toDF("d")
      .select(to_timestamp(col("d")).as("ts"))
    val ivs = Seq(("jan", "2024-01-01", "2024-01-31"))
      .toDF("name", "lo", "hi")
      .select(col("name"), to_timestamp(col("lo")).as("lo"),
        to_timestamp(col("hi")).as("hi"))
    val out = ps.join(ivs.hint("broadcast"),
      col("ts") >= col("lo") && col("ts") <= col("hi"))
    assert(hasExec(out))
    assert(out.count() == 1L)
  }

  test("register is idempotent") {
    BroadcastRangeJoin.register(spark)
    BroadcastRangeJoin.register(spark)
    assert(spark.experimental.extraStrategies
      .count(_ == BroadcastRangeJoinStrategy) == 1)
  }
}
