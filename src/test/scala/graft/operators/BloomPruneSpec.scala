package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpecBase {

  import spark.implicits._

  test("pruned join equals the plain join exactly") {
    val big = (0L until 10000L).map(i => (i, s"v$i")).toDF("k", "payload")
    val small = (0L until 10000L by 37L).map(i => (i, i * 2)).toDF("sk", "attr")
    val fast = BloomPrune.prunedJoin(big, small, "k", "sk",
        expectedItems = 300, fpp = 0.03)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(fast == plain)
    assert(fast.size == small.count())
  }

  test("no false negatives; pruning actually drops most non-matching rows") {
    val big = (0L until 20000L).toDF("k")
    val keys = (0L until 20000L by 100L).toDF("sk") // 200 keys, 1% of big
    val bf = BloomPrune.buildFilter(keys, "sk", expectedItems = 200, fpp = 0.01)
    val surviving = BloomPrune.pruned(big, "k", bf)
      .collect().map(_.getLong(0)).toSet
    // every true key survives
    (0L until 20000L by 100L).foreach(k => assert(surviving.contains(k)))
    // survival ~ selectivity + fpp: 1% + 1% -> well under 10%
    val frac = BloomPrune.survivalFraction(big, "k", bf)
    assert(frac < 0.1, s"survival fraction $frac")
  }

  test("null keys are dropped by the pre-filter, matching equi-join semantics") {
    val big = Seq(Some(1L), Some(2L), None).toDF("k")
    val small = Seq(1L).toDF("sk")
    val bf = BloomPrune.buildFilter(small, "sk", expectedItems = 10)
    val out = BloomPrune.pruned(big, "k", bf).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("prunedAntiJoin equals the plain anti-join, null keys included") {
    val batch = ((0L until 5000L).map(Option(_)) ++ Seq(None, None))
      .map(k => (k, "p")).toDF("k", "payload")
    val hist = (0L until 5000L by 9L).toDF("hk")
    val fast = BloomPrune.prunedAntiJoin(batch, hist, "k", "hk",
        expectedItems = 600, fpp = 0.02)
      .collect().map(r => Option(r.get(0))).toSeq.sorted(
        Ordering.by((o: Option[Any]) => o.map(_.toString).getOrElse("")))
    val plain = batch.join(hist, col("k") === col("hk"), "left_anti")
      .collect().map(r => Option(r.get(0))).toSeq.sorted(
        Ordering.by((o: Option[Any]) => o.map(_.toString).getOrElse("")))
    assert(fast == plain)
    // null keys match no history row -> both keep them
    assert(fast.count(_.isEmpty) == 2)
  }

  test("the pre-filter sits below the join in the plan (prunes before shuffle)") {
    // file-backed inputs: with in-memory LocalRelations the optimizer
    // evaluates the filter at plan time and the shape under test vanishes
    val big = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("k"))
    val small = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("sk"))
    val joined = BloomPrune.prunedJoin(big, small, "k", "sk", expectedItems = 500)
    val plan = joined.queryExecution.optimizedPlan
    // the UDF filter must apply to the big side BEFORE the join node
    val joinNode = plan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joinNode.isDefined)
    val leftHasFilter = joinNode.get.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("UDF") => f
    }.isDefined
    assert(leftHasFilter, plan.toString)
  }
}
