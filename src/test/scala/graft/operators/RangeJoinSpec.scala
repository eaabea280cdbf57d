package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  test("matches are exact, inclusive, and never duplicated across buckets") {
    val points = Seq(0L, 5L, 10L, 15L).toDF("p")
    // b spans buckets 1..3 at width 4 — its matches must appear once
    val intervals = Seq(("a", 0L, 5L), ("b", 4L, 12L), ("c", 20L, 30L))
      .toDF("name", "s", "e")
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
        bucketWidth = 4)
      .select(col("p"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((0L, "a"), (5L, "a"), (5L, "b"), (10L, "b")))
  }

  test("negative values bucket by floor, not truncation") {
    val points = Seq(-5L).toDF("p")
    val intervals = Seq(("n", -6L, -3L)).toDF("name", "s", "e")
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
      bucketWidth = 3)
    assert(out.count() == 1L)
  }

  test("inverted and null intervals match nothing; null points match nothing") {
    val points = Seq(Some(5L), None).toDF("p")
    val intervals = Seq(
      (Some(10L), Some(0L)),   // inverted
      (None, Some(10L)),       // null start
      (Some(0L), None)).toDF("s", "e") // null end
    assert(RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
      bucketWidth = 4).isEmpty)
  }

  test("equivalent to the naive BETWEEN join on generated data") {
    val points = spark.range(0, 500)
      .select(pmod(xxhash64(col("id")), lit(1000L)).as("p"), col("id").as("pid"))
    val intervals = spark.range(0, 200)
      .select(col("id").as("iid"),
        pmod(xxhash64(col("id"), lit(1)), lit(1000L)).as("s"))
      .withColumn("e", col("s") + pmod(col("iid"), lit(40L)))
    val fast = RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
        bucketWidth = 32)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"))
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(fast.nonEmpty, "generated data must produce matches")
  }

  test("plan is an equi-join on the bucket, not a nested-loop join") {
    val points = spark.range(0, 100).select(col("id").as("p"))
    val intervals = spark.range(0, 50)
      .select(col("id").as("s"), (col("id") + 10).as("e"))
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
        bucketWidth = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("interval overlap: exact, inclusive, one row per overlapping pair") {
    // a=[0,10] spans buckets 0..2; b=[8,20] spans 2..5 — they share
    // buckets 2 only... widen: c=[2,9] shares buckets 0..2 with a: the
    // pair (a,c) must emit ONCE despite 3 shared buckets
    val left = Seq(("a", 0L, 10L), ("x", 30L, 31L)).toDF("ln", "ls", "le")
    val right = Seq(("b", 8L, 20L), ("c", 2L, 9L), ("d", 11L, 12L))
      .toDF("rn", "rs", "re")
    val out = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
        bucketWidth = 4)
      .select(col("ln"), col("rn")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.length == out.toSet.size, "no pair may emit twice")
    // a overlaps b (8..10) and c (2..9); touching endpoints are inclusive;
    // d=[11,12] does not reach a=[0,10]; x matches nothing
    assert(out.toSet == Set(("a", "b"), ("a", "c")))
  }

  test("interval overlap equals the naive join on generated data") {
    val left = spark.range(0, 300)
      .select(col("id").as("lid"),
        pmod(xxhash64(col("id")), lit(500L)).as("ls"))
      .withColumn("le", col("ls") + pmod(col("lid"), lit(30L)))
    val right = spark.range(0, 300)
      .select(col("id").as("rid"),
        pmod(xxhash64(col("id"), lit(7)), lit(500L)).as("rs"))
      .withColumn("re", col("rs") + pmod(col("rid"), lit(50L)))
    val fast = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
        bucketWidth = 32)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.join(right,
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast.length == fast.toSet.size, "duplicate pairs emitted")
    assert(fast.toSet == naive)
    assert(naive.nonEmpty)
  }

  test("bucket width sweep: every width gives the identical result set") {
    val points = spark.range(0, 400)
      .select(pmod(xxhash64(col("id")), lit(700L)).as("p"), col("id").as("pid"))
    val intervals = spark.range(0, 150)
      .select(col("id").as("iid"),
        pmod(xxhash64(col("id"), lit(3)), lit(700L)).as("s"))
      .withColumn("e", col("s") + pmod(col("iid"), lit(45L)))
    def run(w: Long) = RangeJoin.pointInInterval(points, "p", intervals,
        "s", "e", bucketWidth = w)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = run(1L)
    for (w <- Seq(2L, 7L, 32L, 100L, 1000L))
      assert(run(w) == expected, s"width $w diverged")
    def runOv(w: Long) = RangeJoin.intervalOverlap(
        intervals.select(col("iid").as("lid"), col("s").as("ls"), col("e").as("le")),
        "ls", "le",
        intervals.select(col("iid").as("rid"), col("s").as("rs"), col("e").as("re")),
        "rs", "re", bucketWidth = w)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectedOv = runOv(1L)
    assert(expectedOv.length == expectedOv.toSet.size)
    for (w <- Seq(2L, 7L, 32L, 100L, 1000L)) {
      val got = runOv(w)
      assert(got.length == got.toSet.size, s"width $w emitted duplicates")
      assert(got.toSet == expectedOv.toSet, s"width $w diverged")
    }
  }

  test("epoch-micros-scale longs bucket exactly (no double rounding)") {
    val base = 1700000000000000L // ~1.7e15 micros
    val points = Seq(base + 1L).toDF("p")
    val intervals = Seq((base, base + 2L)).toDF("s", "e")
    assert(RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
      bucketWidth = 3600000000L).count() == 1L)
  }
}
