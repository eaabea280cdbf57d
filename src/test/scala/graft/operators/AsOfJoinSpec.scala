package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("attaches the most recent right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(10), 110.0), (1L, ts(20), 120.0),
      (2L, ts(5), 200.0)).toDF("key", "ts", "price")
    val trades = Seq(
      (1L, ts(10), "a"),   // exact-tie → inclusive match at 110
      (1L, ts(15), "b"),   // between → 110
      (1L, ts(25), "c"),   // after last → 120
      (2L, ts(1), "d"),    // before any quote → null
      (3L, ts(9), "e")     // key with no quotes → null
    ).toDF("key", "ts", "tag")

    val out = AsOfJoin.asOf(trades, quotes, "key", "ts", Seq("price"))
      .select("tag", "asof_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out == Map("a" -> Some(110.0), "b" -> Some(110.0), "c" -> Some(120.0),
      "d" -> None, "e" -> None))
  }

  test("ties among right rows at one timestamp resolve to greatest tie key") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(10), 1L, 50.0), (1L, ts(10), 2L, 60.0)).toDF("key", "ts", "qid", "price")
    val trades = Seq((1L, ts(12), "x")).toDF("key", "ts", "tag")
    val out = AsOfJoin.asOf(trades, quotes, "key", "ts", Seq("price"),
      rightTieCol = Some("qid")).select("asof_price").head().getDouble(0)
    assert(out == 60.0)
  }

  test("a null payload in the most recent right row is returned as null, not skipped") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(0), Some(10.0), Some("x")),
      (1L, ts(10), None, Some("y"))).toDF("key", "ts", "price", "tag")
    val trades = Seq((1L, ts(20), "t")).toDF("key", "ts", "side")
    val row = AsOfJoin.asOf(trades, quotes, "key", "ts", Seq("price", "tag")).head()
    // most recent right row is (ts 10, price=null, tag=y): both fields must
    // come from THAT row (DuckDB ASOF semantics), no per-column carry
    assert(row.isNullAt(row.fieldIndex("asof_price")))
    assert(row.getAs[String]("asof_tag") == "y")
  }

  test("right rows with a null timestamp never match (DuckDB ASOF agrees)") {
    import spark.implicits._
    val quotes = Seq(
      (1L, None, 666.0),           // null-ts: must never be carried
      (1L, Some(ts(10)), 110.0)).toDF("key", "ts", "price")
    val trades = Seq((1L, ts(5), "early"), (1L, ts(15), "late"))
      .toDF("key", "ts", "tag")
    val out = AsOfJoin.asOf(trades, quotes, "key", "ts", Seq("price"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.get(r.fieldIndex("asof_price")))).toMap
    assert(out("early").isEmpty, "null-ts right row must not be a match")
    assert(out("late").contains(110.0))
  }

  test("forward direction: earliest right row at or after; tolerance nulls far matches") {
    import spark.implicits._
    val next = Seq(
      (1L, ts(10), "at10"), (1L, ts(20), "at20"), (2L, ts(500), "far"))
      .toDF("key", "ts", "tag")
    val probes = Seq(
      (1L, ts(10), "exact"),   // inclusive: matches at10
      (1L, ts(11), "between"), // next is at20
      (1L, ts(21), "after"),   // nothing follows
      (2L, ts(0), "lagged"))   // at 500 min, outside tolerance below
      .toDF("key", "ts", "probe")
    def run(tol: Option[Long]) =
      AsOfJoin.asOf(probes, next, "key", "ts", Seq("tag"),
          direction = "forward", toleranceUs = tol)
        .collect().map(r => r.getAs[String]("probe") ->
          Option(r.getAs[String]("asof_tag"))).toMap
    val free = run(None)
    assert(free == Map("exact" -> Some("at10"), "between" -> Some("at20"),
      "after" -> None, "lagged" -> Some("far")))
    // 100 minutes of tolerance: the 500-minute lag is nulled, others keep
    val tol = run(Some(100L * 60000000L))
    assert(tol == Map("exact" -> Some("at10"), "between" -> Some("at20"),
      "after" -> None, "lagged" -> None))
  }

  test("backward tolerance: stale matches are nulled, fresh ones kept") {
    import spark.implicits._
    val quotes = Seq((1L, ts(0), 1.0), (1L, ts(90), 2.0)).toDF("key", "ts", "v")
    val trades = Seq((1L, ts(100), "t")).toDF("key", "ts", "tag")
    val fresh = AsOfJoin.asOf(trades, quotes, "key", "ts", Seq("v"),
      toleranceUs = Some(15L * 60000000L)).head()
    assert(fresh.getAs[Double]("asof_v") == 2.0) // 10 min old, within 15
    val strict = AsOfJoin.asOf(trades, quotes, "key", "ts", Seq("v"),
      toleranceUs = Some(5L * 60000000L)).head()
    assert(strict.get(strict.fieldIndex("asof_v")) == null)
  }

  test("forward direction: a null-ts left probe matches nothing") {
    import spark.implicits._
    val next = Seq((1L, Some(ts(10)), "x")).toDF("key", "ts", "tag")
    val probes = Seq((1L, Option.empty[java.sql.Timestamp], "nullprobe"))
      .toDF("key", "ts", "probe")
    val out = AsOfJoin.asOf(probes, next, "key", "ts", Seq("tag"),
      direction = "forward").head()
    assert(out.get(out.fieldIndex("asof_tag")) == null)
  }

  test("left columns pass through unchanged") {
    import spark.implicits._
    val quotes = Seq((1L, ts(0), 9.0)).toDF("key", "ts", "v")
    val trades = Seq((1L, ts(1), "t", 42)).toDF("key", "ts", "tag", "extra")
    val row = AsOfJoin.asOf(trades, quotes, "key", "ts", Seq("v")).head()
    assert(row.getAs[String]("tag") == "t")
    assert(row.getAs[Int]("extra") == 42)
    assert(row.getAs[Double]("asof_v") == 9.0)
  }
}
