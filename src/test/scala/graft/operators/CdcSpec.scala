package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpecBase {

  import spark.implicits._

  test("applyChanges: latest version wins, deletes remove, untouched keys survive") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, 10L, "upsert", "a2"),   // overwritten below at v=20
      (1L, 20L, "upsert", "a3"),
      (2L, 5L, "delete", "ignored"),
      (4L, 1L, "upsert", "d"))     // insert of a brand-new key
      .toDF("k", "version", "op", "v")
    val out = Cdc.applyChanges(base, changes, "k", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a3", 3L -> "c", 4L -> "d"))
  }

  test("applyChanges: a delete then re-upsert at a later version resurrects the key") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, 10L, "delete", "x"), (1L, 20L, "upsert", "back"))
      .toDF("k", "version", "op", "v")
    val out = Cdc.applyChanges(base, changes, "k", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "back"))
  }

  test("scd2: unchanged restatements collapse; intervals chain; last is open") {
    val ev = Seq(
      (1L, 10L, "gold"), (1L, 20L, "gold"),   // restatement: no new interval
      (1L, 30L, "silver"), (1L, 40L, "gold"), // real changes
      (2L, 5L, "bronze"))
      .toDF("k", "seq", "attr")
    val out = Cdc.scd2(ev, "k", "seq", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "gold", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "bronze", 5L, None, true)))
  }

  test("scd2: null attribute values form their own intervals (null-safe compare)") {
    val ev = Seq((1L, 1L, Some("x")), (1L, 2L, None), (1L, 3L, None),
      (1L, 4L, Some("x"))).toDF("k", "seq", "attr")
    val out = Cdc.scd2(ev, "k", "seq", "attr").collect()
      .map(r => (r.getLong(2), Option(r.get(1)))).toSet
    // x@1, null@2 (collapsing 2,3), x@4
    assert(out == Set((1L, Some("x")), (2L, None), (4L, Some("x"))))
  }

  test("goldenRecord: each column survives from its own latest non-null version") {
    val changes = Seq(
      (1L, 1L, Some("a1"), Some(10.0)),
      (1L, 2L, None: Option[String], Some(20.0)), // name missing here
      (1L, 3L, Some("a3"), None: Option[Double]), // price missing here
      (2L, 5L, None: Option[String], None: Option[Double]))
      .toDF("k", "version", "name", "price")
    val out = Cdc.goldenRecord(changes, "k", "version").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getLong(3))).toMap
    // name from v=3, price from v=2, last_version = 3
    assert(out(1L) == ((Some("a3"), Some(20.0), 3L)))
    // all-null key: null columns, version still tracked
    assert(out(2L) == ((None, None, 5L)))
  }

  test("applyChangesVersioned with a MinValue-versioned base agrees with applyChanges") {
    val base = (0L until 50L).map(k => (k, s"b$k")).toDF("k", "v")
    val changes = (0L until 120L).map { i =>
      (i % 60L, i + 1L, if (i % 11 == 0) "delete" else "upsert", s"c$i")
    }.toDF("k", "version", "op", "v")
    val plain = Cdc.applyChanges(base, changes, "k", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val versioned = Cdc.applyChangesVersioned(
        base.withColumn("version", lit(Long.MinValue)),
        changes, "k", "version", "op")
      .select("k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(plain == versioned)
  }

  test("applyChanges result is independent of partitioning") {
    val base = (0L until 100L).map(k => (k, s"b$k")).toDF("k", "v")
    val changes = (0L until 300L).map { i =>
      (i % 100L, i, if (i % 17 == 0) "delete" else "upsert", s"c$i")
    }.toDF("k", "version", "op", "v")
    val a = Cdc.applyChanges(base, changes, "k", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Cdc.applyChanges(base.repartition(13), changes.repartition(7),
        "k", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("snapshotDiff: added/removed/changed with column detail, " +
      "null-safe compares, unchanged rows absent") {
    import spark.implicits._
    val oldDf = Seq(
      (1L, Some("x"), 1.0), (2L, Some("y"), 2.0), (3L, Some("z"), 3.0),
      (5L, None: Option[String], 5.0)).toDF("k", "s", "v")
    val newDf = Seq(
      (2L, Some("y"), 2.5), (3L, Some("z"), 3.0), (4L, Some("w"), 4.0),
      (5L, None: Option[String], 5.0)).toDF("k", "s", "v")
    val out = Cdc.snapshotDiff(oldDf, newDf, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    // 3 (identical) and 5 (identical incl. null = null) are absent
    assert(out == Map(
      1L -> (("removed", "")),
      2L -> (("changed", "v")),
      4L -> (("added", ""))))
  }

  test("snapshotDiff: a null-to-value transition is a change") {
    import spark.implicits._
    val oldDf = Seq((1L, None: Option[String], 1.0)).toDF("k", "s", "v")
    val newDf = Seq((1L, Some("now"), 1.0)).toDF("k", "s", "v")
    val out = Cdc.snapshotDiff(oldDf, newDf, Seq("k"), Seq("s", "v")).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "changed" && out(0).getString(2) == "s")
  }
}
