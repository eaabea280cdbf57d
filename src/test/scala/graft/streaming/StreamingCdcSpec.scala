package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// top-level: a spec-nested case class makes the encoder capture the
// outer class and Janino falls back to interpreted projections
case class CdcChange(k: Long, version: Long, op: String, v: String)

class StreamingCdcSpec extends SparkSpecBase {

  import spark.implicits._

  private type Change = CdcChange
  private def Change(k: Long, version: Long, op: String, v: String) =
    CdcChange(k, version, op, v)

  private def scratch(name: String): String = {
    val dir = s"/tmp/graft_test_streaming_cdc/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  private def snapshotMap(dir: String, version: Long = -1L): Map[Long, String] =
    StreamingCdc.readSnapshot(spark, dir, version)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap

  test("micro-batches fold into versioned snapshots; deletes apply; old versions stay readable") {
    val dir = scratch("fold")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val query = input.toDF().writeStream
      .foreachBatch(StreamingCdc.applier(spark, dir, "k", "version", "op"))
      .start()
    try {
      input.addData(Change(1L, 1L, "upsert", "a"), Change(2L, 2L, "upsert", "b"))
      query.processAllAvailable()
      assert(StreamingCdc.currentVersion(spark, dir) == 0L)
      assert(snapshotMap(dir) == Map(1L -> "a", 2L -> "b"))
      input.addData(Change(1L, 3L, "upsert", "a2"), Change(2L, 4L, "delete", "x"),
        Change(3L, 5L, "upsert", "c"))
      query.processAllAvailable()
      assert(StreamingCdc.currentVersion(spark, dir) == 1L)
      assert(snapshotMap(dir) == Map(1L -> "a2", 3L -> "c"))
      // time travel: version 0 is untouched
      assert(snapshotMap(dir, version = 0L) == Map(1L -> "a", 2L -> "b"))
    } finally query.stop()
  }

  test("late-arriving lower versions in a later batch lose to the stored version") {
    val dir = scratch("late")
    StreamingCdc.apply(spark,
      dir, Seq((1L, 10L, "upsert", "new")).toDF("k", "version", "op", "v"),
      "k", "version", "op")
    // a batch carrying an OLDER version for the same key: the snapshot
    // persists each key's winning version, so the stale change loses
    StreamingCdc.apply(spark,
      dir, Seq((1L, 5L, "upsert", "stale"), (2L, 6L, "upsert", "b"))
        .toDF("k", "version", "op", "v"),
      "k", "version", "op")
    assert(snapshotMap(dir) == Map(1L -> "new", 2L -> "b"))
    // and a genuinely newer change still wins
    StreamingCdc.apply(spark,
      dir, Seq((1L, 11L, "upsert", "newest")).toDF("k", "version", "op", "v"),
      "k", "version", "op")
    assert(snapshotMap(dir) == Map(1L -> "newest", 2L -> "b"))
  }

  test("vacuum keeps the newest versions, removes older dirs and markers") {
    val dir = scratch("vacuum")
    for (i <- 1 to 4)
      StreamingCdc.apply(spark,
        dir, Seq((1L, i.toLong, "upsert", s"v$i")).toDF("k", "version", "op", "v"),
        "k", "version", "op")
    assert(StreamingCdc.currentVersion(spark, dir) == 3L)
    val removed = StreamingCdc.vacuum(spark, dir, keepLast = 2)
    assert(removed == Seq(0L, 1L))
    // current and its predecessor survive; older versions are gone
    assert(StreamingCdc.currentVersion(spark, dir) == 3L)
    assert(snapshotMap(dir) == Map(1L -> "v4"))
    assert(snapshotMap(dir, version = 2L) == Map(1L -> "v3"))
    intercept[Exception] { snapshotMap(dir, version = 0L) }
    // idempotent; keepLast guard
    assert(StreamingCdc.vacuum(spark, dir, keepLast = 2).isEmpty)
    intercept[IllegalArgumentException] {
      StreamingCdc.vacuum(spark, dir, keepLast = 0)
    }
  }

  test("uncommitted versions are rejected by readSnapshot; vacuum never sweeps pre-first-commit claims") {
    val dir = scratch("uncommitted")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    // a crashed/in-flight writer: claim + partial data, NO commit marker
    fs.create(new org.apache.hadoop.fs.Path(dir, "claim-0"), false).close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "v=0"))
    assert(StreamingCdc.currentVersion(spark, dir) == -1L)
    intercept[IllegalArgumentException] {
      StreamingCdc.readSnapshot(spark, dir, version = 0L)
    }
    // with zero commits there is no floor: the in-flight claim survives
    assert(StreamingCdc.vacuum(spark, dir, keepLast = 1).isEmpty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "claim-0")))
    // the next writer skips the claimed version
    val v = StreamingCdc.apply(spark,
      dir, Seq((1L, 1L, "upsert", "a")).toDF("k", "version", "op", "v"),
      "k", "version", "op")
    assert(v == 1L)
    assert(snapshotMap(dir) == Map(1L -> "a"))
  }

  test("reading before any commit fails loudly; empty dir has version -1") {
    val dir = scratch("empty")
    assert(StreamingCdc.currentVersion(spark, dir) == -1L)
    intercept[IllegalArgumentException] {
      StreamingCdc.readSnapshot(spark, dir)
    }
  }
}
