package graft.streaming

import graft.SparkSpecBase
import graft.operators.Fingerprint
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SfpDoc(id: Long, part: String, payload: String)

class StreamingFingerprintSpec extends SparkSpecBase {

  test("incremental maintenance equals the direct fingerprint of the " +
      "union — per batch, without rescanning history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sfp").toString
    val input = MemoryStream[SfpDoc]
    val query = StreamingFingerprint.maintain(input.toDF(),
      Seq("part"), Seq("id", "payload"), s"$base/state", s"$base/ckpt")
    val b1 = Seq(SfpDoc(1, "p0", "a"), SfpDoc(2, "p0", "b"), SfpDoc(3, "p1", "c"))
    val b2 = Seq(SfpDoc(4, "p1", "d"), SfpDoc(5, "p2", "e"))
    input.addData(b1: _*)
    query.processAllAvailable()
    val v1 = StreamingFingerprint.latestVersion(spark, s"$base/state",
      Long.MaxValue).get
    val afterB1 = spark.read.parquet(s"$base/state/v=$v1")
    val directB1 = Fingerprint.partitionFingerprints(
      b1.toDF("id", "part", "payload"), Seq("part"), Seq("id", "payload"))
    assert(afterB1.select("part", "n_rows", "checksum").except(
      directB1.select(col("part"), col("n_rows"),
        col("checksum").cast("decimal(38,0)"))).isEmpty)
    input.addData(b2: _*)
    query.processAllAvailable()
    query.stop()
    val v2 = StreamingFingerprint.latestVersion(spark, s"$base/state",
      Long.MaxValue).get
    assert(v2 > v1)
    val finalState = spark.read.parquet(s"$base/state/v=$v2")
    val directUnion = Fingerprint.partitionFingerprints(
      (b1 ++ b2).toDF("id", "part", "payload"), Seq("part"),
      Seq("id", "payload"))
    assert(finalState.count() == 3L)
    assert(finalState.select("part", "n_rows", "checksum").except(
      directUnion.select(col("part"), col("n_rows"),
        col("checksum").cast("decimal(38,0)"))).isEmpty)
  }

  test("a retried batch rebuilds from the base below it instead of " +
      "double-counting (mergeState is the only write path)") {
    import spark.implicits._
    // simulate the retry directly: base v=1 exists; merging batch 1's
    // delta against latestVersion(upTo = 1) must pick v=1, not v=2
    val base = java.nio.file.Files.createTempDirectory("sfp2").toString
    val d1 = Fingerprint.partitionFingerprints(
      Seq((1L, "p0", "a")).toDF("id", "part", "payload"),
      Seq("part"), Seq("id", "payload"))
    d1.write.parquet(s"$base/state/v=1")
    d1.write.parquet(s"$base/state/v=2") // half-finished retry artifact
    assert(StreamingFingerprint.latestVersion(spark, s"$base/state",
      upTo = 1L).contains(1L))
  }
}
