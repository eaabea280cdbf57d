package graft.streaming

import graft.SparkSpecBase
import graft.operators.{Multimodal, PhashIndex}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingPhashDedupSpec extends SparkSpecBase {

  // edge-scene renditions: same scene at different sizes hash
  // identically; distinct scenes are >3 hamming apart
  private def png(scene: Int, size: Int) = Multimodal.edgeScenePng(scene, size)

  test("each micro-batch dedups against the index AND grows it: a " +
      "batch-2 asset finds its batch-1 rendition; replays are no-ops " +
      "on the index while pairs re-emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("spd").toString
    // seed corpus: scene 0 and scene 5 at size 18
    PhashIndex.write(Seq((10L, png(0, 18)), (11L, png(5, 18)))
      .toDF("asset_id", "payload"), dir)
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val input = MemoryStream[(Long, Array[Byte])]
    val query = StreamingPhashDedup.start(
      input.toDF().toDF("asset_id", "payload"), dir,
      (pairs, batchId) => got(batchId) =
        pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    try {
      // batch 0: a rendition of seed scene 0 + a novel scene 7
      input.addData((20L, png(0, 36)), (21L, png(7, 18)))
      query.processAllAvailable()
      assert(got(0L) == Set((10L, 20L)))
      // batch 1: a rendition of the BATCH-0 novel scene — only findable
      // if the append grew the index — plus one of seed scene 5
      input.addData((30L, png(7, 45)), (31L, png(5, 27)))
      query.processAllAvailable()
      assert(got(1L) == Set((21L, 30L), (11L, 31L)))
    } finally query.stop()
    // the index now holds all six signatures exactly once
    assert(spark.read.parquet(s"$dir/sigs").count() == 6L)
  }
}
