package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PhashIndexSpec extends SparkSpecBase {

  // edge-scene renditions: id -> (scene = id % 10, size by generation)
  private def sceneAssets(ids: Range, sizeOf: Long => Int): DataFrame = {
    import spark.implicits._
    ids.map(_.toLong).toDF("asset_id")
      .as[Long]
      .mapPartitions(_.map(id => (id,
        Multimodal.edgeScenePng((id % 10).toInt, sizeOf(id)))))
      .toDF("asset_id", "payload")
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("build + probe: a batch dedups against the index and itself " +
    "without re-decoding the corpus frames") {
    val dir = java.nio.file.Files.createTempDirectory("ph_idx").toString
    // corpus: scenes 0..9 x sizes 18..45 (ids 0..39)
    PhashIndex.write(sceneAssets(0 until 40,
      id => 18 + 9 * (id / 10).toInt), dir)
    // batch: same scenes at sizes 54/63 (ids 40..59)
    val batch = sceneAssets(40 until 60, id => 18 + 9 * (id / 10).toInt)
    val pairs = pairsOf(PhashIndex.nearDups(spark, dir, batch))
    // each batch asset pairs with its scene's 4 corpus renditions (80)
    // plus the within-batch same-scene pair (10)
    assert(pairs.size == 90)
    assert(pairs.forall { case (a, b, h) =>
      a < b && a % 10 == b % 10 && h == 0 })
    assert(pairs.count { case (a, _, _) => a < 40 } == 80)
    assert(pairs.count { case (a, _, _) => a >= 40 } == 10)
    // the audit sees a clean index
    val audit = PhashIndex.droppedAudit(spark, dir).head()
    assert(audit.getLong(1) == 0L && audit.getDouble(2) == 0.0)
  }

  test("append == rebuild: the incremental index's frames set-equal a " +
    "from-scratch build over corpus ∪ batch") {
    val inc = java.nio.file.Files.createTempDirectory("ph_inc").toString
    val reb = java.nio.file.Files.createTempDirectory("ph_reb").toString
    val sizeOf = (id: Long) => 18 + 9 * (id / 10).toInt
    PhashIndex.write(sceneAssets(0 until 40, sizeOf), inc)
    PhashIndex.append(spark, inc, sceneAssets(40 until 60, sizeOf))
    PhashIndex.write(sceneAssets(0 until 60, sizeOf), reb)
    for (frame <- PhashIndex.phashFrames) {
      val a = spark.read.parquet(s"$inc/$frame")
      val b = spark.read.parquet(s"$reb/$frame")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"frame $frame must set-equal the rebuild")
    }
    // a replayed append (at-least-once delivery) is a no-op
    val before = spark.read.parquet(s"$inc/sigs").count()
    PhashIndex.append(spark, inc, sceneAssets(40 until 60, sizeOf))
    assert(spark.read.parquet(s"$inc/sigs").count() == before)
  }

  test("cap semantics: an over-cap bucket is dropped whole at build, " +
    "stays dropped across appends, and blocks probe candidates") {
    val dir = java.nio.file.Files.createTempDirectory("ph_cap").toString
    // three byte-identical assets: every chunk bucket holds 3 > cap 2
    val same = sceneAssets(0 until 30 by 10, _ => 18) // ids 0,10,20: scene 0
    PhashIndex.write(same, dir, maxChunkBucket = 2L)
    val audit0 = PhashIndex.droppedAudit(spark, dir).head()
    assert(audit0.getLong(1) == 4L, "all four chunk buckets over cap")
    assert(audit0.getDouble(2) > 0.0)
    // a probe landing only in dropped buckets finds nothing
    val probe = sceneAssets(30 until 31 by 10, _ => 18) // id 30: scene 0
    assert(pairsOf(PhashIndex.nearDups(spark, dir, probe,
      maxChunkBucket = 2L)).isEmpty)
    // appending into the dropped bucket must not resurrect it
    PhashIndex.append(spark, dir, probe, maxChunkBucket = 2L)
    val audit1 = PhashIndex.droppedAudit(spark, dir).head()
    assert(audit1.getLong(1) == 4L && audit1.getLong(0) == 0L,
      "dropped keys are monotone; no kept bucket appears")
  }

  test("mixed modalities share one index: audio and image signatures " +
    "coexist and only same-modality scenes pair") {
    import org.apache.spark.sql.{Row => R}
    val dir = java.nio.file.Files.createTempDirectory("ph_mix").toString
    val rows = Seq(
      R(1L, Multimodal.edgeScenePng(4, 18), "image",
        Map.empty[String, String], null),
      R(2L, Multimodal.stepSceneWav(4, spw = 40), "audio",
        Map.empty[String, String], null))
    PhashIndex.write(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.schema), dir)
    val probeRows = Seq(
      R(11L, Multimodal.edgeScenePng(4, 36), "image",
        Map.empty[String, String], null),
      R(12L, Multimodal.stepSceneWav(4, spw = 80, sampleRate = 16000),
        "audio", Map.empty[String, String], null))
    val pairs = pairsOf(PhashIndex.nearDups(spark,
      dir, spark.createDataFrame(
        spark.sparkContext.parallelize(probeRows, 1), Multimodal.schema)))
    assert(pairs == Set((1L, 11L, 0), (2L, 12L, 0)))
  }
}
