package graft.streaming

import graft.SparkSpecBase
import graft.operators.{AppendFileSink, AppendSinkConfig}

/** The reference sink's output directory is a live text table — this spec
  * proves the OTHER direction of that contract: a Structured Streaming
  * file source can tail the directory the appender writes, picking up
  * files as batch runs land them (the standard batch-lands-files /
  * stream-tails-directory handoff).
  *
  * Caveat built into the assertions: Spark's file stream source tracks
  * files by NAME (+ size at discovery), so an APPEND to an
  * already-discovered file is invisible — only new files surface. The
  * spec pins both halves of that behavior, which is why a streaming
  * consumer must pair with rotation-friendly sink settings
  * (sizeThresholdMb = 0 forces a fresh file per run).
  */
class FileStreamIngestSpec extends SparkSpecBase {

  import spark.implicits._

  private def scratch(name: String): String = {
    val dir = s"/tmp/graft_test_filestream/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  test("file stream tails the append sink directory; new files arrive, appends to old files do not") {
    val dir = scratch("tail")
    // sizeThresholdMb=0 -> never reuse (documented 0=unlimited applies to
    // rotation; fresh-file-per-run comes from distinct logical start times)
    val conf = AppendSinkConfig(outputDir = dir, sizeThresholdMb = 100L,
      ageThresholdMin = 0L) // age 0 = never too old... see below
    // first batch BEFORE the stream starts: discovered at stream start
    AppendFileSink.write(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"),
      conf.copy(ageThresholdMin = 60L), logicalStartTime = 1000L)
    val stream = spark.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL("value STRING"))
      .text(dir)
    val query = stream.writeStream.format("memory")
      .queryName("tail_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("tail_out").count() == 2L)
      // second batch at a LATER logical start time: the age threshold
      // (60 min) makes the first file too old to reuse -> a NEW file is
      // created -> the stream sees exactly the new rows
      AppendFileSink.write(Seq(("c", 3L)).toDF("k", "v"),
        conf.copy(ageThresholdMin = 60L),
        logicalStartTime = 1000L + 61L * 60L * 1000L)
      query.processAllAvailable()
      val lines = spark.table("tail_out").as[String].collect().toSet
      assert(lines == Set("a,1", "b,2", "c,3"), lines.toString)
      // third batch at (almost) the same start time: the young file is
      // REUSED (appended) - the stream does NOT see the appended rows;
      // this is the documented file-source blind spot, not data loss
      // (batch readback sees all four)
      AppendFileSink.write(Seq(("d", 4L)).toDF("k", "v"),
        conf.copy(ageThresholdMin = 60L),
        logicalStartTime = 1000L + 61L * 60L * 1000L + 1L)
      query.processAllAvailable()
      assert(spark.table("tail_out").count() == 3L)
      assert(AppendFileSink.read(spark, dir).count() == 4L)
    } finally query.stop()
  }
}
