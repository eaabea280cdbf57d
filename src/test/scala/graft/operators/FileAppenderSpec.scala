package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The reference-user switchover surface: string properties in, full
  * lifecycle out (mirrors `FileAppenderSinkConfigTest` +
  * `PipelineTest` flows).
  */
class FileAppenderSpec extends SparkSpecBase {

  test("defaults applied for absent properties (ref widgets :38,46)") {
    val conf = FileAppender.configure(Map("outputDir" -> "/tmp/x"))
      .toOption.get
    assert(conf.sizeThresholdMb == 100L)
    assert(conf.ageThresholdMin == 60L)
    assert(conf.fieldSeparator == ",")
    assert(conf.fileNamePrefix == "part")
  }

  test("malformed schema accumulates a failure with cause (ref test :65-74)") {
    val out = FileAppender.configure(Map("outputDir" -> "/tmp/x", "schema" -> "{[}"))
    assert(out.isLeft)
    assert(out.swap.toOption.get.map(_.cause) == Seq("schema"))
  }

  test("schema accepts DDL and JSON forms") {
    val ddl = FileAppender.parseSchema("a BIGINT, b STRING")
    assert(ddl.toOption.get.fieldNames.toSeq == Seq("a", "b"))
    val json = FileAppender.parseSchema(ddl.toOption.get.json)
    assert(json == ddl)
  }

  test("failures accumulate across properties") {
    val out = FileAppender.configure(Map(
      "outputDir" -> "/tmp/x", "sizeThreshold" -> "nope", "ageThreshold" -> "-2"))
    assert(out.swap.toOption.get.map(_.cause).sorted ==
      Seq("ageThresholdMin", "sizeThreshold"))
  }

  test("run: full lifecycle — validate, register, append, read back") {
    val dir = Files.createTempDirectory("fileappender").toString
    val df = spark.range(0, 10).select(col("id"),
      concat(lit("n"), col("id")).as("n"))
    FileAppender.run(df, Map(
        "outputDir" -> dir,
        "fieldSeparator" -> "|",
        "schema" -> "id BIGINT, n STRING"),
      tableName = Some("fileappender_spec_t"),
      logicalStartTime = 1000L)
    val back = spark.sql("SELECT sum(id) FROM fileappender_spec_t").head().getLong(0)
    assert(back == 45L)
  }

  test("run rejects an output schema not in the input (ref test :77-84)") {
    val df = spark.range(0, 1).select(col("id"))
    val e = intercept[IllegalArgumentException] {
      FileAppender.run(df, Map("outputDir" -> "/tmp/x", "schema" -> "missing BIGINT"))
    }
    assert(e.getMessage.contains("missing"))
  }
}
