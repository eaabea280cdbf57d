package graft.operators

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's config-validation tests
  * (ref `FileAppenderSinkConfigTest.java:36-95`): failures accumulate with
  * a cause attribute instead of throwing.
  */
class AppendSinkConfigSpec extends AnyFunSuite {

  private val input = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = true)))

  test("valid config has no failures") {
    assert(AppendSinkConfig(outputDir = "/tmp/x").validateAll(input).isEmpty)
  }

  test("negative size threshold fails with cause (ref :36-44)") {
    val fs = AppendSinkConfig("/tmp/x", sizeThresholdMb = -1).validate()
    assert(fs.map(_.cause) == Seq("sizeThresholdMb"))
  }

  test("negative age threshold fails with cause (ref :47-55)") {
    val fs = AppendSinkConfig("/tmp/x", ageThresholdMin = -5).validate()
    assert(fs.map(_.cause) == Seq("ageThresholdMin"))
  }

  test("documented defaults are applied in code (100 MB / 60 min / comma)") {
    val c = AppendSinkConfig("/tmp/x")
    assert(c.sizeThresholdBytes == 100L * 1024 * 1024)
    assert(c.ageThresholdMs == 60L * 60 * 1000)
    assert(c.fieldSeparator == ",")
  }

  test("output field missing from input fails per field (ref :77-84)") {
    val out = StructType(Seq(StructField("nope", StringType)))
    val fs = AppendSinkConfig("/tmp/x", outputSchema = Some(out)).validateOutputSchema(input)
    assert(fs.map(_.cause) == Seq("nope"))
  }

  test("output field type mismatch fails (ref :87-95)") {
    val out = StructType(Seq(StructField("id", StringType)))
    val fs = AppendSinkConfig("/tmp/x", outputSchema = Some(out)).validateOutputSchema(input)
    assert(fs.map(_.cause) == Seq("id"))
  }

  test("type equality ignores nullability, recursively (ref :116-125)") {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = true), nullable = false)))
    assert(AppendSinkConfig("/tmp/x", outputSchema = Some(out))
      .validateOutputSchema(input).isEmpty)
  }

  test("failures accumulate rather than short-circuit") {
    val out = StructType(Seq(
      StructField("nope", StringType), StructField("id", StringType)))
    val fs = AppendSinkConfig("/tmp/x", sizeThresholdMb = -1,
      outputSchema = Some(out)).validateAll(input)
    assert(fs.size == 3)
  }
}
