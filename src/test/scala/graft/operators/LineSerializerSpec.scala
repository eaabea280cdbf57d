package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Serialization semantics (ref `FileAppenderSink.java:125-147`):
  * separator-joined fields, null→"", projection via output schema.
  */
class LineSerializerSpec extends SparkSpecBase {

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))
    spark.createDataFrame(
      java.util.List.of(
        Row(1L, "x", 1.5), Row(2L, null, 2.5), Row(3L, "z", null)),
      schema)
  }

  test("joins fields with separator in schema order") {
    val lines = LineSerializer.toLines(df, ",").collect().map(_.getString(0)).sorted
    assert(lines(0) == "1,x,1.5")
  }

  test("null renders as empty string, keeping the slot (ref :144)") {
    val lines = LineSerializer.toLines(df, ",").collect().map(_.getString(0)).sorted
    assert(lines(1) == "2,,2.5")
    assert(lines(2) == "3,z,")
  }

  test("output schema projects and reorders (documented A3 semantics)") {
    val out = StructType(Seq(StructField("b", StringType), StructField("a", LongType)))
    val lines = LineSerializer.toLines(df, "|", Some(out))
      .collect().map(_.getString(0)).sorted
    assert(lines.toSeq == Seq("x|1", "z|3", "|2")) // '|' (0x7C) sorts after letters
  }

  test("quoted mode escapes separator/quote/newline values (RFC-4180)") {
    import org.apache.spark.sql.Row
    val risky = spark.createDataFrame(
      java.util.List.of(Row(1L, "a,b", 0.0), Row(2L, "say \"hi\"", 0.0),
        Row(3L, "line\nbreak", 0.0)),
      df.schema)
    val lines = LineSerializer.toLines(risky, ",", quoted = true)
      .collect().map(_.getString(0)).sorted
    assert(lines(0) == "1,\"a,b\",0.0")
    assert(lines(1) == "2,\"say \"\"hi\"\"\",0.0")
    assert(lines(2) == "3,\"line\nbreak\",0.0")
    // raw mode (reference behavior) leaves them unescaped
    val raw = LineSerializer.toLines(risky, ",")
      .collect().map(_.getString(0)).sorted
    assert(raw(0) == "1,a,b,0.0")
  }

  test("round-trips through spark csv reader for separator-free values") {
    val lines = LineSerializer.toLines(df, "\t")
    val tmp = java.nio.file.Files.createTempDirectory("lineser").toString
    lines.write.mode("overwrite").text(tmp)
    val back = spark.read.option("sep", "\t").schema(df.schema).csv(tmp)
    assert(back.count() == 3)
    assert(back.where("a = 2").head().isNullAt(1)) // "" reads back as null
  }
}
