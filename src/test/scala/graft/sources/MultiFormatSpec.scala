package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultiFormatSpec extends SparkSpecBase {

  import spark.implicits._

  private def scratch(name: String): String = {
    val dir = s"/tmp/graft_test_multiformat/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  test("every format round-trips hostile strings, nulls, dates, and doubles") {
    val base = scratch("hostile")
    val df = Seq(
      (1L, Some(1.5e-300), Some("2024-02-29"), Some("a,b|c\"d'e")),
      (2L, Some(-0.1), Some("1970-01-01"), Some("line\tback\\slash")),
      (3L, None: Option[Double], None: Option[String], None: Option[String]),
      (4L, Some(1.0 / 3.0), Some("9999-12-31"), Some("")))
      .toDF("id", "x", "d", "s")
      .select(col("id"), col("x"), to_date(col("d")).as("d"), col("s"))
    val want = df.collect().map(r => (r.getLong(0), Option(r.get(1)),
      Option(r.get(2)).map(_.toString), Option(r.get(3)))).toSet
    for (fmt <- MultiFormat.supported) {
      MultiFormat.write(df, base, fmt)
      val back = MultiFormat.read(spark, base, fmt, df.schema)
      val got = back.collect().map(r => (r.getLong(0), Option(r.get(1)),
        Option(r.get(2)).map(_.toString), Option(r.get(3)))).toSet
      // CSV cannot distinguish null from empty string without a quirky
      // convention; everything else must be exact
      val wantFmt =
        if (fmt == "csv") want.map { case (i, x, d, s) =>
          (i, x, d, s.filter(_.asInstanceOf[String].nonEmpty)) }
        else want
      assert(got == wantFmt, s"format=$fmt")
    }
  }

  test("unsupported format and corrupt csv fail loudly") {
    intercept[IllegalArgumentException] {
      MultiFormat.write(Seq(1).toDF("a"), scratch("bad"), "avro")
    }
    val base = scratch("corrupt")
    // write a csv whose second column is not a long
    val dir = new java.io.File(s"$base/csv"); dir.mkdirs()
    val pw = new java.io.PrintWriter(s"$base/csv/part-0.csv")
    pw.println("1,notanumber"); pw.close()
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a BIGINT, b BIGINT")
    val ex = intercept[Exception] {
      MultiFormat.read(spark, base, "csv", schema).collect()
    }
    assert(ex.getMessage != null) // FAILFAST surfaced, not null-filled
  }

  test("double bit-exactness across text formats (shortest-roundtrip write)") {
    val base = scratch("doubles")
    val vals = Seq(math.Pi, -math.E, 1.7976931348623157e308, 4.9e-324,
      0.1 + 0.2, 1.0 / 3.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    for (fmt <- Seq("csv", "json")) {
      MultiFormat.write(df, base, fmt)
      val got = MultiFormat.read(spark, base, fmt, df.schema)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      vals.zipWithIndex.foreach { case (v, i) =>
        assert(java.lang.Double.doubleToLongBits(got(i.toLong)) ==
          java.lang.Double.doubleToLongBits(v), s"$fmt: $v")
      }
    }
  }
}
