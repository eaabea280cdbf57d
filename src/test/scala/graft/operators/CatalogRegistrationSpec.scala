package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CatalogRegistrationSpec extends SparkSpecBase {

  test("toDDL falls back to text string without a schema (ref FileAppenderSink.java:80-86)") {
    assert(CatalogRegistration.toDDL(None) == "`text` STRING")
  }

  test("toDDL renders nested types via StructType.toDDL") {
    val s = StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StringType))))
    assert(CatalogRegistration.toDDL(Some(s)).contains("ARRAY<STRING>"))
  }

  test("registered text table is queryable over sink output") {
    val dir = Files.createTempDirectory("catalog").toString
    val df = spark.range(0, 5).select(col("id"),
      concat(lit("v"), col("id")).as("v"))
    AppendFileSink.write(df, AppendSinkConfig(outputDir = dir), 1000L)
    CatalogRegistration.registerTextTable(spark, "catalog_spec_t", dir, ",",
      Some(df.schema))
    val n = spark.sql("SELECT count(*) FROM catalog_spec_t").head().getLong(0)
    assert(n == 5)
    val s = spark.sql("SELECT sum(id) FROM catalog_spec_t").head().getLong(0)
    assert(s == 10)
  }
}
