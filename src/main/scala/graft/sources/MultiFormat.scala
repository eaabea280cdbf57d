package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink surface: the same frame written to and read
  * back from every columnar/text format Spark ships (parquet, ORC,
  * newline-delimited JSON, CSV) with IDENTICAL contents.
  *
  * Scale rules encoded here:
  *  - schema-on-read is always EXPLICIT (`.schema(...)`) — inference
  *    (`inferSchema`, `samplingRatio`) re-scans data and can flip types
  *    between runs; at 100 TB both are disqualifying. The writer's schema
  *    is the contract.
  *  - text formats (csv/json) carry no types, so the explicit schema is
  *    what round-trips dates and doubles (Spark emits shortest-roundtrip
  *    doubles and ISO dates on both paths);
  *  - `PERMISSIVE` would silently null-fill corrupt rows — reads here are
  *    FAILFAST so corruption surfaces as a job failure, not data drift.
  */
object MultiFormat {

  val supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  private def checkFormat(format: String): Unit =
    require(supported.contains(format),
      s"unsupported format '$format' (supported: ${supported.mkString(", ")})")

  /** Write `df` under `baseDir/format/` (overwrite). CSV is headerless —
    * the schema travels out-of-band, as in any production layout where
    * readers must not depend on file-local headers.
    */
  def write(df: DataFrame, baseDir: String, format: String): Unit = {
    checkFormat(format)
    df.write.mode("overwrite").format(format).save(s"$baseDir/$format")
  }

  /** Read `baseDir/format/` back with the explicit `schema`. */
  def read(spark: SparkSession, baseDir: String, format: String,
           schema: StructType): DataFrame = {
    checkFormat(format)
    spark.read.format(format).schema(schema)
      .option("mode", "FAILFAST") // csv/json: corrupt rows fail, not null-fill
      .load(s"$baseDir/$format")
  }
}
