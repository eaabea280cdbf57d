package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Catalog/table registration for a sink directory — the reference's
  * "Explore" registration (ref `FileAppenderSink.java:90-105`) plus its
  * schema→Hive-DDL converter (ref `SchemaConverter.java:53-149`).
  *
  * Spark-first: `StructType.toDDL` replaces the reference's ~95-line
  * recursive converter (backtick escaping, nested array/map/struct,
  * nullable-union unwrapping all built in — nullability maps to
  * `StructField.nullable`, the Avro `union[T, null]` analogue), and
  * `CREATE TABLE ... USING CSV` replaces the FileSet "explore" properties.
  */
object CatalogRegistration {

  /** DDL column list for a schema, e.g. "`id` BIGINT,`name` STRING".
    * Equivalent of `SchemaConverter.toHiveSchema`
    * (ref `SchemaConverter.java:53-69`); falls back to a single `text
    * string` column when no schema is known, like the reference
    * (ref `FileAppenderSink.java:80-86`).
    */
  def toDDL(schema: Option[StructType]): String =
    schema.map(_.toDDL).getOrElse("`text` STRING")

  /** Register the sink directory as an external delimited-text table so
    * downstream queries can scan it (ref `FileAppenderSink.java:96-99`:
    * explore format "text" + delimiter property).
    */
  def registerTextTable(spark: SparkSession, table: String, dir: String,
                        separator: String, schema: Option[StructType]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // escape '"' = RFC-4180 doubled-quote unescaping, consistent with the
    // sink's quoted mode and AppendFileSink.readCsv
    spark.sql(
      s"""CREATE TABLE `$table` (${toDDL(schema)})
         |USING CSV
         |OPTIONS (sep '${separator.replace("'", "\\'")}', header 'false',
         |         escape '"')
         |LOCATION '$dir'""".stripMargin)
  }
}
