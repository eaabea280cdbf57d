package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** String-property facade mirroring the reference plugin's config surface
  * (property names from `FileAppenderSinkConfig.java:15-43`: `name`,
  * `outputDir`, `fileNamePrefix`, `sizeThreshold`, `ageThreshold`,
  * `fieldSeparator`, `schema`) and its deploy-time lifecycle
  * (ref `FileAppenderSink.java:61-106`): validate config → validate output
  * schema against the input → register the directory as an explorable
  * table → write. A reference user's pipeline JSON maps 1:1 onto
  * [[configure]] + [[run]].
  */
object FileAppender {

  /** Parse the `schema` property: accepts Spark DDL
    * (`"a BIGINT, b STRING"`) or Spark's JSON StructType form — the
    * engine-native analogues of the reference's Avro-style JSON
    * (`FileAppenderSinkConfig.java:165-171`). Malformed input becomes an
    * accumulated validation failure with the cause attribute `schema`,
    * mirroring the reference's malformed-`{[}`-schema test
    * (`FileAppenderSinkConfigTest.java:65-74`), not a throw.
    */
  def parseSchema(schema: String): Either[ValidationFailure, StructType] = {
    def asJson: Option[StructType] =
      try DataType.fromJson(schema) match {
        case s: StructType => Some(s)
        case _ => None
      } catch { case NonFatal(_) => None }
    def asDdl: Option[StructType] =
      try Some(StructType.fromDDL(schema)) catch { case NonFatal(_) => None }
    asJson.orElse(asDdl).toRight(
      ValidationFailure(s"Invalid schema: $schema", "schema"))
  }

  /** Build an [[AppendSinkConfig]] from reference-style string properties,
    * applying the documented defaults for absent values (the reference
    * NPEs there — SURVEY §2 A5 quirk). Failures accumulate.
    */
  def configure(props: Map[String, String])
      : Either[Seq[ValidationFailure], AppendSinkConfig] = {
    val failures = Seq.newBuilder[ValidationFailure]
    def longProp(key: String, default: Long): Long =
      props.get(key) match {
        case None => default
        case Some(v) => v.toLongOption.getOrElse {
          failures += ValidationFailure(s"$key must be a number, got '$v'.", key)
          default
        }
      }
    val outputDir = props.get("outputDir").orElse(props.get("name"))
    if (outputDir.isEmpty)
      failures += ValidationFailure("outputDir (or name) is required.", "outputDir")
    val schema = props.get("schema").map(parseSchema) match {
      case Some(Left(f)) => failures += f; None
      case Some(Right(s)) => Some(s)
      case None => None
    }
    val quoted = props.get("quoted") match {
      case None => false
      case Some(v) => v.toBooleanOption.getOrElse {
        failures += ValidationFailure(s"quoted must be true/false, got '$v'.", "quoted")
        false
      }
    }
    val conf = AppendSinkConfig(
      outputDir = outputDir.getOrElse(""),
      fileNamePrefix = props.getOrElse("fileNamePrefix", "part"),
      sizeThresholdMb = longProp("sizeThreshold", 100L),
      ageThresholdMin = longProp("ageThreshold", 60L),
      fieldSeparator = props.getOrElse("fieldSeparator", ","),
      outputSchema = schema,
      quoted = quoted)
    val all = failures.result() ++ conf.validate()
    if (all.nonEmpty) Left(all) else Right(conf)
  }

  /** Full lifecycle for one batch run (deploy-time checks + run):
    * configure → validate output schema ⊆ input schema → optionally
    * register `tableName` over the directory → append. Throws with all
    * accumulated failures, mirroring `getOrThrowException`
    * (ref `FileAppenderSink.java:68`).
    */
  def run(df: DataFrame, props: Map[String, String],
          tableName: Option[String] = None,
          logicalStartTime: Long = System.currentTimeMillis()): AppendSinkConfig = {
    val conf = configure(props) match {
      case Left(fs) => throw new IllegalArgumentException(
        "Invalid FileAppender config: " + fs.map(_.message).mkString(" "))
      case Right(c) => c
    }
    val schemaFailures = conf.validateOutputSchema(df.schema)
    if (schemaFailures.nonEmpty)
      throw new IllegalArgumentException(
        "Invalid output schema: " + schemaFailures.map(_.message).mkString(" "))
    tableName.foreach { t =>
      CatalogRegistration.registerTextTable(df.sparkSession, t, conf.outputDir,
        conf.fieldSeparator, Some(conf.outputSchema.getOrElse(df.schema)))
    }
    AppendFileSink.write(df, conf, logicalStartTime)
    conf
  }
}
