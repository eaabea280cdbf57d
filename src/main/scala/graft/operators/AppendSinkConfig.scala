package graft.operators

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** One collected validation failure (reference accumulates failures in a
  * `FailureCollector` instead of throwing on the first —
  * ref `FileAppenderSinkConfig.java:88-129`). `cause` identifies the
  * offending config property or schema field, mirroring the reference
  * tests' cause-attribute assertions
  * (ref `FileAppenderSinkConfigTest.java:36-95`).
  */
final case class ValidationFailure(message: String, cause: String)

/** Options for the append-mode text sink (ref
  * `FileAppenderSinkConfig.java`), with the *documented* defaults applied
  * in code — the reference documents 100 MB / 60 min defaults but never
  * backs them in code and NPEs on absent values (SURVEY §2 A5 quirk).
  *
  * @param outputDir      directory the sink appends into (FileSet base)
  * @param fileNamePrefix prefix of files written and reused
  * @param sizeThresholdMb rotate/stop-reusing files larger than this; 0 = unlimited
  * @param ageThresholdMin stop reusing files older than this; 0 = unlimited
  * @param fieldSeparator separator between field values in a line
  * @param outputSchema   optional projection schema (must be a subset of
  *                       the input schema, equal types modulo nullability)
  * @param quoted         RFC-4180-quote values containing the separator, a
  *                       double quote, or CR/LF (see [[LineSerializer]]).
  *                       Default false = the reference's raw, never-escaped
  *                       lines; set true when the directory is read back
  *                       through a quoting CSV reader (readCsv / the
  *                       registered catalog table) and values may contain
  *                       the separator.
  */
final case class AppendSinkConfig(
    outputDir: String,
    fileNamePrefix: String = "part",
    sizeThresholdMb: Long = 100L,
    ageThresholdMin: Long = 60L,
    fieldSeparator: String = ",",
    outputSchema: Option[StructType] = None,
    quoted: Boolean = false) {

  def sizeThresholdBytes: Long = sizeThresholdMb * 1024L * 1024L
  def ageThresholdMs: Long = ageThresholdMin * 60L * 1000L

  /** Config-value validation (ref `FileAppenderSinkConfig.java:88-97`):
    * thresholds must be non-negative; failures accumulate, never throw.
    */
  def validate(): Seq[ValidationFailure] = {
    val b = Seq.newBuilder[ValidationFailure]
    if (sizeThresholdMb < 0)
      b += ValidationFailure(
        s"Size threshold must be at least 0, got $sizeThresholdMb.", "sizeThresholdMb")
    if (ageThresholdMin < 0)
      b += ValidationFailure(
        s"Age threshold must be at least 0, got $ageThresholdMin.", "ageThresholdMin")
    if (fieldSeparator == null || fieldSeparator.isEmpty)
      b += ValidationFailure("Field separator must be non-empty.", "fieldSeparator")
    b.result()
  }

  /** Schema-subset validation (ref `FileAppenderSinkConfig.java:99-129`):
    * every output field must exist in the input schema with an equal type
    * *modulo nullability* (the reference unwraps nullable unions on both
    * sides before comparing; Spark's analogue is comparing `DataType`
    * with nullability stripped). Failures accumulate per field.
    */
  def validateOutputSchema(inputSchema: StructType): Seq[ValidationFailure] =
    outputSchema.toSeq.flatMap { out =>
      out.fields.toSeq.flatMap { f =>
        inputSchema.fields.find(_.name == f.name) match {
          case None => Some(ValidationFailure(
            s"Output field '${f.name}' does not exist in the input schema.", f.name))
          case Some(in) if !sameTypeIgnoreNullable(in.dataType, f.dataType) =>
            Some(ValidationFailure(
              s"Output field '${f.name}' has type ${f.dataType.simpleString} " +
              s"but input has type ${in.dataType.simpleString}.", f.name))
          case _ => None
        }
      }
    }

  /** All validations at once; empty = valid. */
  def validateAll(inputSchema: StructType): Seq[ValidationFailure] =
    validate() ++ validateOutputSchema(inputSchema)

  private def sameTypeIgnoreNullable(a: DataType, b: DataType): Boolean =
    AppendSinkConfig.normalizeNullability(a) == AppendSinkConfig.normalizeNullability(b)
}

object AppendSinkConfig {

  /** Recursively rewrites a DataType with every nullability flag forced to
    * true, so two types can be compared modulo nullability with a public
    * API (DataType.asNullable is private[spark]).
    */
  private[operators] def normalizeNullability(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map { f =>
        StructField(f.name, normalizeNullability(f.dataType), nullable = true)
      })
    case a: ArrayType => ArrayType(normalizeNullability(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(normalizeNullability(m.keyType), normalizeNullability(m.valueType),
        valueContainsNull = true)
    case other => other
  }
}
