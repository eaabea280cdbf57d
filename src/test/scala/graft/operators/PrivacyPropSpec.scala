package graft.operators

import graft.SparkSpecBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the PII scrub contract (raw ScalaCheck generators
  * with fixed seeds — the scalatest bridge isn't on the offline
  * classpath). Two invariants the release gate leans on:
  *
  *   1. ZERO RESIDUAL: scanning the redacted text finds nothing —
  *      redaction is complete for its own rules (the default
  *      placeholders contain no `@` and no digit runs, so they can
  *      never re-trigger a rule).
  *   2. IDEMPOTENCE: redacting twice equals redacting once.
  *
  * Generated text interleaves alphanumeric noise with REAL pii
  * specimens so the properties are exercised on matching inputs, not
  * vacuously on noise.
  */
class PrivacyPropSpec extends SparkSpecBase {

  import spark.implicits._

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(_.mkString)

  private val specimen: Gen[String] = Gen.oneOf(
    Gen.choose(0, 999999).map(n => s"user$n@example.com"),
    Gen.choose(0, 255).flatMap(a => Gen.choose(0, 255)
      .map(b => s"10.0.$a.$b")),
    Gen.const("+1 555 867 5309"),
    Gen.choose(100000000L, 99999999999L).map(_.toString))

  private val piece: Gen[String] = Gen.frequency(3 -> word, 2 -> specimen)

  private val text: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, piece))
      .map(_.mkString(" "))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("redacted text scans clean and redaction is idempotent") {
    val texts = (1L to 60L).map(s => sample(text, s))
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = Privacy.piiRedact(df)
      .select($"doc_id", $"redacted".as("text"))
    // 1. zero residual: every rule count on the redacted text is 0
    val residual = Privacy.piiScan(once)
      .agg(org.apache.spark.sql.functions.sum($"pii_total")).head.getLong(0)
    assert(residual == 0L, s"redacted text still scans PII: $residual")
    // 2. idempotence: a second redaction is a no-op
    val twice = Privacy.piiRedact(once)
      .select($"doc_id", $"redacted").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == first)
  }

  test("the generator really produces matching specimens (non-vacuous)") {
    val texts = (1L to 60L).map(s => sample(text, s))
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val total = Privacy.piiScan(df)
      .agg(org.apache.spark.sql.functions.sum($"pii_total")).head.getLong(0)
    assert(total > 20L, s"generator produced too few specimens: $total")
  }
}
