package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UnicodeNormSpec extends SparkSpecBase {

  import UnicodeNorm.{NfcNormalize, nfc, nfcImpl}

  private val decomposed = "cafe\u0301 a\u0300"   // e+acute, a+grave
  private val composed   = "caf\u00e9 \u00e0"     // é à — the NFC form

  test("canonical composition: decomposed input composes to the " +
    "precomposed form; already-NFC input passes through") {
    import spark.implicits._
    val out = Seq(decomposed, composed, "plain ascii", "x\u0301")
      .toDF("s")
      .select(nfc(col("s")).as("n"), length(col("s")).as("lb"),
        length(nfc(col("s"))).as("la"))
      .collect()
    assert(out(0).getString(0) == composed && out(0).getInt(1) == 8 &&
      out(0).getInt(2) == 6, "decomposed must compose (2 marks absorbed)")
    assert(out(1).getString(0) == composed, "precomposed must be unchanged")
    assert(out(2).getString(0) == "plain ascii", "ASCII passes through")
    // x + U+0301 has no precomposed pair: NFC is composition, not
    // mark-stripping — the mark survives
    assert(out(3).getString(0) == "x\u0301" && out(3).getInt(2) == 2)
  }

  test("idempotent, and equal across interpreted eval and codegen") {
    // interpreted path (Expression.eval on a Literal child)
    val interp = NfcNormalize(Literal(decomposed))
      .eval(null).asInstanceOf[UTF8String].toString
    assert(interp == composed)
    assert(nfcImpl(UTF8String.fromString(composed)).toString == composed,
      "idempotence")
    // the DataFrame run above exercises the codegen path; pin equality
    import spark.implicits._
    val viaDf = Seq(decomposed).toDF("s").select(nfc(col("s"))).head.getString(0)
    assert(viaDf == interp, "codegen and interpreted must agree")
  }

  test("ASCII fast path returns the input object itself (zero-copy)") {
    val in = UTF8String.fromString("the quick brown fox 123")
    assert(nfcImpl(in) eq in)
    // already-normalized non-ASCII also avoids re-encoding
    val nonAscii = UTF8String.fromString(composed)
    assert(nfcImpl(nonAscii) eq nonAscii)
  }

  test("null in, null out; SQL registration graft_nfc works") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq(Some(decomposed), None).toDF("s")
      .selectExpr("graft_nfc(s) AS n").collect()
    assert(out(0).getString(0) == composed)
    assert(out(1).isNullAt(0))
  }
}
