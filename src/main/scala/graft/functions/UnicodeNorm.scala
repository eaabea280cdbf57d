package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Web-scraped training text mixes precomposed ("é" U+00E9) and
  * decomposed ("e" + U+0301) forms of the same visible character;
  * every downstream exact operator — hash dedup, shingling, BPE word
  * keys, fingerprints — treats the two as distinct unless the corpus
  * is canonicalized first, so NFC is the first step of every
  * production text-cleaning pipeline (and what DuckDB ships as
  * `nfc_normalize`, which the oracle mirrors directly).
  *
  * Spark has no built-in normalizer, so this wraps the JDK's
  * `java.text.Normalizer` (Unicode canonical composition — the same
  * algorithm utf8proc implements for DuckDB) in a `UnaryExpression`
  * that stays inside WholeStageCodegen. The dominant web-corpus case
  * is pure ASCII, which is closed under NFC: a byte scan skips the
  * String round-trip entirely, so the common row costs one branch per
  * 8 bytes and zero allocation.
  */
object UnicodeNorm {

  /** Shared impl for eval + codegen (called from generated Java via the
    * static forwarder). Returns the INPUT object unchanged for ASCII /
    * already-normalized strings — zero copies on the hot path.
    */
  def nfcImpl(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC never rewrites ASCII, and UTF-8 high bits
    // identify non-ASCII without decoding
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected string, got ${other.simpleString}")
    }

    override protected def nullSafeEval(a: Any): Any =
      nfcImpl(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfcImpl($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nfc(c: Column): Column =
    GraftColumnShim.column(NfcNormalize(GraftColumnShim.expression(c)))
}
