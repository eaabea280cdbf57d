package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte/code-point scanners for the text-statistics counts
  * that were previously regex (`regexp_extract_all(...).size`) or
  * interpreted-HOF (`aggregate(tokens, 0, acc + length)`) formulations —
  * semantics bit-identical to those formulations (each spec asserts
  * equivalence on the corpus plus hostile edge cases), one linear scan,
  * no match-list allocation, inside WholeStageCodegen.
  *
  * Whitespace is the regex `\s` class WITHOUT UNICODE_CHARACTER_CLASS —
  * exactly { space, \t, \n, \x0B, \f, \r } — matching what
  * `split(str, "\\s+")` uses. Code points are counted (UTF-8 continuation
  * bytes skipped), matching `length()` and per-char regex classes.
  */
object TextScan {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  @inline private def isStart(b: Byte): Boolean = (b & 0xC0) != 0x80

  /** `size(split(trim(str), "\\s+"))`: Spark `trim` strips only 0x20
    * spaces, then split with limit -1 keeps empty fields — so the count is
    * (number of maximal \s runs in the space-trimmed string) + 1, which
    * also yields 1 for the empty string (`[""]`).
    */
  def wsTokenCountImpl(s: UTF8String): Int = {
    val n = s.numBytes()
    var lo = 0
    var hi = n
    while (lo < hi && s.getByte(lo) == ' ') lo += 1
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    var runs = 0
    var inWs = false
    var i = lo
    while (i < hi) {
      val b = s.getByte(i)
      if (isWs(b)) { if (!inWs) { runs += 1; inWs = true } }
      else inWs = false
      i += 1
    }
    runs + 1
  }

  /** Σ length(token) over the same split of `lower(text)`: total non-\s
    * code points of the space-trimmed LOWERCASED string (every non-ws code
    * point belongs to exactly one token; `length()` counts code points).
    * Counting lowered code points matters for exactly one input: U+0130
    * lowercases to 'i' + combining U+0307 — the only code point in Unicode
    * whose lowercase expands — so it counts 2, keeping the scanner
    * value-identical to the `aggregate(split(trim(lower(text))), …)`
    * formulation it replaces.
    */
  def wsCharCountImpl(s: UTF8String): Long = {
    val n = s.numBytes()
    var lo = 0
    var hi = n
    while (lo < hi && s.getByte(lo) == ' ') lo += 1
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    var cnt = 0L
    var i = lo
    while (i < hi) {
      val b = s.getByte(i)
      if (isStart(b) && !isWs(b)) {
        cnt += 1
        if (isDottedI(s, i, hi)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  /** U+212A KELVIN SIGN (E2 84 AA) — the ONLY code point whose Unicode
    * lowercase is a bare ASCII letter ('k'); U+0130 below is the only
    * other one producing ANY ASCII ('i' + combining U+0307). Verified by
    * exhaustive sweep of the Unicode lowercase table; the scanners fold
    * these two explicitly so their byte-level ASCII case-fold stays
    * bit-identical to `lower()`-then-regex on arbitrary Unicode input.
    */
  private def isKelvin(s: UTF8String, i: Int, n: Int): Boolean =
    (s.getByte(i) & 0xFF) == 0xE2 && i + 2 < n &&
      (s.getByte(i + 1) & 0xFF) == 0x84 && (s.getByte(i + 2) & 0xFF) == 0xAA

  /** U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE (C4 B0): lowercases to
    * 'i' U+0307 — an ASCII letter followed by a combining mark — under
    * Java/Spark (Unicode full mapping). NOTE: DuckDB's utf8proc `lower()`
    * maps it to bare 'i' instead, so DuckDB-oracle parity on corpora
    * containing U+0130 is out of contract; the pinned semantics here are
    * Spark's own regex-on-`lower()` formulation (asserted in TextScanSpec).
    */
  private def isDottedI(s: UTF8String, i: Int, n: Int): Boolean =
    (s.getByte(i) & 0xFF) == 0xC4 && i + 1 < n && (s.getByte(i + 1) & 0xFF) == 0xB0

  /** `size(regexp_extract_all(lower(str), "[a-z]+|[0-9]+|[^a-z0-9\\s]"))`
    * on the RAW string (case-folds to ASCII itself — a-z, plus the two
    * special code points above): greedy alternation = maximal letter runs
    * + maximal digit runs + one token per other non-\s code point.
    */
  def bpeTokenCountImpl(s: UTF8String): Int = {
    val n = s.numBytes()
    var cnt = 0
    var prev = 0 // 0 = none/other/ws, 1 = letter run, 2 = digit run
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (!isStart(b)) { /* continuation byte of an "other" code point */ }
      else if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) {
        if (prev != 1) { cnt += 1; prev = 1 }
      } else if (b >= '0' && b <= '9') {
        if (prev != 2) { cnt += 1; prev = 2 }
      } else if (isWs(b)) prev = 0
      else if (isKelvin(s, i, n)) { // lower → 'k': joins/starts a letter run
        if (prev != 1) { cnt += 1; prev = 1 }
      } else if (isDottedI(s, i, n)) {
        // lower → 'i' + U+0307: a letter (run) then an "other" token
        if (prev != 1) cnt += 1
        cnt += 1; prev = 0
      } else { cnt += 1; prev = 0 }
      i += 1
    }
    cnt
  }

  /** `size(regexp_extract_all(lower(str), "[<set>]"))`: occurrences of the
    * given lowercase-ASCII character set, case-folding the input itself
    * (ASCII A-Z plus U+212A→'k' and U+0130→'i', the only non-ASCII code
    * points whose lowercase reaches ASCII): one membership test per byte.
    */
  def asciiSetCountImpl(s: UTF8String, set: Array[Boolean]): Int = {
    val n = s.numBytes()
    var cnt = 0
    var i = 0
    while (i < n) {
      var b: Int = s.getByte(i) & 0xFF
      if (b >= 'A' && b <= 'Z') b += 32
      if (b < 128) { if (set(b)) cnt += 1 }
      else if (isKelvin(s, i, n)) { if (set('k')) cnt += 1 }
      else if (isDottedI(s, i, n)) { if (set('i')) cnt += 1 }
      i += 1
    }
    cnt
  }

  private def checkString(dt: DataType): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${other.simpleString}")
  }

  case class WsTokenCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = checkString(child.dataType)
    override protected def nullSafeEval(a: Any): Any =
      wsTokenCountImpl(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextScan.wsTokenCountImpl($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class WsCharCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = checkString(child.dataType)
    override protected def nullSafeEval(a: Any): Any =
      wsCharCountImpl(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextScan.wsCharCountImpl($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class BpeTokenCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = checkString(child.dataType)
    override protected def nullSafeEval(a: Any): Any =
      bpeTokenCountImpl(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextScan.bpeTokenCountImpl($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class AsciiSetCount(child: Expression, chars: String) extends UnaryExpression {
    require(chars.forall(c => c < 128 && !(c >= 'A' && c <= 'Z')),
      "set must be lowercase ASCII")
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = checkString(child.dataType)
    @transient private lazy val set: Array[Boolean] = {
      val a = new Array[Boolean](128)
      chars.foreach(c => a(c) = true)
      a
    }
    def count(s: UTF8String): Int = asciiSetCountImpl(s, set)
    override protected def nullSafeEval(a: Any): Any = count(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("asciiSetCount", this, classOf[AsciiSetCount].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.count($a);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def wsTokenCount(text: Column): Column =
    GraftColumnShim.column(WsTokenCount(GraftColumnShim.expression(text)))
  def wsCharCount(text: Column): Column =
    GraftColumnShim.column(WsCharCount(GraftColumnShim.expression(text)))
  def bpeTokenCount(text: Column): Column =
    GraftColumnShim.column(BpeTokenCount(GraftColumnShim.expression(text)))
  def asciiSetCount(text: Column, chars: String): Column =
    GraftColumnShim.column(AsciiSetCount(GraftColumnShim.expression(text), chars))
}
