package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for the text-hash signatures. The relational
  * formulations (explode → 64 vote-sum aggregates / 32 min aggregates)
  * are correct and scale, but cost one shuffle of |tokens| rows per
  * document set; these compute the whole signature per row inside
  * WholeStageCodegen — zero shuffle, zero intermediate rows. Hashing uses
  * Spark's own XXH64 (seed 42), identical to the `xxhash64` SQL function
  * on a single argument.
  */
object TextHashes {

  private val seed = 42L

  /** 64-bit SimHash over a token array: per bit, +1/-1 votes from each
    * token occurrence's xxhash64 bit, then signs.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected array<string>, got ${other.simpleString}")
    }

    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val votes = new Array[Long](64)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
          var j = 0
          while (j < 64) {
            votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
            j += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val votes = ctx.freshName("votes")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val s = ctx.freshName("s")
        val sig = ctx.freshName("sig")
        s"""
           |long[] $votes = new long[64];
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  if (!$a.isNullAt($i)) {
           |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
           |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
           |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
           |    for (int $j = 0; $j < 64; $j++) {
           |      $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1L : -1L;
           |    }
           |  }
           |}
           |long $sig = 0L;
           |for (int $j = 0; $j < 64; $j++) {
           |  if ($votes[$j] > 0) $sig |= (1L << $j);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The PORTABLE SimHash: identical vote/sign scheme to [[SimHash64]] but
    * each token occurrence votes with the top 64 bits of its MD5 digest
    * (first 8 digest bytes, big-endian) instead of xxhash64 — exactly the
    * value ANSI-SQL engines can recompute as
    * `('0x' || substr(md5(tok), 1, 16))::UBIGINT` (same bits; two's
    * complement vs unsigned is irrelevant to per-bit votes). This is what
    * makes the simhash near-dup query DuckDB-oracle-checkable end to end;
    * the xxhash64 family stays the default (≈4× faster per token).
    */
  case class SimHash64Md5(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected array<string>, got ${other.simpleString}")
    }

    override protected def nullSafeEval(a: Any): Any =
      TextHashes.simHash64Md5Impl(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextHashes.simHash64Md5Impl($a);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // MessageDigest is stateful — one instance per executor thread.
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 64 bits of `md5(bytes of s)`, big-endian — the bits DuckDB reads
    * with `('0x' || substr(md5(s), 1, 16))::UBIGINT`.
    */
  def md5Top64(s: UTF8String): Long = {
    val md = md5Digest.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (digest(b) & 0xFFL); b += 1 }
    h
  }

  /** Portable md5-derived uniform in (0, 1]: the top 52 digest bits plus
    * one, over 2^52 — bit-identical to the SQL-replayable
    * `(conv(substring(md5(s), 1, 13), 16, 10) + 1.0) / 2^52` ring (13 hex
    * chars = top 52 bits) without materializing the hex string or parsing
    * it back. The deterministic-sampling primitive (bootstrap
    * multiplicities, weighted sampling keys).
    */
  def md5UniformImpl(s: UTF8String): Double =
    ((md5Top64(s) >>> 12) + 1.0) / 4503599627370496.0 // 2^52

  /** md5_uniform(s): DoubleType in (0, 1]; null-safe. */
  case class Md5Uniform(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected string, got ${other.simpleString}")
    }

    override protected def nullSafeEval(a: Any): Any =
      md5UniformImpl(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextHashes.md5UniformImpl($a);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def md5Uniform(c: Column): Column =
    GraftColumnShim.column(Md5Uniform(GraftColumnShim.expression(c)))

  /** TWO uniforms per digest: md5 yields 128 bits but the ring uses only
    * the top 52, so one digest can serve two independent draws — lane 0
    * reads hex chars 1–13 (bit-identical to [[md5UniformImpl]]), lane 1
    * reads hex chars 17–29 (the top 52 of the LOW 64 bits). Halves the
    * per-row digest count of ×b constructions (bootstrap resampling:
    * b draws now cost b/2 md5s). Both lanes stay SQL-replayable:
    * `('0x' || substr(md5(s), 1 + 16·lane, 13))::BIGINT`.
    */
  def md5TwoUniformsImpl(s: UTF8String): ArrayData = {
    val md = md5Digest.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var hi = 0L; var lo = 0L
    var b = 0
    while (b < 8) { hi = (hi << 8) | (digest(b) & 0xFFL); b += 1 }
    while (b < 16) { lo = (lo << 8) | (digest(b) & 0xFFL); b += 1 }
    new GenericArrayData(Array(
      ((hi >>> 12) + 1.0) / 4503599627370496.0, // 2^52
      ((lo >>> 12) + 1.0) / 4503599627370496.0))
  }

  /** md5_uniforms2(s): array<double> of the two lane draws; null-safe. */
  case class Md5Uniforms2(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected string, got ${other.simpleString}")
    }

    override protected def nullSafeEval(a: Any): Any =
      md5TwoUniformsImpl(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextHashes.md5TwoUniformsImpl($a);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def md5Uniforms2(c: Column): Column =
    GraftColumnShim.column(Md5Uniforms2(GraftColumnShim.expression(c)))

  /** Shared impl for [[SimHash64Md5]] eval + codegen. */
  def simHash64Md5Impl(arr: ArrayData): Long = {
    val votes = new Array[Long](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = md5Top64(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Order-sensitive PORTABLE rolling fingerprint over a token array:
    * the polynomial fold
    * `acc = (acc * B + (md5_top64(tok) mod M)) mod M`, `M = 2^61−1`,
    * `B = 1000003` — exactly what an ANSI-SQL engine replays with
    * 128-bit integers:
    * `list_reduce(list_prepend(0, list_transform(toks,
    *   t -> md5hex_top64(t) % M)), (a,b) -> (a*B + b) % M)`.
    * The previous formulation folded `acc = xxhash64(acc, tok)` through
    * the `aggregate` HOF — not expressible outside Spark AND interpreted
    * (CodegenFallback); this is value-checkable in DuckDB and runs inside
    * WholeStageCodegen. The 122-bit intermediate product is reduced with
    * `Math.multiplyHigh` and the Mersenne identities `2^61 ≡ 1`,
    * `2^64 ≡ 8 (mod M)`.
    */
  case class RollingFpMd5(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected array<string>, got ${other.simpleString}")
    }

    override protected def nullSafeEval(a: Any): Any =
      TextHashes.rollingFpMd5Impl(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextHashes.rollingFpMd5Impl($a);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private val FpMod = 2305843009213693951L // 2^61 - 1 (Mersenne prime)
  private val FpBase = 1000003L

  /** `(a * b) mod 2^61−1` for `0 ≤ a < 2^61`, `0 < b < 2^21`: the 128-bit
    * product `hi·2^64 + lo` collapses via `2^64 ≡ 8`, `2^61 ≡ 1 (mod M)`.
    */
  private def mulModMersenne61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // < 2^18 for our operand bounds
    val lo = a * b                   // wrapped low 64 bits
    var r = hi * 8L + (lo >>> 61) + (lo & FpMod)
    if (r >= FpMod) r -= FpMod
    r
  }

  /** Shared impl for [[RollingFpMd5]] eval + codegen. */
  def rollingFpMd5Impl(arr: ArrayData): Long = {
    var acc = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val tv = java.lang.Long.remainderUnsigned(
          md5Top64(arr.getUTF8String(i)), FpMod)
        acc = mulModMersenne61(acc, FpBase) + tv
        if (acc >= FpMod) acc -= FpMod
      }
      i += 1
    }
    acc
  }

  /** MinHash signature over pre-hashed shingles: slot `i` is
    * `min over h of XXH64.hashLong(h, i)` — the standard seeded family,
    * one array<long> out per row.
    */
  case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected array<bigint>, got ${other.simpleString}")
    }

    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val sigs = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i)
          var k = 0
          while (k < numHashes) {
            val v = XXH64.hashLong(h, k.toLong)
            if (v < sigs(k)) sigs(k) = v
            k += 1
          }
        }
        i += 1
      }
      new GenericArrayData(sigs)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val sigs = ctx.freshName("sigs")
        val i = ctx.freshName("i")
        val k = ctx.freshName("k")
        val h = ctx.freshName("h")
        val v = ctx.freshName("v")
        s"""
           |long[] $sigs = new long[$numHashes];
           |java.util.Arrays.fill($sigs, Long.MAX_VALUE);
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  if (!$a.isNullAt($i)) {
           |    long $h = $a.getLong($i);
           |    for (int $k = 0; $k < $numHashes; $k++) {
           |      long $v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, (long) $k);
           |      if ($v < $sigs[$k]) $sigs[$k] = $v;
           |    }
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct 64-bit-hashed word shingles over a token array: window `i`
    * hashes tokens `i..i+n-1` with the exact multi-argument `xxhash64`
    * chaining (seed 42, each token's hash seeds the next), so values are
    * bit-identical to the HOF formulation
    * `transform(sequence(...), i => xxhash64(element_at…))` this replaces.
    * That HOF is CodegenFallback (interpreted per element); this runs
    * inside WholeStageCodegen. First-occurrence order, like
    * `array_distinct`. Arrays shorter than `n` yield an empty result —
    * callers wrap with the whole-text fallback at the Column level.
    */
  case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected array<string>, got ${other.simpleString}")
    }

    override protected def nullSafeEval(a: Any): Any =
      TextHashes.hashedShinglesImpl(a.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextHashes.hashedShinglesImpl($a, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shared impl for [[HashedShingles]] eval + codegen (called from
    * generated Java via the static forwarder). Matches Spark's
    * `xxhash64(tok_i, …, tok_{i+n-1})`: seed 42, null arguments skipped.
    */
  def hashedShinglesImpl(arr: ArrayData, n: Int): ArrayData = {
    val numWindows = arr.numElements() - n + 1
    if (numWindows <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](numWindows)
    val seen = new java.util.HashSet[java.lang.Long](numWindows * 2)
    var cnt = 0
    var i = 0
    while (i < numWindows) {
      var h = seed
      var o = 0
      while (o < n) {
        if (!arr.isNullAt(i + o)) {
          val s = arr.getUTF8String(i + o)
          h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h)
        }
        o += 1
      }
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(if (cnt == numWindows) out else java.util.Arrays.copyOf(out, cnt))
  }

  def simhash64(tokens: Column): Column =
    GraftColumnShim.column(SimHash64(GraftColumnShim.expression(tokens)))

  def simhash64Md5(tokens: Column): Column =
    GraftColumnShim.column(SimHash64Md5(GraftColumnShim.expression(tokens)))

  def rollingFpMd5(tokens: Column): Column =
    GraftColumnShim.column(RollingFpMd5(GraftColumnShim.expression(tokens)))

  def minhashSigs(shingleHashes: Column, numHashes: Int): Column =
    GraftColumnShim.column(MinHashSigs(GraftColumnShim.expression(shingleHashes), numHashes))

  def hashedShingles(tokens: Column, n: Int): Column =
    GraftColumnShim.column(HashedShingles(GraftColumnShim.expression(tokens), n))
}
