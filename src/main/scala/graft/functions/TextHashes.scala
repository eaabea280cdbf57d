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

  def minhashSigs(shingleHashes: Column, numHashes: Int): Column =
    GraftColumnShim.column(MinHashSigs(GraftColumnShim.expression(shingleHashes), numHashes))

  def hashedShingles(tokens: Column, n: Int): Column =
    GraftColumnShim.column(HashedShingles(GraftColumnShim.expression(tokens), n))
}
