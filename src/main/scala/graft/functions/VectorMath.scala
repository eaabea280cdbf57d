package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes

/** Native Catalyst expressions for embedding math. The higher-order-function
  * formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is interpreted
  * (CodegenFallback) and allocates per element; these generate a tight
  * primitive loop inside WholeStageCodegen — measured ~10× faster on the
  * brute-force ANN queries. Semantics match the HOF fold exactly:
  * left-to-right accumulation in double of per-element double products.
  */
object VectorMath {

  private def elemGetter(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(s"unsupported vector type $other")
  }

  private def checkVec(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<float> or array<double>, got ${other.simpleString}")
  }

  /** Σ a(i)·b(i), accumulated in double in element order. Mismatched vector
    * lengths yield NULL — exactly like the `aggregate(zip_with(a, b, _*_))`
    * fold, where `zip_with` pads with null and the sum nulls out. A corrupt
    * embedding must surface as null, never as a plausible partial product.
    */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(left.dataType, "left") match {
        case TypeCheckResult.TypeCheckSuccess => checkVec(right.dataType, "right")
        case f => f
      }

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val av = a.asInstanceOf[ArrayData]
      val bv = b.asInstanceOf[ArrayData]
      if (av.numElements() != bv.numElements()) return null
      val leftDouble = left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      val rightDouble = right.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      val n = av.numElements()
      var s = 0.0d
      var i = 0
      while (i < n) {
        val x = if (leftDouble) av.getDouble(i) else av.getFloat(i).toDouble
        val y = if (rightDouble) bv.getDouble(i) else bv.getFloat(i).toDouble
        s += x * y
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (ga, gb) = (elemGetter(left.dataType), elemGetter(right.dataType))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += (double) $a.$ga($i) * (double) $b.$gb($i);
           |  }
           |  ${ev.value} = $s;
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Random-hyperplane LSH bucket: bit `p` is the sign of the dot product
    * with plane `p`, whose component `j` is a splitmix64-derived
    * pseudo-random value in (-1, 1) from `(seed, p, j)` — deterministic
    * across executors with zero driver state, fully code-generated.
    */
  case class HyperplaneSig(child: Expression, numBits: Int, seed: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "vec")

    @inline private def mix(z0: Long): Long = {
      var z = z0
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    override protected def nullSafeEval(a: Any): Any = {
      val av = a.asInstanceOf[ArrayData]
      val isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      val n = av.numElements()
      var sig = 0L
      var p = 0
      while (p < numBits) {
        var dot = 0.0d
        var j = 0
        while (j < n) {
          val z = mix(seed.toLong * 0x9E3779B97F4A7C15L +
            p * 0xC2B2AE3D27D4EB4FL + j * 0x165667B19E3779F9L)
          val comp = (z % 10000L).toDouble / 10000.0
          val x = if (isDouble) av.getDouble(j) else av.getFloat(j).toDouble
          dot += x * comp
          j += 1
        }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val g = elemGetter(child.dataType)
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val p = ctx.freshName("p")
        val j = ctx.freshName("j")
        val z = ctx.freshName("z")
        val dot = ctx.freshName("dot")
        val sig = ctx.freshName("sig")
        s"""
           |int $n = $a.numElements();
           |long $sig = 0L;
           |for (int $p = 0; $p < $numBits; $p++) {
           |  double $dot = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    long $z = ${seed}L * 0x9E3779B97F4A7C15L +
           |      $p * 0xC2B2AE3D27D4EB4FL + $j * 0x165667B19E3779F9L;
           |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
           |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
           |    $z = $z ^ ($z >>> 31);
           |    $dot += (double) $a.$g($j) * ((double) ($z % 10000L) / 10000.0);
           |  }
           |  if ($dot > 0) $sig |= (1L << $p);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** PORTABLE random-hyperplane signature: same sign-LSH scheme as
    * [[HyperplaneSig]] but hyperplane components derive from md5 of the
    * string key `"seed:plane:component"` — the one hash every SQL engine
    * shares — so an oracle can regenerate the identical planes:
    * `((md5_top64(s||':'||p||':'||j) % 20001)::BIGINT − 10000) / 10000.0`.
    * Components are data-independent, so they are computed once per
    * (seed, numBits, dim) per JVM and cached; per-row cost is then
    * identical to the splitmix64 family. The dot is summed in component
    * order, matching a sequential `list_reduce` replay.
    */
  case class HyperplaneSigMd5(child: Expression, numBits: Int, seed: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "vec")

    override protected def nullSafeEval(a: Any): Any =
      VectorMath.hyperplaneSigMd5Impl(a.asInstanceOf[ArrayData], numBits, seed,
        child.dataType.asInstanceOf[ArrayType].elementType == DoubleType)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = graft.functions.VectorMath.hyperplaneSigMd5Impl(
           |  $a, $numBits, $seed, $isDouble);""".stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // (seed, numBits, dim) → row-major [plane][component] array; planes are
  // tiny (bits × dim doubles) and reused by every row in the executor.
  private val md5PlaneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]

  private def md5Planes(seed: Int, numBits: Int, dim: Int): Array[Double] =
    md5PlaneCache.computeIfAbsent((seed, numBits, dim), _ => {
      val arr = new Array[Double](numBits * dim)
      var p = 0
      while (p < numBits) {
        var j = 0
        while (j < dim) {
          val u = java.lang.Long.remainderUnsigned(
            TextHashes.md5Top64(
              org.apache.spark.unsafe.types.UTF8String.fromString(s"$seed:$p:$j")),
            20001L)
          arr(p * dim + j) = (u - 10000L).toDouble / 10000.0
          j += 1
        }
        p += 1
      }
      arr
    })

  /** Shared impl for [[HyperplaneSigMd5]] eval + codegen. */
  def hyperplaneSigMd5Impl(av: ArrayData, numBits: Int, seed: Int,
                           isDouble: Boolean): Long = {
    val n = av.numElements()
    val comps = md5Planes(seed, numBits, n)
    var sig = 0L
    var p = 0
    while (p < numBits) {
      var dot = 0.0d
      var j = 0
      while (j < n) {
        val x = if (isDouble) av.getDouble(j) else av.getFloat(j).toDouble
        dot += x * comps(p * n + j)
        j += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** max |x_i| — the symmetric-quantization scale of a vector. */
  case class VecMaxAbs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "vec")
    override protected def nullSafeEval(a: Any): Any = {
      val av = a.asInstanceOf[ArrayData]
      val isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      var m = 0.0d
      var i = 0
      while (i < av.numElements()) {
        val x = math.abs(if (isDouble) av.getDouble(i) else av.getFloat(i).toDouble)
        if (x > m) m = x
        i += 1
      }
      m
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val g = elemGetter(child.dataType)
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val m = ctx.freshName("m")
        val x = ctx.freshName("x")
        s"""
           |double $m = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $x = java.lang.Math.abs((double) $a.$g($i));
           |  if ($x > $m) $m = $x;
           |}
           |${ev.value} = $m;
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Symmetric int8 quantization: `round(x_i * 127 / scale)` per element
    * (zero vector → all zeros), emitted as `array<long>` so SQL engines
    * compare it natively — the 4× storage/IO lever for embedding stores;
    * dequantize is `q_i * scale / 127` with ≤ scale/254 per-element error.
    * Rounding is half-away-from-zero — DuckDB's and Spark SQL's
    * `round(DOUBLE)` behavior, including for negative components.
    */
  case class VecQuantize8(child: Expression, scale: Expression)
      extends BinaryExpression {
    override def left: Expression = child
    override def right: Expression = scale
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child.dataType, "vec") match {
        case TypeCheckResult.TypeCheckSuccess => scale.dataType match {
          case DoubleType => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"scale must be double, got ${other.simpleString}")
        }
        case f => f
      }
    override protected def nullSafeEval(a: Any, s: Any): Any = {
      val av = a.asInstanceOf[ArrayData]
      val sc = s.asInstanceOf[Double]
      val isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      val out = new Array[Long](av.numElements())
      if (sc != 0.0) {
        var i = 0
        while (i < out.length) {
          val x = if (isDouble) av.getDouble(i) else av.getFloat(i).toDouble
          val v = x * 127.0 / sc
          out(i) = (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
          i += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val g = elemGetter(child.dataType)
      nullSafeCodeGen(ctx, ev, (a, s) => {
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        s"""
           |long[] $out = new long[$a.numElements()];
           |if ($s != 0.0) {
           |  for (int $i = 0; $i < $a.numElements(); $i++) {
           |    double v = (double) $a.$g($i) * 127.0 / $s;
           |    $out[$i] = (long) (v >= 0 ? java.lang.Math.floor(v + 0.5)
           |                              : java.lang.Math.ceil(v - 0.5));
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      })
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(child = newLeft, scale = newRight)
  }

  // ------------------------------------------------------- Column wrappers

  def dot(a: Column, b: Column): Column =
    GraftColumnShim.column(VecDot(GraftColumnShim.expression(a),
      GraftColumnShim.expression(b)))

  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  def maxAbs(a: Column): Column =
    GraftColumnShim.column(VecMaxAbs(GraftColumnShim.expression(a)))

  def quantize8(a: Column, scale: Column): Column =
    GraftColumnShim.column(VecQuantize8(GraftColumnShim.expression(a),
      GraftColumnShim.expression(scale)))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def hyperplaneSig(vec: Column, numBits: Int, seed: Int): Column =
    GraftColumnShim.column(HyperplaneSig(GraftColumnShim.expression(vec), numBits, seed))

  def hyperplaneSigMd5(vec: Column, numBits: Int, seed: Int): Column =
    GraftColumnShim.column(HyperplaneSigMd5(GraftColumnShim.expression(vec), numBits, seed))
}
