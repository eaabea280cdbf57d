package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen set operations over arrays — the count-only forms of
  * operations Spark only offers as array-materializing builtins or
  * interpreted higher-order functions:
  *
  *  - [[CountInSet]] replaces `size(filter(toks, t => t = m1 or ... or mk))`
  *    — the HOF is CodegenFallback and re-evaluates an interpreted k-way
  *    OR per array element; this is one hash probe per element inside
  *    WholeStageCodegen.
  *  - [[IntersectCount]] replaces `size(array_intersect(a, b))` — the
  *    builtin builds a hash set AND materializes the intersection array
  *    per row just to take its length; this counts matches with zero
  *    allocation beyond one reusable set per call.
  */
object ArraySetOps {

  /** Count of array elements (with multiplicity, nulls skipped) that are
    * members of the static string set — the marker/stopword scoring
    * primitive of [[graft.operators.TextAnalysis]].
    */
  case class CountInSet(child: Expression, set: Seq[String]) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected array<string>, got ${other.simpleString}")
    }

    // built per JVM (the Seq[String] field is what serializes to executors)
    @transient private lazy val utf8Set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](set.size * 2)
      set.foreach(m => s.add(UTF8String.fromString(m)))
      s
    }

    def countIn(arr: ArrayData): Int = {
      var cnt = 0
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i) && utf8Set.contains(arr.getUTF8String(i))) cnt += 1
        i += 1
      }
      cnt
    }

    override protected def nullSafeEval(a: Any): Any =
      countIn(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("countInSet", this,
        classOf[CountInSet].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.countIn($a);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `|a ∩ b|` for two `array<bigint>` columns, counting DISTINCT common
    * values (identical to `size(array_intersect(a, b))`): the probe side
    * is deduplicated by removing each value from the set on first match.
    * Builds one hash set from the smaller array; no output array.
    */
  case class IntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"expected (array<bigint>, array<bigint>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      ArraySetOps.intersectCountImpl(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.ArraySetOps.intersectCountImpl($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `|a ∩ b|` for two SORTED-ASCENDING, DISTINCT, null-free
    * `array<bigint>` columns — the zero-allocation form of
    * [[IntersectCount]] for the near-dup verify join, where the per-doc
    * shingle arrays are sorted once at build time
    * ([[graft.operators.Dedup]]) and then intersected against O(candidates)
    * partners: a primitive two-pointer merge per pair instead of building
    * a boxed hash set per pair. Sortedness is the CALLER's contract; on
    * unsorted input the count is simply wrong, so this is not exposed as a
    * SQL function.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    // containsNull = false REQUIRED: the merge reads elements with getLong,
    // where a null slot would surface as 0L and silently corrupt the count
    // (a real hash value 0 on the other side would "match" it). Nullable
    // element types are rejected at analysis time instead.
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"expected non-null-element (array<bigint>, array<bigint>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      ArraySetOps.sortedIntersectCountImpl(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.ArraySetOps.sortedIntersectCountImpl($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Two-pointer merge count over sorted distinct long arrays. */
  def sortedIntersectCountImpl(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { cnt += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    cnt
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnShim.column(SortedIntersectCount(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Shared impl for [[IntersectCount]] eval + codegen. Null elements are
    * ignored (matching `array_intersect`'s treatment when one side lacks
    * null — our hashed-shingle arrays never contain null).
    */
  def intersectCountImpl(a: ArrayData, b: ArrayData): Int = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[java.lang.Long](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getLong(i))
      i += 1
    }
    var cnt = 0
    var j = 0
    while (j < large.numElements() && !set.isEmpty) {
      // remove-on-match: duplicate values in `large` count once, matching
      // array_intersect's distinct semantics
      if (!large.isNullAt(j) && set.remove(large.getLong(j))) cnt += 1
      j += 1
    }
    cnt
  }

  def countInSet(tokens: Column, set: Seq[String]): Column =
    GraftColumnShim.column(CountInSet(GraftColumnShim.expression(tokens), set))

  def intersectCount(a: Column, b: Column): Column =
    GraftColumnShim.column(IntersectCount(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
