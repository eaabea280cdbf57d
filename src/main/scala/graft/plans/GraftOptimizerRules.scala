package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.ArraySetOps.IntersectCount

/** Catalyst optimizer rules for graft workloads, injected via
  * [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * [[RewriteIntersectionSize]]: `size(array_intersect(a, b))` allocates
  * and materializes the intersection ARRAY per row just to take its
  * length; when only the count is consumed it is replaced by the
  * count-only codegen expression [[IntersectCount]] — the hot shape of
  * set-overlap similarity (Jaccard verification joins run it per
  * candidate pair).
  *
  * Rewrite conditions (exactness, not heuristics):
  *  - both sides are `array<bigint>` with `containsNull = false` —
  *    `array_intersect` can match null elements, IntersectCount skips
  *    them, so nullable-element arrays are left alone;
  *  - NULL handling already agrees: either input NULL → both forms
  *    yield NULL (ANSI `size(NULL) = NULL`).
  */
object RewriteIntersectionSize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // `legacySizeOfNull = false` only: under spark.sql.legacy.sizeOfNull
      // (the non-ANSI default) size(NULL) = -1 while IntersectCount yields
      // NULL, so legacy-size sessions must keep the original expression.
      case Size(ArrayIntersect(a, b), legacySizeOfNull)
          if !legacySizeOfNull &&
            isNonNullLongArray(a.dataType) && isNonNullLongArray(b.dataType) =>
        IntersectCount(a, b)
    }

  private def isNonNullLongArray(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case ArrayType(LongType, containsNull) => !containsNull
      case _ => false
    }
}
