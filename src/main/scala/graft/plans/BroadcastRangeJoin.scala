package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Broadcast point-in-interval join — a whole-operator Catalyst extension
  * (logical pattern → custom strategy → custom physical operator),
  * registered through `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * The user writes the fully declarative form and hints the interval side:
  *
  *   points.join(intervals.hint("broadcast"),
  *     col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
  *
  * Built-in Spark has no equi-keys to hash on, so it plans a
  * BroadcastNestedLoopJoin: every point row scans ALL m intervals —
  * O(n·m) comparisons. [[BroadcastRangeJoinStrategy]] recognizes the
  * pure-interval-containment shape and emits
  * [[BroadcastPointInIntervalJoinExec]] instead: the broadcast intervals
  * are sorted by start once per task, each point row binary-searches the
  * start bound and walks back under a prefix-max-end early stop —
  * O(log m + scanned candidates) per row, where the early stop bounds the
  * scan by the first position whose prefix-max-end cannot reach the probe.
  * For typical interval sets (bounded overlap) that is O(log m + hits);
  * one adversarially long interval below many short ones keeps the
  * prefix-max high and degrades the walk toward O(m) for probes above it
  * (an interval tree removes that case at higher constant cost — out of
  * scope for a broadcast dimension side). Still strictly better than
  * BNLJ, which pays O(m) comparisons on EVERY row.
  *
  * Scale design: the interval side must be broadcastable (dimension-sized
  * — calendars, buckets, config windows); the 100 TB point side never
  * shuffles and is never re-scanned. For interval sides too big to
  * broadcast, use [[graft.operators.RangeJoin]]'s bucketed equi-join path
  * instead (shuffle-based, corpus×corpus). The strategy only fires on an
  * explicit broadcast hint, so it never steals a plan Spark could hash-join.
  *
  * Semantics: INNER join on `p ∈ [s, e]` (either bound optionally strict,
  * operands in either order). NULL point, start, or end never matches —
  * identical to the BNLJ predicate semantics it replaces.
  */
object BroadcastRangeJoin {

  /** Idempotently add the strategy to a live session (the
    * `spark.experimental.extraStrategies` runtime injection point; for
    * spark-submit use `spark.sql.extensions=graft.functions.GraftExtensions`).
    */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[BroadcastRangeJoinStrategy.type]))
      spark.experimental.extraStrategies = cur :+ BroadcastRangeJoinStrategy
  }
}

/** Matches `Join(Inner, (p >=|> s) && (p <=|< e))` where `p` is computed
  * purely from the left side, `s`/`e` purely from the (broadcast-hinted)
  * right side, and the condition has NO other conjuncts (an extra
  * equality would make a hash join the better plan — leave those to
  * Spark). Fires only on an explicit right-side broadcast hint.
  */
object BroadcastRangeJoinStrategy extends SparkStrategy {

  // (point, bound, boundIsFromRight) for one comparison, normalized to
  // "point OP bound" with OP ∈ {>=, >, <=, <}
  private final case class Bound(point: Expression, bound: Expression, strict: Boolean)

  private def splitSides(a: Expression, b: Expression,
                         left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] = {
    val (lrefs, rrefs) = (left.outputSet, right.outputSet)
    if (a.references.subsetOf(lrefs) && b.references.subsetOf(rrefs)) Some((a, b))
    else None
  }

  /** Normalize one conjunct to `point >= / > bound` (lower) form. */
  private def asLower(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Bound] = e match {
    case GreaterThanOrEqual(a, b) => splitSides(a, b, left, right).map { case (p, s) => Bound(p, s, strict = false) }
    case GreaterThan(a, b) => splitSides(a, b, left, right).map { case (p, s) => Bound(p, s, strict = true) }
    case LessThanOrEqual(a, b) => splitSides(b, a, left, right).map { case (p, s) => Bound(p, s, strict = false) }
    case LessThan(a, b) => splitSides(b, a, left, right).map { case (p, s) => Bound(p, s, strict = true) }
    case _ => None
  }

  /** Normalize one conjunct to `point <= / < bound` (upper) form. */
  private def asUpper(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Bound] = e match {
    case LessThanOrEqual(a, b) => splitSides(a, b, left, right).map { case (p, u) => Bound(p, u, strict = false) }
    case LessThan(a, b) => splitSides(a, b, left, right).map { case (p, u) => Bound(p, u, strict = true) }
    case GreaterThanOrEqual(a, b) => splitSides(b, a, left, right).map { case (p, u) => Bound(p, u, strict = false) }
    case GreaterThan(a, b) => splitSides(b, a, left, right).map { case (p, u) => Bound(p, u, strict = true) }
    case _ => None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(And(c1, c2)), hint)
        if hint.rightHint.exists(_.strategy.contains(BROADCAST)) =>
      val candidates = Seq((c1, c2), (c2, c1)).flatMap { case (lo, hi) =>
        for {
          lb <- asLower(lo, left, right)
          ub <- asUpper(hi, left, right)
          // both comparisons must test the SAME point expression and an
          // ordering-capable type
          if lb.point.semanticEquals(ub.point) &&
            RowOrdering.isOrderable(lb.point.dataType) &&
            lb.bound.dataType == lb.point.dataType &&
            ub.bound.dataType == ub.point.dataType
        } yield BroadcastPointInIntervalJoinExec(
          lb.point, lb.bound, ub.bound, lb.strict, ub.strict,
          planLater(left), planLater(right))
      }
      candidates.headOption.toSeq
    case _ => Nil
  }
}

/** Physical broadcast point-in-interval join. The right (interval) side
  * arrives through Spark's own BroadcastExchange (identity mode) — 8 GB
  * guard, driver memory accounting and reuse across stages all included.
  * Per task: sort interval rows by start bound (m log m, once), build a
  * prefix-max-end array, then stream the left side — binary search for
  * the rightmost start ≤ p, walk back while prefix-max-end ≥ p emitting
  * matches. Intervals with NULL bounds and points that are NULL never
  * match (dropped at build / probe respectively).
  */
final case class BroadcastPointInIntervalJoinExec(
    point: Expression, lower: Expression, upper: Expression,
    strictLower: Boolean, strictUpper: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(point.dataType)

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRight: Broadcast[Array[InternalRow]] =
      right.executeBroadcast[Array[InternalRow]]()
    val pointBound = BindReferences.bindReference(point, left.output)
    val lowerBound = BindReferences.bindReference(lower, right.output)
    val upperBound = BindReferences.bindReference(upper, right.output)
    val (sLo, sHi) = (strictLower, strictUpper)
    val ord = ordering
    val outputAttrs = output
    val numOutputRows = longMetric("numOutputRows")

    left.execute().mapPartitions { leftIter =>
      // sort the broadcast intervals by lower bound once per task; rows
      // with a NULL bound can never match and are dropped here
      val rows = broadcastRight.value
      val entries = new Array[(Any, Any, InternalRow)](rows.length)
      var n = 0
      rows.foreach { r =>
        val lo = lowerBound.eval(r)
        val hi = upperBound.eval(r)
        if (lo != null && hi != null) { entries(n) = (lo, hi, r); n += 1 }
      }
      val sorted = java.util.Arrays.copyOf(entries, n)
      java.util.Arrays.sort(sorted, Ordering.by[(Any, Any, InternalRow), Any](_._1)(ord))
      // prefixMaxEnd(i) = max upper bound over sorted(0..i): the back-walk
      // from the binary-search index can stop as soon as no earlier
      // interval can still reach the probe point
      val prefixMaxEnd = new Array[Any](sorted.length)
      var i = 0
      var runningMax: Any = null
      while (i < sorted.length) {
        if (runningMax == null || ord.compare(sorted(i)._2, runningMax) > 0)
          runningMax = sorted(i)._2
        prefixMaxEnd(i) = runningMax
        i += 1
      }
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)

      leftIter.flatMap { leftRow =>
        val p = pointBound.eval(leftRow)
        if (p == null || sorted.length == 0) Iterator.empty
        else {
          // rightmost index with start <= p (or < p when the lower bound
          // is strict)
          var loIdx = 0
          var hiIdx = sorted.length - 1
          var last = -1
          while (loIdx <= hiIdx) {
            val mid = (loIdx + hiIdx) >>> 1
            val c = ord.compare(sorted(mid)._1, p)
            if (c < 0 || (c == 0 && !sLo)) { last = mid; loIdx = mid + 1 }
            else hiIdx = mid - 1
          }
          new Iterator[InternalRow] {
            private var idx = last
            private var nextRow: InternalRow = null
            private def advance(): Unit = {
              nextRow = null
              while (nextRow == null && idx >= 0) {
                // early stop: nothing at or before idx can reach p anymore
                val reach = ord.compare(prefixMaxEnd(idx).asInstanceOf[Any], p)
                if (reach < 0 || (reach == 0 && sHi)) { idx = -1 }
                else {
                  val (_, hi, r) = sorted(idx)
                  val c = ord.compare(hi, p)
                  if (c > 0 || (c == 0 && !sHi)) nextRow = r
                  idx -= 1
                }
              }
            }
            advance()
            override def hasNext: Boolean = nextRow != null
            override def next(): InternalRow = {
              val out = resultProj(joined(leftRow, nextRow))
              numOutputRows += 1
              advance()
              out
            }
          }
        }
      }
    }
  }
}
