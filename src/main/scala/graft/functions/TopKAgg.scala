package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the `k` best (score, id) pairs per
  * group — score descending, id ascending on ties — in an O(k) heap
  * buffer. As a [[TypedImperativeAggregate]] it participates in partial
  * aggregation: each map task pre-reduces its slice to ≤ k pairs per
  * group BEFORE the shuffle, so a brute-force ANN over |corpus| × |queries|
  * scored rows moves only `k × partitions` rows per query across the
  * network instead of the full scored set — the difference between a
  * shuffle bounded by k and one bounded by the corpus at 100 TB.
  *
  * Rows with a null score or id are SKIPPED (undefined similarity does
  * not compete for the top-k) — a row_number window would instead rank
  * nulls last and still emit them within k.
  *
  * Output: `array<struct<id bigint, score double>>`, sorted best-first —
  * element i is exactly the rank-(i+1) row of the equivalent
  * `row_number() OVER (ORDER BY score DESC, id)` window (the q18 oracle
  * verifies this equivalence row-for-row against DuckDB).
  */
case class TopKAgg(scoreExpr: Expression, idExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (scoreExpr.dataType != DoubleType)
      TypeCheckFailure(s"score must be double, got ${scoreExpr.dataType.simpleString}")
    else if (idExpr.dataType != LongType)
      TypeCheckFailure(s"id must be bigint, got ${idExpr.dataType.simpleString}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(b: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    var j = 0
    while (j < other.size) { b.add(other.scores(j), other.ids(j)); j += 1 }
    b
  }

  override def eval(b: TopKAgg.Buffer): Any = {
    // sort with the Buffer's own comparator so NaN ordering stays
    // consistent with insertion/eviction (Double.compare: NaN greatest,
    // matching Spark's DESC window ordering)
    val order = (0 until b.size).sortWith { (x, y) =>
      TopKAgg.better(b.scores(x), b.ids(x), b.scores(y), b.ids(y))
    }
    new GenericArrayData(order.map { j =>
      InternalRow(b.ids(j), b.scores(j))
    }.toArray[Any])
  }

  override def serialize(b: TopKAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    var j = 0
    while (j < b.size) { bb.putDouble(b.scores(j)); bb.putLong(b.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKAgg.Buffer(k)
    var j = 0
    while (j < n) { b.add(bb.getDouble, bb.getLong); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {

  /** Total order matching Spark's `ORDER BY score DESC, id` window
    * semantics including NaN (Double.compare ranks NaN above +Inf, as
    * Spark's DESC ordering does — a plain `>` would make NaN both
    * unevictable and uninsertable).
    */
  @inline private[functions] def better(s1: Double, i1: Long,
                                        s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** O(k) insertion buffer: plain parallel arrays with worst-slot
    * tracking. "Better" = higher score, then smaller id.
    */
  final class Buffer(k: Int) {
    require(k > 0, s"k must be positive, got $k")
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size: Int = 0

    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      TopKAgg.better(s1, i1, s2, i2)

    private def worstIdx: Int = {
      var w = 0
      var j = 1
      while (j < size) {
        if (better(scores(w), ids(w), scores(j), ids(j))) w = j
        j += 1
      }
      w
    }

    def add(s: Double, i: Long): Unit = {
      if (size < k) { scores(size) = s; ids(size) = i; size += 1 }
      else {
        val w = worstIdx
        if (better(s, i, scores(w), ids(w))) { scores(w) = s; ids(w) = i }
      }
    }
  }

  /** `topK(score, id, k)` Column for use in `agg(...)`. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftColumnShim.column(TopKAgg(GraftColumnShim.expression(score),
      GraftColumnShim.expression(id), k).toAggregateExpression())
}
