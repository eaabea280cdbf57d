package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch aggregate: Greenwald–Khanna summaries (the
  * engine's own `QuantileSummaries`, the machinery behind
  * `approx_percentile`) evaluated to a SERIALIZED binary column instead
  * of an answer — the persistable member of the incremental-monitoring
  * family ([[graft.operators.Sketches]]): per-source/day sketch frames
  * that tomorrow's job folds with a merge law instead of rescanning
  * history, then probes for any quantile.
  *
  * Guarantee: a query at fraction p returns a value whose rank is
  * within ±ε·n of ⌈p·n⌉ (ε = `relativeError`), and the GK merge
  * preserves the bound for the union. Unlike the HLL register-max or
  * the CMS counter-sum, GK merge output depends on merge ORDER — two
  * builds of the same data may differ WITHIN the bound — so this
  * family is spec-verified against the rank-error law (and for exact
  * parquet round-trip stability of a materialized sketch), not
  * hash-gated; the q-less precedent is the HLL row.
  *
  * State per group is the compressed summary (O(1/ε · log(εn))
  * entries), map-side combinable like every TypedImperativeAggregate.
  */
case class QuantileSketchAgg(child: Expression, relativeError: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] {

  require(relativeError > 0 && relativeError < 1,
    s"relativeError out of (0,1): $relativeError")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != DoubleType)
      TypeCheckFailure(s"value must be double, got ${child.dataType.simpleString}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relativeError)

  override def update(b: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    // nulls don't participate (percentile semantics); insert returns the
    // (possibly compressed) successor buffer
    if (v == null) b else b.insert(v.asInstanceOf[Double])
  }

  override def merge(b: QuantileSummaries,
                     other: QuantileSummaries): QuantileSummaries =
    b.compress().merge(other.compress())

  override def eval(b: QuantileSummaries): Any =
    QuantileSketchAgg.toBytes(b.compress())

  override def serialize(b: QuantileSummaries): Array[Byte] =
    QuantileSketchAgg.toBytes(b.compress())

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchAgg.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object QuantileSketchAgg {

  /** Flat self-describing byte layout (compressThreshold, relativeError,
    * count, then the (value, g, delta) triples of the COMPRESSED
    * summary) — survives parquet losslessly and re-instantiates on any
    * JVM without java serialization.
    */
  def toBytes(qs: QuantileSummaries): Array[Byte] = {
    val s = qs.sampled
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + s.length * 24)
    bb.putInt(qs.compressThreshold)
    bb.putDouble(qs.relativeError)
    bb.putLong(qs.count)
    bb.putInt(s.length)
    s.foreach { st =>
      bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta)
    }
    bb.array()
  }

  /** Inverse of [[toBytes]]. These bytes round-trip USER-SUPPLIED parquet
    * (persisted sketch columns fed back through `mergeQuantileSketches` /
    * `estimateQuantiles`), so the shape is validated up front: truncated
    * or foreign binary must surface as a named error, not a raw
    * `BufferUnderflowException` — or worse, silently misparse into a
    * plausible-looking bogus sketch.
    */
  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    def bad(why: String) = throw new IllegalArgumentException(
      s"not a graft quantile sketch: $why (${bytes.length} bytes)")
    if (bytes.length < 24) bad("header needs 24 bytes")
    val bb = ByteBuffer.wrap(bytes)
    val threshold = bb.getInt
    val err = bb.getDouble
    val count = bb.getLong
    val n = bb.getInt
    if (threshold <= 0) bad(s"compressThreshold $threshold must be > 0")
    if (!(err > 0.0 && err < 1.0)) bad(s"relativeError $err outside (0, 1)")
    if (count < 0) bad(s"count $count negative")
    if (n < 0 || bytes.length != 24 + n.toLong * 24)
      bad(s"declared $n entries needs ${24 + n.toLong * 24} bytes")
    val stats = Array.fill(n)(Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(threshold, err, stats, count, true)
  }

  /** `quantileSketch(value, eps)` Column for use in `agg(...)`. */
  def sketch(value: Column, relativeError: Double): Column =
    GraftColumnShim.column(
      QuantileSketchAgg(GraftColumnShim.expression(value), relativeError)
        .toAggregateExpression())
}
