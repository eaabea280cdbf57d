package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout — multi-dimensional
  * data skipping, the lakehouse complement to q87's single-key sorted
  * layout: interleaving the bits of two clustering keys makes files
  * (and so parquet row groups) own small RECTANGLES of the key space,
  * so a pushed-down literal predicate on EITHER dimension prunes row
  * groups via min/max stats — where a linear (a, b) sort serves only
  * predicates on `a` and reads everything for a `b`-only filter.
  *
  * This is the BOUNDS-QUANTIZED variant of the pair:
  * [[Maintenance.zorderValues]] buckets each column EQUI-DEPTH through
  * the rank core — skew-proof (a power-law key still spreads evenly)
  * but costs one range shuffle per clustered column; this one
  * quantizes linearly against the (min, max) bounds — ONE aggregate
  * row of preparation and zero extra shuffles, the right default when
  * keys are roughly uniform (days, sequential ids). Pick by key shape.
  *
  * The z-value is a pure codegen'd expression tree (shifts, masks, ors
  * — the classic magic-number bit spreading), never a UDF; the layout
  * write is one range repartition + within-partition sort on it, and
  * the z column is dropped before writing so readers see only real
  * columns. Quantization to the 16-bit-per-dimension grid is monotonic
  * (offset, then integer-divide when the span overflows 16 bits), so
  * clustering quality degrades gracefully rather than breaking.
  *
  * Scale notes: the only driver-side state is the two columns' min/max
  * (one aggregate row). At 100 TB the same shape holds — one pass to
  * bound the keys (or use catalog stats), one shuffle to lay out; the
  * payoff is every downstream selective scan on either key. Skew in z
  * space is handled by repartitionByRange's sampling exactly as q87's
  * single-key layout.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (Morton magic numbers), as a codegen'd expression.
    */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two already-quantized [0, 65535] values:
    * `a` on even bits, `b` on odd bits.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Monotonic quantization of an integral column onto the 16-bit grid:
    * subtract the lower bound; if the span exceeds 2^16, right-shift by
    * the smallest power of two that fits (exact integer arithmetic —
    * clustering coarsens, never breaks). Nulls land at the low edge so
    * they cluster together.
    */
  private def quantize(c: Column, lo: Long, hi: Long): Column = {
    // span arithmetic must stay in signed range: the row-side base
    // subtraction (c − lo) runs under ANSI and would throw on the same
    // inputs anyway — fail fast with an actionable message instead of
    // spinning (the old shift LOOP never terminated on span overflow:
    // a negative span keeps (span−1) >> k at −1 for every k, and Java
    // masks shift distances mod 64) or dying mid-job
    val span = try math.subtractExact(hi, lo) catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"z-order key span [$lo, $hi] exceeds Long range — rescale or " +
          "hash-bucket the key before clustering (a near-full-range key " +
          "has no meaningful 16-bit quantization)")
    }
    val base = coalesce(c.cast("long"), lit(lo)) - lit(lo)
    // smallest shift with span >> (16 + shift) == 0, from the span's
    // bit length — loop-free, and exact for every non-overflowing span
    val shift = math.max(0, 48 - java.lang.Long.numberOfLeadingZeros(span))
    if (shift == 0) base else shiftright(base, shift)
  }

  /** Write `df` as z-order-clustered parquet on (`colA`, `colB`) into
    * `numFiles` range partitions of z space. Content-preserving: only
    * the physical row placement changes.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    // one aggregate row: the key bounds (driver SCALARS, not a collect)
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    if (bounds.isNullAt(0) || bounds.isNullAt(2)) {
      // empty input (or all-null keys): nothing to cluster
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (loA, hiA) = (bounds.getLong(0), bounds.getLong(1))
    val (loB, hiB) = (bounds.getLong(2), bounds.getLong(3))
    df.withColumn("__graft_z",
        zValue(quantize(col(colA), loA, hiA), quantize(col(colB), loB, hiB)))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
