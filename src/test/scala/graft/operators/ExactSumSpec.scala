package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ExactSumSpec extends SparkSpecBase {

  import spark.implicits._

  private def quantRef(xs: Seq[Double]): BigInt =
    xs.map(x => BigInt(math.floor(x * 1e6 + 0.5).toLong)).sum

  test("total equals the BigDecimal reference on mixed-sign values") {
    val xs = Seq(1.25, -3.999999, 0.0000004, 12345.678901, -0.5, 2.5e9,
      -1.7e9, 0.1, 0.2, 0.3)
    val df = xs.toDF("x").withColumn("g", lit("all"))
    val out = df.groupBy(col("g"))
      .agg(ExactSum.aggs("s", col("x")).head,
        ExactSum.aggs("s", col("x")).tail: _*)
      .select(ExactSum.total("s").cast("string").as("t"))
      .head().getString(0)
    assert(BigInt(out) == quantRef(xs))
  }

  test("total is invariant under repartitioning (order-free)") {
    val xs = (1 to 50000).map(i => math.sin(i.toDouble) * 1e7)
    val df = xs.toDF("x").withColumn("g", lit(1))
    val totals = Seq(1, 7, 32).map { n =>
      df.repartition(n).groupBy(col("g"))
        .agg(ExactSum.aggs("s", col("x")).head,
        ExactSum.aggs("s", col("x")).tail: _*)
        .select(ExactSum.total("s").cast("string"))
        .head().getString(0)
    }
    assert(totals.distinct.size == 1)
    assert(BigInt(totals.head) == quantRef(xs))
  }

  test("digit-split identity holds for negative quantized values") {
    // q for -3.999999 is -3999999: shift/mask digits must recombine to
    // exactly q (arithmetic shift floors, mask is non-negative)
    val q = -3999999L
    val d2 = q >> 40
    val d1 = (q >> 20) & ((1L << 20) - 1)
    val d0 = q & ((1L << 20) - 1)
    assert(d2 * (1L << 40) + d1 * (1L << 20) + d0 == q)
  }

  test("totalDouble matches the decimal-sum path on a wide group") {
    val df = (1 to 10000).map(i => (i % 3, i * 0.37 - 500.0))
      .toDF("g", "x")
    val fast = df.groupBy(col("g"))
      .agg(ExactSum.aggs("s", col("x")).head,
        ExactSum.aggs("s", col("x")).tail: _*)
      .select(col("g"), ExactSum.totalDouble("s").as("v"))
    // reference: quantize identically, sum in decimal
    val slow = df.groupBy(col("g"))
      .agg((sum(floor(col("x") * 1000000d + 0.5d).cast("decimal(38,0)"))
        .cast("double") / 1000000d).as("v2"))
    val j = fast.join(slow, "g")
      .select(abs(col("v") - col("v2")).as("d")).agg(max(col("d")))
      .head().getDouble(0)
    assert(j == 0.0)
  }

  test("quantize12 digit-split total equals the BigInt reference " +
      "(mixed signs, repartitioned)") {
    val xs = Seq(0.123456789012, -0.999999999999, 1.5e-12, -1.5e-12,
      3.999999, -2.718281828459, 0.0) ++
      (1 to 20000).map(i => math.cos(i.toDouble) * 4.0)
    val ref = xs.map(x => BigInt(math.floor(x * 1e12 + 0.5).toLong)).sum
    val df = xs.toDF("x").withColumn("g", lit(1))
    Seq(1, 7, 32).foreach { n =>
      val q = ExactSum.quantize12(col("x"))
      val out = df.repartition(n).groupBy(col("g"))
        .agg(ExactSum.aggsLong("s", q).head, ExactSum.aggsLong("s", q).tail: _*)
        .select(ExactSum.total("s").cast("string").as("t"))
        .head().getString(0)
      assert(BigInt(out) == ref, s"partitions=$n")
    }
  }

  test("oracle SQL mirror produces the same literal shape") {
    assert(ExactSum.oracleSumMicros("x * y") ==
      "sum(CAST(floor((x * y) * 1000000.0 + 0.5) AS BIGINT))")
    assert(ExactSum.oracleSumDouble("x").contains("/ 1000000.0"))
  }
}
