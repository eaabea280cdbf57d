package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Behavioral contract of [[StreamingQuantiles.quantilesPerWindow]]:
  * the GK sketch aggregates inside the watermarked streaming plan, a
  * window matching the reference distribution shows ~zero shift, a
  * shifted window's median moves by the injected offset, and every
  * estimate obeys the rank-error law against the window's own values.
  */
class StreamingQuantilesSpec extends SparkSpecBase {

  private case class Ev(x: Double, ts: Timestamp)
  private def ts(min: Long) = new Timestamp((min + 100) * 60000L)

  private def rankOk(est: Double, p: Double, eps: Double,
                     values: Seq[Double]): Boolean = {
    val n = values.size
    val rank = values.count(_ <= est)
    math.abs(rank - p * n) <= eps * n + 1
  }

  test("windows sketch, probe, and compare against the static reference") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference: 0..999 uniformly — median 499-ish, p90 899-ish
    val ref = (0 until 1000).map(_.toDouble).toDF("x")
    val input = MemoryStream[Ev]
    val out = StreamingQuantiles.quantilesPerWindow(input.toDF(), ref, "x",
      windowLength = "10 minutes", probes = Seq(0.5, 0.9),
      watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory")
      .queryName("sq_out").outputMode("append").start()
    try {
      // window 1 (minutes 0-10): the same distribution, permuted
      val w1 = (0 until 1000).map(i => (i * 2654435761L % 1000).toDouble)
      input.addData(w1.zipWithIndex.map { case (v, i) =>
        Ev(v, ts(i % 9)) }: _*)
      // window 2 (minutes 10-20): everything shifted +500
      val w2 = w1.map(_ + 500.0)
      input.addData(w2.zipWithIndex.map { case (v, i) =>
        Ev(v, ts(10 + i % 9)) }: _*)
      // closing batch: advance the watermark past both windows
      input.addData(Ev(0.0, ts(120)))
      query.processAllAvailable()
      val rows = spark.table("sq_out").collect().map { r =>
        (r.getAs[Timestamp]("window_start").getTime / 60000L - 100,
          r.getAs[Double]("q")) ->
          (r.getAs[Long]("n"), r.getAs[Double]("value"),
            r.getAs[Double]("shift"))
      }.toMap
      assert(rows.size == 4, s"expected 2 windows x 2 probes: $rows")
      assert(rows((0L, 0.5))._1 == 1000L)
      // window 1 ≈ reference: shifts bounded by twice the rank error
      // translated to value space (uniform 0..999 → ~1 value per rank,
      // eps=0.01 → ≤ ~10+slack per side)
      assert(rows((0L, 0.5))._3 <= 25.0, s"on-mix median moved: $rows")
      assert(rows((0L, 0.9))._3 <= 25.0, s"on-mix p90 moved: $rows")
      // window 2: the +500 shift comes through at both probes
      assert(math.abs(rows((10L, 0.5))._3 - 500.0) <= 25.0, s"$rows")
      assert(math.abs(rows((10L, 0.9))._3 - 500.0) <= 25.0, s"$rows")
      // rank-error law against each window's own values
      Seq(0.5, 0.9).foreach { p =>
        assert(rankOk(rows((0L, p))._2, p, 0.01, w1))
        assert(rankOk(rows((10L, p))._2, p, 0.01, w2))
      }
    } finally query.stop()
  }
}
