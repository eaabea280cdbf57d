package graft.streaming

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Behavioral contract of [[StreamingDrift.windowedPsi]]: an on-mix
  * window scores ~0, a shifted window fires, a brand-new category
  * fires hard, and the score matches a hand-computed local replay of
  * the identical smoothing/fold arithmetic.
  */
class StreamingDriftSpec extends SparkSpecBase {

  private case class Ev(cat: String, ts: Timestamp)
  private def ts(min: Long) = new Timestamp((min + 100) * 60000L)

  /** Local replay of the per-window PSI tree (smooth = 1e-6). */
  private def psiLocal(win: Seq[(String, Long)],
                       ref: Map[String, Double]): Double = {
    val n = win.map(_._2).sum.toDouble
    val terms = win.map { case (c, cnt) =>
      val cur = cnt / n + 1e-6
      val r = ref.getOrElse(c, 0.0) + 1e-6
      BigDecimal((cur - r) * math.log(cur / r))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    math.rint(terms.sum.toDouble * 1e6) / 1e6
  }

  test("windowedPsi: on-mix window ~0, shifted window fires, new " +
    "category fires hard; scores equal the local replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference: a/b at 50/50
    val ref = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("cat")
    val input = MemoryStream[Ev]
    val out = StreamingDrift.windowedPsi(input.toDF(), ref, "cat",
      windowLength = "10 minutes", watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory")
      .queryName("psi_out").outputMode("append").start()
    try {
      // window 1 (minutes 0-10): the reference mix
      input.addData((1 to 10).map(i =>
        Ev(if (i % 2 == 0) "a" else "b", ts(i % 9))): _*)
      // window 2 (minutes 10-20): 80/20 shift
      input.addData((1 to 10).map(i =>
        Ev(if (i <= 8) "a" else "b", ts(10 + i % 9))): _*)
      // window 3 (minutes 20-30): a NEW category floods in
      input.addData((1 to 10).map(i =>
        Ev(if (i <= 5) "zz" else "a", ts(20 + i % 9))): _*)
      // closing batch: advance the watermark past every window
      input.addData(Ev("a", ts(120)))
      query.processAllAvailable()
      val rows = spark.table("psi_out").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime / 60000L - 100 ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("psi"))).toMap
      val refMap = Map("a" -> 0.5, "b" -> 0.5)
      assert(rows(0L)._1 == 10L)
      assert(rows(0L)._2 ==
        psiLocal(Seq("a" -> 5L, "b" -> 5L), refMap))
      assert(rows(0L)._2 < 0.001) // on-mix: essentially zero
      assert(rows(10L)._2 ==
        psiLocal(Seq("a" -> 8L, "b" -> 2L), refMap))
      assert(rows(10L)._2 > 0.1) // real shift fires
      assert(rows(20L)._2 ==
        psiLocal(Seq("zz" -> 5L, "a" -> 5L), refMap))
      assert(rows(20L)._2 > rows(10L)._2) // novel category fires hardest
    } finally query.stop()
  }

  test("topTermsPerWindow: per-window heaviest terms, deterministic " +
    "ties, watermark-closed windows only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingDrift.topTermsPerWindow(input.toDF(), "cat",
      windowLength = "10 minutes", k = 2, watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory")
      .queryName("tt_out").outputMode("append").start()
    try {
      // window 1: a×3, b×2, c×1; window 2: c×2, a×1 (b/c tie broken by term)
      input.addData(
        Seq.fill(3)(Ev("a", ts(1))) ++ Seq.fill(2)(Ev("b", ts(2))) ++
          Seq(Ev("c", ts(3))) ++
          Seq.fill(2)(Ev("c", ts(12))) ++ Seq(Ev("a", ts(13))): _*)
      input.addData(Ev("z", ts(120))) // close both windows
      query.processAllAvailable()
      val rows = spark.table("tt_out").collect()
        .map { r =>
          val tops = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top_terms")
            .map(t => (t.getAs[String]("term"), t.getAs[Long]("n"))).toList
          r.getAs[Long]("n_events") -> tops
        }.toMap
      assert(rows(6L) == List(("a", 3L), ("b", 2L)))
      assert(rows(3L) == List(("c", 2L), ("a", 1L)))
    } finally query.stop()
  }

  test("referenceProfile: exact fractions, null categories dropped") {
    import spark.implicits._
    val ref = Seq("x", "x", "x", "y", null).toDF("cat")
    val out = StreamingDrift.referenceProfile(ref, "cat")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("x" -> 0.75, "y" -> 0.25))
  }
}
