package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class TimeSeriesSpec extends SparkSpecBase {
  import spark.implicits._

  private def series(rows: (String, Long, Double, Long)*) =
    rows.toDF("k", "us", "v", "tie")
      .withColumn("ts", timestamp_micros(col("us")))

  private def run(df: org.apache.spark.sql.DataFrame, step: Long) =
    TimeSeries.resampleInterpolate(df, "k", "ts", "v", step, "tie")
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("grid_us"),
        r.getAs[Double]("value"))).sorted

  test("hand-computed lerp between two readings") {
    val out = run(series(("a", 5L, 10d, 0L), ("a", 15L, 20d, 1L)), step = 10L)
    // grid point 10 sits halfway: 10 + (20-10) * (10-5)/(15-5) = 15
    assert(out.toSeq == Seq(("a", 10L, 15.0)))
  }

  test("exact-hit grid points take the reading itself; interior points " +
      "interpolate against the nearest neighbors") {
    val out = run(series(("a", 0L, 1d, 0L), ("a", 10L, 5d, 1L),
      ("a", 40L, 11d, 2L)), step = 10L)
    // 20 and 30 interpolate on the 10->40 segment (slope 0.2)
    assert(out.toSeq == Seq(("a", 0L, 1.0), ("a", 10L, 5.0),
      ("a", 20L, 7.0), ("a", 30L, 9.0), ("a", 40L, 11.0)))
  }

  test("duplicate timestamps resolve to the tie-max reading") {
    val out = run(series(("a", 0L, 1d, 0L), ("a", 0L, 3d, 9L),
      ("a", 20L, 5d, 1L)), step = 10L)
    // at us=0 the tie-9 reading (3.0) wins; midpoint lerps 3->5
    assert(out.toSeq == Seq(("a", 0L, 3.0), ("a", 10L, 4.0), ("a", 20L, 5.0)))
  }

  test("no extrapolation: span narrower than a step yields nothing, " +
      "grid never leaves [min, max]") {
    val narrow = run(series(("a", 11L, 1d, 0L), ("a", 19L, 2d, 1L)), step = 10L)
    assert(narrow.isEmpty)
    val out = run(series(("b", 7L, 1d, 0L), ("b", 33L, 2d, 1L)), step = 10L)
    assert(out.map(_._2).toSeq == Seq(10L, 20L, 30L))
  }

  test("debounce: chained events collapse to the burst head; a gap " +
      "beyond quiet starts a new burst") {
    import spark.implicits._
    // key k: bursts {0, 50, 100} (chained, gaps = 50 <= 60),
    // then 200 (gap 100 > 60), then {500, 550}
    val df = Seq(0L, 50L, 100L, 200L, 500L, 550L)
      .zipWithIndex.map { case (us, i) => ("k", us, i.toLong) }
      .toDF("key", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.debounce(df, Seq("key"), "ts",
        quietMicros = 60L, tieCol = "event_id")
      .collect().map(r => (r.getAs[Long]("us"), r.getAs[Long]("burst_n")))
      .sorted
    assert(out.toSeq == Seq((0L, 3L), (200L, 1L), (500L, 2L)))
  }

  test("interEventStats: periodic user B = -1, known two-gap moments, short users dropped") {
    val events = Seq(
      // "tick": perfectly periodic, gaps (100, 100) -> std 0, B = -1
      ("tick", 0L), ("tick", 100L), ("tick", 200L),
      // "mix": gaps (100, 300) -> mean 200, sample std sqrt(20000)
      ("mix", 0L), ("mix", 100L), ("mix", 400L),
      // "two": a single gap -> dropped (sample std undefined)
      ("two", 0L), ("two", 50L))
      .toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeries.interEventStats(events, "user_id", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("two"))
    val tick = out("tick")
    assert(tick.getAs[Long]("n_gaps") == 2L)
    assert(tick.getAs[Double]("mean_gap_us") == 100.0)
    assert(tick.getAs[Double]("std_gap_us") == 0.0)
    assert(tick.getAs[Double]("cv") == 0.0)
    assert(tick.getAs[Double]("burstiness") == -1.0)
    val mix = out("mix")
    assert(mix.getAs[Double]("mean_gap_us") == 200.0)
    // var = (100-200)^2 + (300-200)^2 over n-1=1 -> 20000
    assert(mix.getAs[Double]("std_gap_us") == math.sqrt(20000.0))
    val sd = math.sqrt(20000.0)
    assert(math.abs(mix.getAs[Double]("burstiness") -
      (sd - 200.0) / (sd + 200.0)) < 1e-6)
    assert(math.abs(mix.getAs[Double]("cv") - sd / 200.0) < 1e-6)
  }

  test("mannKendall: hand-computed S, tie correction, z sign") {
    import spark.implicits._
    // "up": strictly increasing 5-point series -> S = 10 (all pairs +1),
    //   var = 5*4*15/18 = 50/3, z = 9/sqrt(50/3)
    // "tied": values (1,1,2) -> S = sign(0)+sign(1)+sign(1) = 2,
    //   var = (3*2*11 - 2*1*9)/18 = 48/18, z = 1/sqrt(48/18)
    // "flat": constant -> var 0 -> dropped
    val df = ((1 to 5).map(i => ("up", i.toLong, i.toDouble)) ++
      Seq(("tied", 1L, 1.0), ("tied", 2L, 1.0), ("tied", 3L, 2.0)) ++
      Seq(("flat", 1L, 7.0), ("flat", 2L, 7.0)))
      .toDF("k", "t", "v")
    val out = TimeSeries.mannKendall(df, Seq("k"), "t", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("flat"))
    val up = out("up")
    assert(up.getAs[Long]("s_stat") == 10L)
    assert(up.getAs[Double]("var_s") == 50.0 / 3)
    assert(math.abs(up.getAs[Double]("z") - 9.0 / math.sqrt(50.0 / 3)) < 1e-6)
    val tied = out("tied")
    assert(tied.getAs[Long]("s_stat") == 2L)
    assert(tied.getAs[Double]("var_s") == 48.0 / 18)
    assert(math.abs(tied.getAs[Double]("z") -
      1.0 / math.sqrt(48.0 / 18)) < 1e-6)
  }

  test("theilSen: robust to an outlier OLS would chase; exact lower median") {
    import spark.implicits._
    // y = 2t except one wild outlier at t=5: slopes stay clustered at 2
    val clean = Seq(1L -> 2.0, 2L -> 4.0, 3L -> 6.0, 4L -> 8.0, 5L -> 100.0)
    val df = clean.map { case (t, v) => ("s", t, v) }.toDF("k", "t", "v")
    val row = TimeSeries.theilSen(df, Seq("k"), "t", "v").head()
    assert(row.getAs[Long]("n_pairs") == 10L)
    // 6 of 10 pairwise slopes are exactly 2.0; lower median (rank 5) = 2
    assert(row.getAs[Double]("slope") == 2.0)
  }

  test("dispersionCheck: hand-computed span-aware dispersion, zero " +
    "fractions; constant rate underdisperses; single-day groups drop") {
    import spark.implicits._
    val df = (Seq(("bursty", 0L, 2L), ("bursty", 1L, 4L), ("bursty", 3L, 6L)) ++
      (0L to 3L).map(d => ("flat", d, 5L)) ++
      Seq(("oneday", 9L, 3L))).toDF("k", "t", "v")
    val out = TimeSeries.dispersionCheck(df, Seq("k"), "t", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("oneday"))
    val b = out("bursty")
    assert(b.getAs[Long]("span_days") == 4L)
    assert(b.getAs[Long]("n_active_days") == 3L)
    assert(b.getAs[Double]("mean_per_day") == 3.0)
    // var = (56 − 4·9)/3 = 20/3; dispersion = 20/9
    assert(b.getAs[Double]("dispersion") ==
      math.rint(20.0 / 9.0 * 1e6) / 1e6)
    assert(b.getAs[Double]("zero_frac_obs") == 0.25)
    assert(b.getAs[Double]("zero_frac_poisson") ==
      math.rint(math.exp(-3.0) * 1e6) / 1e6)
    assert(out("flat").getAs[Double]("dispersion") == 0.0)
  }

  test("seasonalNaiveEval: perfect weekly pattern scores MASE 0 with " +
    "hand-computed naive MAE") {
    import spark.implicits._
    val df = (0L to 13L).map(d => ("a", d, d % 7)).toDF("k", "t", "v")
    val row = TimeSeries.seasonalNaiveEval(df, Seq("k"), "t", "v").head()
    assert(row.getAs[Long]("n_eval") == 7L)
    assert(row.getAs[Double]("mae_seasonal") == 0.0)
    // |d%7 − (d−1)%7| = 1 except the wrap at d=7 (|0−6| = 6): 12/7
    assert(row.getAs[Double]("mae_naive1") ==
      math.rint(12.0 / 7.0 * 1e6) / 1e6)
    assert(row.getAs[Double]("mase") == 0.0)
  }

  test("seasonalNaiveEval: calendar gaps exclude misaligned days (true " +
    "offsets, not row lags)") {
    import spark.implicits._
    val df = (0L to 13L).filter(_ != 9L).map(d => ("a", d, d % 7))
      .toDF("k", "t", "v")
    val row = TimeSeries.seasonalNaiveEval(df, Seq("k"), "t", "v").head()
    // day 9 has no value; day 10 loses its d−1 reference — both out
    assert(row.getAs[Long]("n_eval") == 5L)
    assert(row.getAs[Double]("mae_seasonal") == 0.0)
  }

  test("seasonalNaiveEval: constant series yields null MASE (0/0), " +
    "groups stay independent") {
    import spark.implicits._
    val df = ((0L to 13L).map(d => ("flat", d, 5L)) ++
      (0L to 13L).map(d => ("var", d, d % 3))).toDF("k", "t", "v")
    val out = TimeSeries.seasonalNaiveEval(df, Seq("k"), "t", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").isNullAt(out("flat").fieldIndex("mase")))
    assert(out("flat").getAs[Double]("mae_seasonal") == 0.0)
    // period-3 signal vs weekly seasonal lag: 14 % LCM misaligns → mase > 0
    assert(out("var").getAs[Double]("mase") > 0.0)
  }
}
