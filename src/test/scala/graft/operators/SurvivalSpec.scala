package graft.operators

import graft.SparkSpecBase

class SurvivalSpec extends SparkSpecBase {

  import spark.implicits._

  test("kaplanMeier: textbook product-limit curve with censoring, a " +
      "censor-only step, and the absorbing zero at full death") {
    // t=1 event; t=2 event+censor; t=3 event; t=4 censor; t=5 event
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, true),
      (4L, false), (5L, true))
      .map { case (t, e) => ("g", t, e) }.toDF("g", "t", "ev")
    val out = Survival.kaplanMeier(df, "t", "ev", Seq("g"))
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getAs[Double]("survival")))
      .toMap
    // S(1)=5/6; S(2)=5/6*4/5=2/3; S(3)=2/3*2/3=4/9; S(4) unchanged
    // (censor only); S(5)=0 (the last at-risk subject dies)
    assert(out(1L) == ((6L, 1L, 0L, 0.833333)))
    assert(out(2L) == ((5L, 1L, 1L, 0.666667)))
    assert(out(3L) == ((3L, 1L, 0L, 0.444444)))
    assert(out(4L) == ((2L, 0L, 1L, 0.444444)))
    assert(out(5L) == ((1L, 1L, 0L, 0.0)))
  }

  test("logRank: hand-computed two-sample statistic") {
    // A: [1e, 2e]; B: [2e, 3e]
    // t=1: O-E = 1/2, V = 1/4; t=2: O-E = 1/3, V = 2/9; t=3: r=1 -> V=0
    // chi2 = (5/6)^2 / (17/36) = 25/17 = 1.470588; z = 5/sqrt(17)
    val df = Seq(("a", 1L, true), ("a", 2L, true),
      ("b", 2L, true), ("b", 3L, true))
      .map { case (tg, t, e) => ("g", tg, t, e) }.toDF("g", "tag", "t", "ev")
    val r = Survival.logRank(df, "t", "ev", "tag", "a", "b", Seq("g")).head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("chi2") == 1.470588)
    assert(r.getAs[Double]("z") == 1.212678)
  }

  test("logRank: identical samples give zero; one-sided groups dropped") {
    val same = Seq(("g", "a", 1L, true), ("g", "a", 2L, false),
      ("g", "b", 1L, true), ("g", "b", 2L, false),
      ("only_a", "a", 1L, true)).toDF("g", "tag", "t", "ev")
    val out = Survival.logRank(same, "t", "ev", "tag", "a", "b", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("chi2")).toMap
    assert(out == Map("g" -> 0.0))
  }

  test("kaplanMeier: all-censored group stays at survival 1; groups are " +
      "independent; null/uncastable rows dropped") {
    val df = Seq(("alive", 1L, false), ("alive", 2L, false),
      ("dying", 1L, true), ("dying", 2L, true))
      .toDF("g", "t", "ev")
      .union(Seq(("alive", null.asInstanceOf[java.lang.Long], false))
        .toDF("g", "t", "ev"))
    val out = Survival.kaplanMeier(df, "t", "ev", Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Double]("survival")).toMap
    assert(out(("alive", 1L)) == 1.0 && out(("alive", 2L)) == 1.0)
    assert(out(("dying", 1L)) == 0.5 && out(("dying", 2L)) == 0.0)
  }
}
