package graft.operators

import graft.SparkSpecBase

class DriftSpec extends SparkSpecBase {

  import spark.implicits._

  test("ksTest: hand-computed two-sample statistic (scipy ks_2samp parity)") {
    // a = [1, 2, 3], b = [2.5, 4]: ECDFs diverge most on (2, 2.5) where
    // F_a = 2/3 and F_b = 0 -> D = 2/3 (scipy.stats.ks_2samp agrees)
    val df = (Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
      (2.5, "b"), (4.0, "b")).zipWithIndex)
      .map { case ((v, t), i) => ("g", t, v, i.toLong) }
      .toDF("g", "tag", "v", "id")
    val r = Drift.ksTest(df, "v", "tag", Seq("g")).head()
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("ks_stat") == 0.666667)
    TrackedCaches.release()
  }

  test("ksTest: identical samples have zero drift, disjoint ones have D = 1") {
    val same = Seq(1.0, 2.0, 3.0)
    val df = (same.map(("g1", "a", _)) ++ same.map(("g1", "b", _)) ++
      Seq(1.0, 2.0).map(("g2", "a", _)) ++ Seq(10.0, 11.0).map(("g2", "b", _)))
      .zipWithIndex.map { case ((g, t, v), i) => (g, t, v, i.toLong) }
      .toDF("g", "tag", "v", "id")
    val out = Drift.ksTest(df, "v", "tag", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ks_stat")).toMap
    assert(out("g1") == 0.0)
    assert(out("g2") == 1.0)
    TrackedCaches.release()
  }

  test("mannWhitney: hand-computed U and z without ties (scipy parity)") {
    // a = [1,2,3], b = [2.5,4]: ranks 1,2,4 for a -> R_a=7, U = 7-6 = 1
    // varU = 3*2/12 * 6 = 3; z = (1-3)/sqrt(3) = -1.154701
    val df = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "b", 2.5), ("g", "b", 4.0))
      .zipWithIndex.map { case ((g, t, v), i) => (g, t, v, i.toLong) }
      .toDF("g", "tag", "v", "id")
    val r = Drift.mannWhitney(df, "v", "tag", Seq("g")).head()
    assert(r.getAs[String]("tag_a") == "a" && r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Double]("u_stat") == 1.0)
    assert(r.getAs[Double]("z") == -1.154701)
    TrackedCaches.release()
  }

  test("mannWhitney: cross-sample ties take midranks with tie-corrected z") {
    // a = [1,2], b = [2,3]: midrank(2) = 2.5 -> R_a = 3.5, U = 0.5
    // tie3 = 6; varU = (4/12)*((5) - 6/12) = 1.5; z = -1.5/sqrt(1.5)
    val df = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "b", 2.0),
      ("g", "b", 3.0))
      .zipWithIndex.map { case ((g, t, v), i) => (g, t, v, i.toLong) }
      .toDF("g", "tag", "v", "id")
    val r = Drift.mannWhitney(df, "v", "tag", Seq("g")).head()
    assert(r.getAs[Double]("u_stat") == 0.5)
    assert(r.getAs[Double]("z") == -1.224745)
    TrackedCaches.release()
  }

  test("mannWhitney: groups with more or fewer than two tags are dropped") {
    val df = Seq(("g3", "a", 1.0), ("g3", "b", 2.0), ("g3", "c", 3.0),
      ("g1", "a", 1.0), ("ok", "a", 1.0), ("ok", "b", 2.0))
      .zipWithIndex.map { case ((g, t, v), i) => (g, t, v, i.toLong) }
      .toDF("g", "tag", "v", "id")
    val out = Drift.mannWhitney(df, "v", "tag", Seq("g"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("ok"))
    TrackedCaches.release()
  }

  test("auc: perfect, inverted, chance, and tied separability") {
    def frame(pos: Seq[Double], neg: Seq[Double], g: String) =
      pos.map((g, true, _)) ++ neg.map((g, false, _))
    val df = (frame(Seq(3.0, 4.0), Seq(1.0, 2.0), "perfect") ++
      frame(Seq(1.0, 2.0), Seq(3.0, 4.0), "inverted") ++
      frame(Seq(1.0, 3.0), Seq(2.0), "half") ++
      frame(Seq(2.0), Seq(2.0), "tied"))
      .toDF("g", "label", "score")
    val out = Drift.auc(df, "score", "label", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("auc")).toMap
    assert(out == Map("perfect" -> 1.0, "inverted" -> 0.0,
      "half" -> 0.5, "tied" -> 0.5))
    TrackedCaches.release()
  }

  test("auc: labels that do not cast to boolean are dropped, not counted negative") {
    val df = Seq(("g", "true", 5.0, 1L), ("g", "false", 1.0, 2L),
      ("g", "unknown", 9.0, 3L))
      .toDF("g", "label", "score", "id")
    val r = Drift.auc(df, "score", "label", Seq("g")).head()
    // only the castable pair survives: pos=5.0 beats neg=1.0 -> AUC 1
    assert(r.getAs[Long]("n_pos") == 1L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Double]("auc") == 1.0)
    TrackedCaches.release()
  }

  test("ksTest: groups with three tags are dropped (strict two-sample " +
      "contract, like mannWhitney)") {
    val df = Seq(
      // three tags in g3 -> dropped, not max-vs-pooled-rest
      ("g3", "a", 1.0), ("g3", "b", 2.0), ("g3", "c", 3.0),
      // two tags in g2 -> kept (disjoint samples, D = 1)
      ("g2", "a", 1.0), ("g2", "b", 2.0))
      .zipWithIndex.map { case ((g, t, v), i) => (g, t, v, i.toLong) }
      .toDF("g", "tag", "v", "id")
    val out = Drift.ksTest(df, "v", "tag", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ks_stat")).toMap
    assert(out == Map("g2" -> 1.0))
    TrackedCaches.release()
  }

  test("calibration: perfect predictions pin frac_pos to the score; " +
      "s = 1.0 lands in the top bin; out-of-range scores are dropped") {
    val df = Seq(("g", 1.0, true), ("g", 1.0, true), ("g", 0.0, false),
      ("g", 0.12, false), ("g", 1.5, true), ("g", -0.1, false))
      .toDF("g", "score", "label")
    val out = Drift.calibration(df, "score", "label", Seq("g"))
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getAs[Double]("mean_score"), r.getAs[Double]("frac_pos")))
      .toMap
    // 1.5 and -0.1 dropped; 1.0s in bin 9 (not a phantom bin 10)
    assert(out == Map(9L -> ((2L, 1.0, 1.0)), 0L -> ((1L, 0.0, 0.0)),
      1L -> ((1L, 0.12, 0.0))))
    TrackedCaches.release()
  }

  test("brierScore: perfect = 0, always-0.5 = 0.25, hand-computed mix") {
    val perfect = Seq(("g", 1.0, true), ("g", 0.0, false)).toDF("g", "s", "y")
    assert(Drift.brierScore(perfect, "s", "y", Seq("g"))
      .head().getAs[Double]("brier") == 0.0)
    val half = Seq(("g", 0.5, true), ("g", 0.5, false)).toDF("g", "s", "y")
    assert(Drift.brierScore(half, "s", "y", Seq("g"))
      .head().getAs[Double]("brier") == 0.25)
    // (0.8-1)² + (0.3-0)² = 0.04 + 0.09 -> mean 0.065
    val mix = Seq(("g", 0.8, true), ("g", 0.3, false)).toDF("g", "s", "y")
    assert(Drift.brierScore(mix, "s", "y", Seq("g"))
      .head().getAs[Double]("brier") == 0.065)
    TrackedCaches.release()
  }

  test("psi: identical samples give exactly zero; a shift gives a " +
      "positive index; groups lacking either sample are dropped") {
    val vals = (1 to 200).map(_.toDouble)
    val same = (vals.map(v => ("g", "ref", v)) ++ vals.map(v => ("g", "cmp", v)))
      .toDF("g", "tag", "v")
    val zero = Drift.psi(same, "v", "tag", "ref", "cmp", Seq("g"))
      .head().getAs[Double]("psi")
    // pr == pc in every bin -> every term is (0) * ln(1) = 0 exactly
    assert(zero == 0.0)
    val shifted = (vals.map(v => ("g", "ref", v)) ++
      vals.map(v => ("g", "cmp", v + 100.0)) ++
      // cmp-only group: no reference sample -> no edges -> dropped
      vals.map(v => ("lonely", "cmp", v))).toDF("g", "tag", "v")
    val out = Drift.psi(shifted, "v", "tag", "ref", "cmp", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(out.keySet == Set("g"))
    assert(out("g") > 0.25, s"a 50% shift should cross the 0.25 alarm, got ${out("g")}")
    TrackedCaches.release()
  }

  test("psi: unoccupied comparison bins contribute finite smoothing " +
      "terms, never NaN/Inf") {
    // cmp mass entirely in the top half: bottom bins empty on the cmp side
    val df = ((1 to 100).map(v => ("g", "ref", v.toDouble)) ++
      (1 to 100).map(v => ("g", "cmp", 50.0 + v / 2.0))).toDF("g", "tag", "v")
    val r = Drift.psi(df, "v", "tag", "ref", "cmp", Seq("g"), k = 4).head()
    assert(!r.isNullAt(r.fieldIndex("psi")))
    assert(!r.getAs[Double]("psi").isNaN && !r.getAs[Double]("psi").isInfinite)
    assert(r.getAs[Long]("n_ref") == 100L && r.getAs[Long]("n_cmp") == 100L)
    TrackedCaches.release()
  }

  test("ksTest: groups missing one sample are dropped; ties across samples handled") {
    val df = Seq(
      ("only_a", "a", 1.0), ("only_a", "a", 2.0),
      // g: a = [1, 2], b = [2, 3] -> D at x in (1,2): |1/2 - 0| = 0.5;
      // at tie x=2: F_a=1, F_b(2)=1/2 -> 0.5; at 3: |1-1|=0 -> D=0.5
      ("g", "a", 1.0), ("g", "a", 2.0), ("g", "b", 2.0), ("g", "b", 3.0))
      .zipWithIndex.map { case ((g, t, v), i) => (g, t, v, i.toLong) }
      .toDF("g", "tag", "v", "id")
    val out = Drift.ksTest(df, "v", "tag", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ks_stat")).toMap
    assert(out == Map("g" -> 0.5))
    TrackedCaches.release()
  }

  test("seasonalAnomalies: a spiked hour flags against its cross-day " +
      "baseline; steady hours stay quiet") {
    // hour 3 of days 0..9: 5 events/day, except day 7 carries 15 (spike);
    // hour 5: exactly 4 every day (std 0 -> never flagged)
    val rows = (for {
      day <- 0 until 10
      i <- 0 until (if (day == 7) 15 else 5)
    } yield (day.toLong * 86400000000L + 3L * 3600000000L + i)) ++
      (for { day <- 0 until 10; i <- 0 until 4 }
        yield (day.toLong * 86400000000L + 5L * 3600000000L + i))
    import spark.implicits._
    val df = rows.toDF("us")
      .selectExpr("timestamp_micros(us) AS ts")
    val out = Drift.seasonalAnomalies(df, "ts", threshold = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("z"))
      .toMap
    // mean 6, std sqrt((10*36+... ) hand check: counts 5x9 + 15 -> mean 6,
    // sample var = (9*1 + 81)/9 = 10 -> z = (15-6)/sqrt(10) = 2.846...
    assert(out.keySet == Set((7L, 3L)))
    assert(math.abs(out((7L, 3L)) - 2.846050) < 1e-6)
  }

  test("cusum: hand-computed step change — statistic 20/(5·√8) at the " +
      "last pre-jump timestamp; constant groups dropped") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 4).map(i => ("g", i.toLong * 100L, 0d)) ++
      (5 to 8).map(i => ("g", i.toLong * 100L, 10d)) ++
      (1 to 4).map(i => ("flat", i.toLong * 100L, 7d))
    val df = rows.toDF("grp", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Drift.cusum(df, "v", "ts", Seq("grp")).collect()
      .map(r => r.getString(0) -> r).toMap
    // μ = 5, σ_pop = 5, N = 8: |S_4| = 20 → C = 20/(5√8) = 1.414214,
    // attained at the 4th point (us = 400)
    assert(out.keySet == Set("g"))
    assert(out("g").getAs[Long]("n") == 8L)
    assert(out("g").getAs[Double]("cusum_stat") == 1.414214)
    assert(out("g").getAs[Long]("change_us") == 400L)
  }

  test("cusum: rows sharing a timestamp enter the process together") {
    import org.apache.spark.sql.functions._
    // the two 10s at us=500 arrive as ONE step: the pre-jump max at 400
    // is unchanged, and no intermediate point between them exists
    val rows = Seq(("g", 100L, 0d), ("g", 200L, 0d), ("g", 300L, 0d),
      ("g", 400L, 0d), ("g", 500L, 10d), ("g", 500L, 10d),
      ("g", 600L, 10d), ("g", 700L, 10d))
    val df = rows.toDF("grp", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = Drift.cusum(df, "v", "ts", Seq("grp")).collect()(0)
    assert(r.getAs[Double]("cusum_stat") == 1.414214)
    assert(r.getAs[Long]("change_us") == 400L)
  }

  test("ece: hand-computed two-bin miscalibration") {
    import spark.implicits._
    // bin 1: mean 0.1, frac_pos 0.25 → |gap| 0.15, weight 4/8
    // bin 9: mean 0.9, frac_pos 0.75 → |gap| 0.15, weight 4/8 → ECE 0.15
    val df = (Seq.fill(1)(("a", 0.1, true)) ++ Seq.fill(3)(("a", 0.1, false)) ++
      Seq.fill(3)(("a", 0.9, true)) ++ Seq.fill(1)(("a", 0.9, false)))
      .toDF("g", "score", "label")
    val r = Drift.ece(df, "score", "label", Seq("g")).head()
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Double]("ece") == 0.15)
  }

  test("bestThreshold: hand-computed Youden optimum, ties to smallest " +
    "threshold, pos-vs-rest lumping, missing-class drop") {
    import spark.implicits._
    val df = (Seq((5.0, "pos"), (6.0, "pos"), (7.0, "pos"),
      (1.0, "neg"), (2.0, "neg"), (6.0, "neg")).map(t => ("g", t._1, t._2)) ++
      Seq(("empty", 3.0, "pos"))) // no negatives → dropped
      .toDF("grp", "score", "tag")
    val out = Drift.bestThreshold(df, "score", "tag", "pos", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("empty"))
    val g = out("g")
    // J at t=2: cumNeg 2/3 − cumPos 0/3 = 2/3; rule "score > 2" gives
    // TPR 1, FPR 1/3
    assert(g.getAs[Double]("threshold") == 2.0)
    assert(g.getAs[Double]("youden_j") == 0.666667)
    assert(g.getAs[Double]("tpr") == 1.0)
    assert(g.getAs[Double]("fpr") == 0.333333)
    assert(g.getAs[Long]("n_pos") == 3L && g.getAs[Long]("n_neg") == 3L)
    // a third tag lumps into the negatives
    val lump = Drift.bestThreshold(
      df.union(Seq(("g", 1.5, "other")).toDF("grp", "score", "tag")),
      "score", "tag", "pos", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(lump("g").getAs[Long]("n_neg") == 4L)
    TrackedCaches.release()
  }
}
