package graft.operators

import graft.SparkSpecBase

class StatsSpec extends SparkSpecBase {

  import spark.implicits._

  test("chiSquare: hand-computed 2x2 with Cramer's V") {
    // o = [[10, 20], [20, 10]]: margins all 30, N=60, every e=15 ->
    // chi2 = 4 * 25/15 = 20/3. Each term is decimal-quantized to 6 dp
    // BEFORE the order-independent sum (the engine-portability rule), so
    // the result is 4 x 1.666667 = 6.666668, not round(20/3, 6)
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = Stats.chiSquare(rows.toDF("f1", "f2"), "f1", "f2").head()
    assert(r.getAs[Long]("n") == 60L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 6.666668)
    assert(r.getAs[Double]("cramers_v") == 0.333333)
  }

  test("chiSquare: independent columns score ~zero") {
    // perfectly proportional table -> chi2 exactly 0
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val r = Stats.chiSquare(rows.toDF("f1", "f2"), "f1", "f2").head()
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
  }

  test("mutualInformation: perfect dependence gives MI = ln 2 and NMI = 1") {
    val rows = Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y"))
    val r = Stats.mutualInformation(rows.toDF("f1", "f2"), "f1", "f2").head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("mi") == 0.693147) // ln 2
    assert(r.getAs[Double]("h_a") == 0.693147)
    assert(r.getAs[Double]("nmi") == 1.0)
  }

  test("mutualInformation: independent columns carry zero information") {
    val rows = for (a <- Seq("a", "b"); b <- Seq("x", "y", "z"); _ <- 1 to 4)
      yield (a, b)
    val r = Stats.mutualInformation(rows.toDF("f1", "f2"), "f1", "f2").head()
    assert(r.getAs[Double]("mi") == 0.0)
    // single-valued column: H = 0 -> NMI undefined (null)
    val single = Seq(("k", "x"), ("k", "y")).toDF("f1", "f2")
    val r2 = Stats.mutualInformation(single, "f1", "f2").head()
    assert(r2.getAs[Double]("h_a") == 0.0)
    assert(r2.get(r2.fieldIndex("nmi")) == null)
  }

  test("mutualInformation: empty input yields zero rows, not a null row") {
    val empty = Seq.empty[(String, String)].toDF("f1", "f2")
    assert(Stats.mutualInformation(empty, "f1", "f2").isEmpty)
  }

  test("welchTTest: hand-computed two-sample statistics (scipy parity)") {
    // a = [1,2,3] (m=2, v=1), b = [2,4,6] (m=4, v=4):
    //   t = -2 / sqrt(1/3 + 4/3) = -1.549193
    //   dof = (5/3)^2 / ((1/9)/2 + (16/9)/2) = 50/17 = 2.941176
    val df = (Seq(1.0, 2.0, 3.0).map(("g", "a", _)) ++
      Seq(2.0, 4.0, 6.0).map(("g", "b", _))).toDF("g", "tag", "v")
    val r = Stats.welchTTest(df, "v", "tag", Seq("g")).head()
    assert(r.getAs[String]("tag_a") == "a" && r.getAs[String]("tag_b") == "b")
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("t_stat") == -1.549193)
    assert(r.getAs[Double]("dof") == 2.941176)
  }

  test("welchTTest: singleton samples are dropped (variance undefined)") {
    val df = Seq(("g", "a", 1.0), ("g", "b", 2.0), ("g", "b", 3.0))
      .toDF("g", "tag", "v")
    assert(Stats.welchTTest(df, "v", "tag", Seq("g")).isEmpty)
  }

  test("welchTTest: groups with three surviving samples are dropped, not truncated") {
    val df = (Seq(1.0, 2.0).map(("g", "a", _)) ++
      Seq(2.0, 4.0).map(("g", "b", _)) ++ Seq(3.0, 6.0).map(("g", "c", _)))
      .toDF("g", "tag", "v")
    assert(Stats.welchTTest(df, "v", "tag", Seq("g")).isEmpty)
  }

  test("jsDivergence: identical distributions give zero, disjoint give " +
      "ln 2, and one-sided categories stay finite (no smoothing needed)") {
    def js(rows: Seq[(String, String, String)]): Double =
      Stats.jsDivergence(rows.toDF("g", "tag", "v"), "v", "tag",
        "ref", "cmp", Seq("g")).head().getAs[Double]("js")
    val same = Seq("a", "a", "b").flatMap(v =>
      Seq(("g", "ref", v), ("g", "cmp", v)))
    assert(js(same) == 0.0)
    val disjoint = Seq(("g", "ref", "a"), ("g", "cmp", "b"))
    assert(js(disjoint) == 0.693147) // ln 2, the JS maximum
    // ref = {a, b}, cmp = {a}: p=(1/2,1/2), q=(1,0), m=(3/4,1/4)
    // JS = 1/2*(1/2 ln(2/3) + 1/2 ln 2) + 1/2*(1 ln(4/3)) = 0.215762
    val oneSided = Seq(("g", "ref", "a"), ("g", "ref", "b"), ("g", "cmp", "a"))
    assert(js(oneSided) == 0.215762)
  }

  test("jsDivergence: groups lacking either sample are dropped; other " +
      "tags are ignored") {
    val df = Seq(("g", "ref", "a"), ("g", "cmp", "a"), ("g", "other", "zzz"),
      ("refonly", "ref", "a")).toDF("g", "tag", "v")
    val out = Stats.jsDivergence(df, "v", "tag", "ref", "cmp", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("js")).toMap
    assert(out == Map("g" -> 0.0))
  }

  test("cohenKappa: textbook 2x2 agreement (po 0.7, pe 0.5, kappa 0.4)") {
    import spark.implicits._
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(10)(("yes", "no")) ++ Seq.fill(5)(("no", "yes"))
    val out = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(out.getLong(0) == 50L)
    assert(out.getDouble(1) == 0.7)
    // pe = (30*25 + 20*25) / 2500 = 0.5
    assert(out.getDouble(2) == 0.5)
    assert(out.getDouble(3) == 0.4)
  }

  test("cohenKappa: single shared label saturates chance -> kappa null; " +
      "null labels dropped") {
    import spark.implicits._
    val df = Seq(("s", "s"), ("s", "s"), ("s", null.asInstanceOf[String]))
      .toDF("a", "b")
    val out = Stats.cohenKappa(df, "a", "b").collect()(0)
    assert(out.getLong(0) == 2L)
    assert(out.getDouble(1) == 1.0 && out.getDouble(2) == 1.0)
    assert(out.isNullAt(3))
  }

  test("groupOls: perfect line, textbook partial fit, and degenerate x") {
    import spark.implicits._
    val df = (Seq((1d, 2d), (2d, 4d), (3d, 6d)).map { case (x, y) => ("line", x, y) } ++
      Seq((0d, 0d), (1d, 1d), (2d, 1d)).map { case (x, y) => ("bend", x, y) } ++
      Seq((5d, 1d), (5d, 2d), (5d, 3d)).map { case (x, y) => ("vert", x, y) })
      .toDF("g", "x", "y")
    val out = Stats.groupOls(df, "x", "y", Seq("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("line").getLong(1) == 3L)
    assert(out("line").getDouble(2) == 2.0)   // slope
    assert(out("line").getDouble(3) == 0.0)   // intercept
    assert(out("line").getDouble(4) == 1.0)   // r2
    // hand-computed: slope = 1/2, intercept = 1/6, r2 = 3/4
    assert(out("bend").getDouble(2) == 0.5)
    assert(out("bend").getDouble(3) == 0.166667)
    assert(out("bend").getDouble(4) == 0.75)
    // zero x-variance: no OLS line
    assert(out("vert").isNullAt(2) && out("vert").isNullAt(3) &&
      out("vert").isNullAt(4))
  }

  test("anovaOneWay: textbook F = 3.0, eta^2 = 0.5; degenerate groups " +
      "dropped") {
    import spark.implicits._
    // levels a/b/c with means 2/3/4, equal spread: SSB = 6, SSW = 6,
    // F = (6/2)/(6/6) = 3, eta2 = 0.5
    val g1 = Seq("a" -> 1d, "a" -> 2d, "a" -> 3d, "b" -> 2d, "b" -> 3d,
      "b" -> 4d, "c" -> 3d, "c" -> 4d, "c" -> 5d).map { case (t, v) => ("ok", t, v) }
    // single level -> k < 2 -> dropped
    val g2 = Seq(("onelevel", "a", 1d), ("onelevel", "a", 2d))
    // zero within-variance -> dropped (F undefined/infinite)
    val g3 = Seq(("const", "a", 1d), ("const", "a", 1d),
      ("const", "b", 2d), ("const", "b", 2d))
    val df = (g1 ++ g2 ++ g3).toDF("g", "tag", "v")
    val out = Stats.anovaOneWay(df, "v", "tag", Seq("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("ok"))
    assert(out("ok").getAs[Long]("k") == 3L && out("ok").getAs[Long]("n") == 9L)
    assert(out("ok").getAs[Double]("f_stat") == 3.0)
    assert(out("ok").getAs[Double]("eta_sq") == 0.5)
  }

  test("corrMatrix: r = 1 / -1 / null for linear, inverted and " +
      "constant columns, all pairs from one pass") {
    import spark.implicits._
    val df = Seq((1d, 2d, 3d, 5d), (2d, 4d, 2d, 5d), (3d, 6d, 1d, 5d))
      .map { case (x, y, z, w) => ("g", x, y, z, w) }
      .toDF("g", "x", "y", "z", "w")
    val out = Stats.corrMatrix(df, Seq("x", "y", "z", "w"), Seq("g"))
      .collect().map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) ->
        Option(r.getAs[java.lang.Double]("r"))).toMap
    assert(out.size == 6)
    assert(out(("x", "y")).contains(1.0))   // y = 2x
    assert(out(("x", "z")).contains(-1.0))  // z = 4 - x
    assert(out(("y", "z")).contains(-1.0))
    assert(out(("x", "w")).isEmpty && out(("y", "w")).isEmpty &&
      out(("z", "w")).isEmpty)              // w constant
  }

  test("benford: all-ones digits give max_abs_dev = 1 - log10(2); " +
      "absent digits contribute expected mass; sub-1 amounts use their " +
      "significant digit") {
    import spark.implicits._
    // ten amounts all leading with digit 1 (including 0.10 -> cents 10)
    val ones = Seq(1d, 10d, 150d, 1.5, 19.99, 0.10, 12d, 100d, 1999.99, 1.01)
      .map(("ones", _))
    val df = ones.toDF("g", "v")
    val r = Stats.benford(df, "v", Seq("g")).collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    // every observed digit is 1: share 1 vs p1 = log10(2)
    assert(r.getAs[Double]("max_abs_dev") == 0.69897)
    // chi2 = 10[(1-p1)^2/p1 + (1-p1)] — the (1-p1) part is exactly the
    // expected mass of the eight digits that never occur
    val p1 = math.log(2.0) / math.log(10.0)
    val want = 10.0 * ((1 - p1) * (1 - p1) / p1 + (1 - p1))
    assert(math.abs(r.getAs[Double]("chi2_stat") - want) < 1e-5)
    // sub-1 significant digit: 0.05 leads with 5
    val five = Seq(("f", 0.05)).toDF("g", "v")
    val r5 = Stats.benford(five, "v", Seq("g")).collect()(0)
    assert(r5.getAs[Double]("max_abs_dev") ==
      math.floor((1 - math.log(6.0 / 5) / math.log(10.0)) * 1e6 + 0.5) / 1e6)
  }

  test("groupOls: zero y-variance gives slope 0 with null r2") {
    import spark.implicits._
    val df = Seq(("g", 1d, 7d), ("g", 2d, 7d), ("g", 3d, 7d)).toDF("g", "x", "y")
    val r = Stats.groupOls(df, "x", "y", Seq("g")).collect()(0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 7.0 && r.isNullAt(4))
  }

  test("fleissKappa: hand-computed panels, perfect and saturated cases") {
    import spark.implicits._
    // two items, two raters: item 1 unanimous "a", item 2 split.
    // S2 = 4 + 2 = 6 -> p_bar = (6-4)/4 = 0.5; margins a=3, b=1 ->
    // p_e = 10/16 = 0.625; kappa = -0.125/0.375 = -1/3
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b")).toDF("i", "c")
    val r = Stats.fleissKappa(df, "i", "c", n = 2).head()
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Double]("p_bar") == 0.5)
    assert(r.getAs[Double]("p_e") == 0.625)
    assert(r.getAs[Double]("kappa") == -0.333333)
    // perfect two-category agreement: kappa = 1
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("i", "c")
    assert(Stats.fleissKappa(perfect, "i", "c", n = 2).head()
      .getAs[Double]("kappa") == 1.0)
    // single category: p_e = 1, kappa undefined
    val sat = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")).toDF("i", "c")
    val rs = Stats.fleissKappa(sat, "i", "c", n = 2).head()
    assert(rs.isNullAt(rs.fieldIndex("kappa")))
  }

  test("fleissKappa: ragged panels are dropped, not skewed into P̄") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), // complete panel
      (2L, "a"), (2L, "b"), (2L, "b"), // 3 ratings -> dropped at n=2
      (3L, "a")).toDF("i", "c") // 1 rating -> dropped
    val r = Stats.fleissKappa(df, "i", "c", n = 2).head()
    assert(r.getAs[Long]("n_items") == 1L)
    assert(r.getAs[Double]("p_bar") == 1.0)
  }

  test("bhFdr: hand-computed q-values, suffix-min monotonicity") {
    import spark.implicits._
    // adjusted = p*m/rank = [0.04, 0.08, 0.06, 0.05] — the suffix min
    // pulls rank 2 and 3 down to 0.05 (monotone non-decreasing q)
    val df = Seq((1L, 0.01), (2L, 0.04), (3L, 0.045), (4L, 0.05))
      .toDF("id", "p")
    val out = Stats.bhFdr(df, "p", Seq("id"), alpha = 0.05)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Double]("q_value")).toSeq ==
      Seq(0.04, 0.05, 0.05, 0.05))
    assert(out.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, true, true, true))
  }

  test("bhFdr: matches a local reference across many partitions") {
    import spark.implicits._
    // deterministic pseudo-uniform p's, spread over partitions so the
    // per-partition carry-in path is exercised
    val ps = (1 to 97).map(i => (i.toLong, (i * 37 % 101) / 101.0 + 1e-9))
    val out = Stats.bhFdr(ps.toDF("id", "p").repartition(7), "p", Seq("id"),
        alpha = 0.1)
      .select("id", "q_value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: sort, adjust, suffix-min, cap — plain Scala
    val sorted = ps.sortBy { case (id, p) => (p, id) }
    val m = sorted.length
    val adj = sorted.zipWithIndex.map { case ((id, p), i) =>
      id -> p * m / (i + 1) }
    val qs = adj.scanRight(Double.PositiveInfinity) {
      case ((_, a), acc) => math.min(a, acc) }.init
    adj.map(_._1).zip(qs).foreach { case (id, q) =>
      val want = math.floor(math.min(q, 1.0) * 1e6 + 0.5) / 1e6
      assert(out(id) == want, s"id $id")
    }
  }

  test("bhFdr: null p-values are dropped; reject uses unrounded q") {
    import spark.implicits._
    val df = Seq((1L, Some(0.02)), (2L, None), (3L, Some(0.8)))
      .toDF("id", "p")
    val out = Stats.bhFdr(df, "p", Seq("id"), alpha = 0.05)
      .orderBy("rank").collect()
    assert(out.length == 2)
    // m = 2: q1 = min(0.04, 0.8) = 0.04 -> reject; q2 = 0.8 -> keep
    assert(out(0).getAs[Double]("q_value") == 0.04)
    assert(out(0).getAs[Boolean]("reject"))
    assert(!out(1).getAs[Boolean]("reject"))
  }

  test("bootstrapMeanCI: exact point mean, ordered CI, full resample count") {
    import spark.implicits._
    val df = (1 to 200).map(i => ("g", i.toLong, i.toDouble))
      .toDF("grp", "id", "x")
    val row = Stats.bootstrapMeanCI(df, "x", Seq("id"), Seq("grp"), b = 50)
      .head()
    assert(row.getAs[Long]("n") == 200L)
    assert(row.getAs[Double]("mean") == 100.5) // exact decimal point estimate
    assert(row.getAs[Long]("n_resamples") == 50L)
    val (lo, hi) = (row.getAs[Double]("ci_lo"), row.getAs[Double]("ci_hi"))
    assert(lo < hi)
    // uniform 1..200: resample means concentrate near 100.5 (se ~ 4.1);
    // the 95% percentile CI must sit well inside +-5 se
    assert(lo > 100.5 - 21 && hi < 100.5 + 21)
    assert(lo < 100.5 && hi > 100.5)
  }

  test("bootstrapMeanCI is invariant under repartitioning (pure function of keys)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (if (i % 2 == 0) "a" else "b", i.toLong,
      (i * 3 % 17).toDouble)).toDF("grp", "id", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.bootstrapMeanCI(d, "x", Seq("id"), Seq("grp"), b = 20)
        .orderBy("grp").collect()
        .map(r => (r.getString(0), r.getAs[Double]("mean"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))).toSeq
    assert(run(df) == run(df.repartition(7)))
  }

  test("bootstrapDiffCI: exact point diff, CI brackets a large true uplift") {
    import spark.implicits._
    // ref ~ 10, cmp ~ 30: uplift 20 with small within-arm spread
    val rows = (1 to 100).map(i => ("lo", i.toLong, 10.0 + (i % 5))) ++
      (1 to 100).map(i => ("hi", 1000L + i, 30.0 + (i % 5)))
    val row = Stats.bootstrapDiffCI(rows.toDF("arm", "id", "x"), "x",
      Seq("id"), "arm", refArm = "lo", cmpArm = "hi", b = 30).head()
    assert(row.getAs[Long]("n_ref") == 100L)
    assert(row.getAs[Long]("n_cmp") == 100L)
    assert(row.getAs[Double]("diff") == 20.0) // exact decimal point diff
    assert(row.getAs[Long]("n_resamples") == 30L)
    val (lo, hi) = (row.getAs[Double]("ci_lo"), row.getAs[Double]("ci_hi"))
    assert(lo < 20.0 && hi > 20.0 && lo > 18.0 && hi < 22.0)
  }

  test("bootstrapMeanCI drops null values and keeps groups independent") {
    import spark.implicits._
    val df = Seq(("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, Some(20.0)),
      ("b", 4L, Some(5.0)), ("b", 5L, Some(5.0)), ("b", 6L, Some(5.0)),
      ("b", 7L, Some(5.0))).toDF("grp", "id", "x")
    val out = Stats.bootstrapMeanCI(df, "x", Seq("id"), Seq("grp"), b = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n") == 2L) // the null row is excluded
    assert(out("a").getAs[Double]("mean") == 15.0)
    // constant column: every resample mean is exactly the constant
    assert(out("b").getAs[Double]("ci_lo") == 5.0)
    assert(out("b").getAs[Double]("ci_hi") == 5.0)
  }

  test("classificationReport: hand-computed per-class PRF1 including a " +
    "never-predicted class") {
    import spark.implicits._
    val df = (Seq.fill(3)(("a", "a")) ++ Seq(("a", "b")) ++
      Seq.fill(2)(("b", "b")) ++ Seq(("c", "b")))
      .toDF("truth", "pred")
    val out = Stats.classificationReport(df, "truth", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_true") == 4L && a.getAs[Long]("n_pred") == 3L
      && a.getAs[Long]("tp") == 3L)
    assert(a.getAs[Double]("precision") == 1.0)
    assert(a.getAs[Double]("recall") == 0.75)
    assert(a.getAs[Double]("f1") == 0.857143)
    val b = out("b")
    assert(b.getAs[Double]("precision") == 0.5)
    assert(b.getAs[Double]("recall") == 1.0)
    assert(b.getAs[Double]("f1") == 0.666667)
    // c is never predicted: recall 0, precision/f1 undefined → null
    val c = out("c")
    assert(c.getAs[Long]("n_pred") == 0L)
    assert(c.isNullAt(c.fieldIndex("precision")))
    assert(c.getAs[Double]("recall") == 0.0)
    assert(c.isNullAt(c.fieldIndex("f1")))
  }

  test("classificationReport: zero-skill classes report f1 = 0, null " +
    "labels drop") {
    import spark.implicits._
    val df = Seq(("a", "b"), ("b", "a"), (null, "a"), ("a", null))
      .toDF("truth", "pred")
    val out = Stats.classificationReport(df, "truth", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("a").getAs[Double]("precision") == 0.0)
    assert(out("a").getAs[Double]("f1") == 0.0)
    assert(out("b").getAs[Double]("f1") == 0.0)
  }

  test("featureMiRanking: perfect predictor scores ln 2, constant " +
    "feature scores 0, ranks ordered") {
    import spark.implicits._
    val df = ((1 to 4).map(_ => ("A", 1.0, 7.0, Option(2.0))) ++
      (1 to 4).map(_ => ("B", 0.0, 7.0, None)))
      .toDF("label", "perfect", "constant", "sparse")
    val out = Stats.featureMiRanking(df, "label",
      Seq("perfect", "constant", "sparse"), bins = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val p = out("perfect")
    assert(p.getAs[Long]("n_rows") == 8L)
    assert(p.getAs[Double]("mi_nats") ==
      math.rint(math.log(2.0) * 1e6) / 1e6)
    assert(p.getAs[Long]("rank") == 1L)
    assert(out("constant").getAs[Double]("mi_nats") == 0.0)
    // sparse: listwise — only the 4 non-null rows count, all label A →
    // single label, MI 0
    assert(out("sparse").getAs[Long]("n_rows") == 4L)
    assert(out("sparse").getAs[Double]("mi_nats") == 0.0)
  }

  test("featureMiRanking: informative beats noisy-but-related beats " +
    "unrelated on a crafted frame") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val label = if (i % 2 == 0) "pos" else "neg"
      val strong = if (label == "pos") 10.0 + (i % 7) else 0.0 + (i % 7)
      val weak = (if (label == "pos") 1.0 else 0.0) + (i % 13)
      // i/2 strips the parity that defines the label — truly unrelated
      val none = ((i / 2) % 10).toDouble
      (label, strong, weak, none)
    }
    val out = Stats.featureMiRanking(rows.toDF("label", "strong", "weak", "none"),
      "label", Seq("strong", "weak", "none"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("mi_nats")).toMap
    assert(out("strong") > out("weak"))
    assert(out("weak") > out("none"))
  }

  /** Local replay of the conformal machinery: md5 4-hex split + the
    * corrected-rank bound.
    */
  private def conformalLocal(ids: Seq[Long], values: Map[Long, Double],
                             alpha: Double): (Long, Option[Double]) = {
    def bucket(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).take(2).map("%02x".format(_))
      .mkString
    val cal = ids.filter(bucket(_) < "8000")
    val sorted = cal.map(i => (values(i), i)).sorted.map(_._1)
    val k = math.ceil((cal.size + 1).toDouble * (1.0 - alpha)).toLong
    (cal.size.toLong,
      if (k <= cal.size) Some(sorted(k.toInt - 1)) else None)
  }

  test("conformalUpperBound matches a local replay and covers the " +
    "held-out set") {
    import spark.implicits._
    val ids = (1L to 400L)
    val values = ids.map(i => i -> (i % 97).toDouble).toMap
    val df = ids.map(i => ("g", i, values(i))).toDF("grp", "id", "v")
    val row = Stats.conformalUpperBound(df, Seq("grp"), "v", "id",
      alpha = 0.1).head()
    val (nCal, qHat) = conformalLocal(ids, values, 0.1)
    assert(row.getAs[Long]("n_cal") == nCal)
    assert(row.getAs[Double]("q_hat") == qHat.get)
    // the distribution-free guarantee: ~90% of held-out values covered
    assert(row.getAs[Double]("coverage") > 0.8)
    assert(row.getAs[Long]("n_eval") == 400L - nCal)
  }

  test("diffInDiff: hand-computed 2x2 contrast; missing cell nulls the " +
    "estimate") {
    import spark.implicits._
    val df = Seq(
      (true, false, 1.0), (true, false, 3.0),
      (true, true, 5.0), (true, true, 7.0),
      (false, false, 2.0), (false, true, 3.0))
      .toDF("t", "p", "v")
    import org.apache.spark.sql.functions.col
    val r = Stats.diffInDiff(df, col("t"), col("p"), "v").head()
    assert(r.getAs[Long]("n_treat_pre") == 2L)
    assert(r.getAs[Double]("mean_treat_post") == 6.0)
    // (6 − 2) − (3 − 2) = 3
    assert(r.getAs[Double]("did") == 3.0)
    val missing = Stats.diffInDiff(
      df.filter(!(col("t") && col("p"))), col("t"), col("p"), "v").head()
    assert(missing.isNullAt(missing.fieldIndex("did")))
  }

  test("conformalUpperBound: corrected rank beyond n_cal is the vacuous " +
    "bound (null, full coverage)") {
    import spark.implicits._
    // tiny calibration side + alpha 0.01: ceil((n+1)·0.99) > n always
    val df = (1L to 12L).map(i => ("g", i, i.toDouble))
      .toDF("grp", "id", "v")
    val row = Stats.conformalUpperBound(df, Seq("grp"), "v", "id",
      alpha = 0.01).head()
    assert(row.isNullAt(row.fieldIndex("q_hat")))
    assert(row.getAs[Double]("coverage") == 1.0)
  }
}
