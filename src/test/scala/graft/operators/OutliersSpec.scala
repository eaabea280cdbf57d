package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpecBase {

  import spark.implicits._

  test("winsorize clips to interpolated group percentiles, keeps the middle") {
    // group g: 1..100 → p10 = 1 + 0.1*99 = 10.9, p90 = 1 + 0.9*99 = 90.1
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "value")
    val out = Outliers.winsorize(df, "value", Seq("k"),
        lower = 0.1, upper = 0.9)
      .select(col("value"), col("value_w")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val p10 = 1 + 0.1 * 99 // 10.9 up to double interpolation
    val p90 = 1 + 0.9 * 99 // 90.10000000000001 — bit-exact interpolation
    assert(out(1.0) == p10)
    assert(out(10.0) == p10)
    assert(out(50.0) == 50.0, "interior values pass through untouched")
    assert(out(95.0) == p90)
    assert(out(100.0) == p90)
  }

  test("groups winsorize independently") {
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (101 to 110).map(i => ("b", i.toDouble))).toDF("k", "value")
    val out = Outliers.winsorize(df, "value", Seq("k"), 0.1, 0.9)
      .groupBy(col("k")).agg(max(col("value_w")).as("mx"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") < 10.0 && out("a") > 9.0)
    assert(out("b") < 110.0 && out("b") > 109.0)
  }

  test("approximate mode keeps schema and clips within sketch error") {
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("k", "value")
    val out = Outliers.winsorize(df, "value", Seq("k"), 0.01, 0.99,
      exact = false)
    assert(out.columns.contains("value_w"))
    val mx = out.agg(max(col("value_w"))).head().getDouble(0)
    assert(mx >= 980.0 && mx <= 1000.0, s"p99 clip implausible: $mx")
  }

  test("null GROUP rows survive and clip against the null group's bounds") {
    val df = ((1 to 100).map(i => (Option("g"), i.toDouble)) ++
      (1 to 100).map(i => (Option.empty[String], i.toDouble + 1000)))
      .toDF("k", "value")
    val out = Outliers.winsorize(df, "value", Seq("k"), 0.1, 0.9)
    assert(out.count() == 200, "no row may be dropped by the bounds join")
    val nullGroup = out.filter(col("k").isNull)
      .agg(min(col("value_w")), max(col("value_w"))).head()
    // null group's own values are 1001..1100 → p10=1010.9, p90=1090.1
    assert(nullGroup.getDouble(0) > 1000.0, "clipped by the NULL group's lo")
    assert(nullGroup.getDouble(1) < 1100.0, "clipped by the NULL group's hi")
  }

  test("null values stay null and do not poison the bounds") {
    val df = (Seq(("g", Some(1.0)), ("g", None)) ++
      (2 to 10).map(i => ("g", Some(i.toDouble)))).toDF("k", "value")
    val out = Outliers.winsorize(df, "value", Seq("k"), 0.1, 0.9)
    assert(out.filter(col("value").isNull && col("value_w").isNotNull).isEmpty)
    assert(out.filter(col("value_w").isNotNull).count() == 10)
  }

  test("rollingAnomaly: spike z-scored against preceding frame only; warmup and flat series give no verdict") {
    import spark.implicits._
    // flat 10s, then a spike of 20 at t=6, then 10 again
    val series = Seq(10.0, 10.0, 10.0, 10.0, 10.0, 20.0, 10.0)
      .zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "t", "v")
    val out = Outliers.rollingAnomaly(series, "v", Seq("grp"), "t",
        lookback = 7, zThreshold = 2.0, minBaseline = 3)
      .collect().map(r => r.getAs[Long]("t") ->
        (Option(r.getAs[Any]("z")), Option(r.getAs[Any]("is_anomaly")))).toMap
    // t=0,1,2: fewer than 3 predecessors -> no verdict
    assert(out(0L) == ((None, None)) && out(2L) == ((None, None)))
    // t=3..5: flat baseline, zero variance -> no z, no verdict
    assert(out(5L) == ((None, None)))
    // t=5 spike: baseline (10,10,10,10,10) has zero variance -> NULL z
    // (flagged only when variance exists); t=6 AFTER the spike: baseline
    // includes the spike -> nonzero variance, z defined and small
    assert(out(6L)._1.isDefined)
    assert(out(6L)._2.contains(false))
    // now a spiky-baseline series where the current point IS anomalous
    val s2 = Seq(10.0, 12.0, 8.0, 11.0, 9.0, 50.0)
      .zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "t", "v")
    val r2 = Outliers.rollingAnomaly(s2, "v", Seq("grp"), "t")
      .filter(col("t") === 5L).head()
    assert(r2.getAs[Boolean]("is_anomaly"))
    assert(r2.getAs[Double]("z") > 2.0)
    // hand-check: baseline mean of (10,12,8,11,9) = 10
    assert(r2.getAs[Double]("baseline_mean") == 10.0)
  }

  test("madOutliers: hand-checked median, MAD and outlier count") {
    import spark.implicits._
    // group a: values 1..9 plus a planted 1000
    //   median of (1..9, 1000) = 5.5; |x-5.5| = 4.5,3.5,...,3.5,994.5
    //   sorted devs: .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 994.5 and 0.5 -> MAD 2.5
    val a = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("a", _))
    val df = (a :+ ("b", 7.0)).toDF("g", "v")
    val out = Outliers.madOutliers(df, "v", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Long]("n_outliers"))).toMap
    assert(out("a") == ((10L, 5.5, 2.5, 1L))) // only 1000 exceeds 5.5±7.5
    // singleton group: med = value, MAD 0, nothing beats 0 strictly... the
    // deviation is 0 > 0 = false -> no outliers
    assert(out("b") == ((1L, 7.0, 0.0, 0L)))
  }

  test("madOutliers: null values are ignored, null group keys are real groups") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("a"), Option.empty[Double]), (Option.empty[String], Some(5.0)),
      (Option.empty[String], Some(7.0))).toDF("g", "v")
    val out = Outliers.madOutliers(df, "v", Seq("g")).collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Long]("n")).toMap
    assert(out == Map(Some("a") -> 2L, None -> 2L))
  }

  test("robustScale: hand-computed rank quartiles; zero-IQR group gets " +
      "null verdicts") {
    import spark.implicits._
    // group a: 1..8 → q1 = rank ceil(2) = 2, med = rank 4 = 4,
    // q3 = rank 6 = 6, IQR = 4; group c is constant → IQR 0 → null
    val df = ((1 to 8).map(i => ("a", i.toLong, i.toDouble)) ++
      Seq(("c", 1L, 9.0), ("c", 2L, 9.0), ("c", 3L, 9.0)))
      .toDF("g", "id", "v")
    val out = Outliers.robustScale(df, "v", Seq("g"), Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.getAs[java.lang.Double]("scaled"))).toMap
    assert(out(("a", 8L)).contains(1.0))   // (8-4)/4
    assert(out(("a", 1L)).contains(-0.75)) // (1-4)/4
    assert(out(("a", 4L)).contains(0.0))
    assert(out(("c", 1L)).isEmpty && out(("c", 3L)).isEmpty)
  }

  test("winsorizeFromSketch: REFERENCE bounds clip the new batch; its own " +
    "outliers cannot move them; unsketched groups pass unclipped") {
    import spark.implicits._
    // reference: group g over 1..100 — p10 ≈ 10, p90 ≈ 90 (GK exact here)
    val ref = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "x")
    val sk = Sketches.quantileSketch(ref, "x", Seq("grp"))
    // new batch: an extreme outlier, a low value, a mid value, and a
    // group the reference never saw
    val batch = Seq(("g", 1e9), ("g", 1.0), ("g", 50.0), ("new", 7.0))
      .toDF("grp", "x")
    val out = Outliers.winsorizeFromSketch(batch, "x", Seq("grp"), sk,
        lower = 0.1, upper = 0.9)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val hi = out(("g", 1e9)).get
    val lo = out(("g", 1.0)).get
    // the reference's p90/p10 (within GK rank error), NOT the batch's —
    // a self-computed winsorize would have dragged the p90 toward 1e9
    assert(hi >= 88.0 && hi <= 92.0, s"upper clip $hi")
    assert(lo >= 9.0 && lo <= 12.0, s"lower clip $lo")
    assert(out(("g", 50.0)).contains(50.0), "the middle must pass through")
    assert(out(("new", 7.0)).isEmpty,
      "a group absent from the sketch frame has no bounds — no verdict")
  }
}
