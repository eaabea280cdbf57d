package graft.operators

import graft.SparkSpecBase

class SkylineSpec extends SparkSpecBase {

  import spark.implicits._

  test("hand-traced 2D frontier with same-x and duplicate points") {
    // frontier: (1,9), (5,7), (8,3). Dominated: (1,2) by same-x (1,9);
    // (4,6) by (5,7); (8,1) by (8,3). (5,7) twice -> n_rows 2.
    val df = Seq((1.0, 9), (1.0, 2), (4.0, 6), (5.0, 7), (5.0, 7),
      (8.0, 3), (8.0, 1)).toDF("x", "y")
    val out = Skyline.frontier2D(df, "x", "y").orderBy("x").collect()
    assert(out.map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1.0, 9, 1L), (5.0, 7, 2L), (8.0, 3, 1L)))
  }

  test("equal points are one frontier row; ties on both dims survive") {
    val df = Seq((2.0, 5), (2.0, 5), (2.0, 5)).toDF("x", "y")
    val out = Skyline.frontier2D(df, "x", "y").collect()
    assert(out.length == 1 && out.head.getLong(2) == 3L)
  }

  test("monotone-decreasing staircase keeps every step") {
    val pts = (1 to 50).map(i => (i.toDouble, 100 - i))
    val out = Skyline.frontier2D(pts.toDF("x", "y"), "x", "y").count()
    assert(out == 50L)
  }

  test("single dominating point collapses the frontier") {
    val pts = (1 to 40).map(i => (i.toDouble, i % 7)) :+ (50.0, 100)
    val out = Skyline.frontier2D(pts.toDF("x", "y").repartition(5),
      "x", "y").collect()
    assert(out.map(r => (r.getDouble(0), r.getInt(1))).toSeq ==
      Seq((50.0, 100)))
  }

  test("matches the O(n²) dominance definition on pseudo-random points") {
    val pts = (1 to 200).map(i => ((i * 53 % 97).toDouble, i * 31 % 89))
    val out = Skyline.frontier2D(pts.toDF("x", "y").repartition(6),
        "x", "y").collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSet
    val distinct = pts.distinct
    val want = distinct.filter { case (x, y) =>
      !distinct.exists { case (a, b) =>
        a >= x && b >= y && (a > x || b > y) }
    }.toSet
    assert(out == want)
  }
}
