package graft.operators

import graft.SparkSpecBase

class PageRankSpec extends SparkSpecBase {

  import spark.implicits._

  test("symmetric ring: all nodes equally ranked at 1/n") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val out = PageRank.run(edges, "s", "d", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pagerank")).toMap
    assert(out.values.toSet == Set(0.333333))
  }

  test("dangling node: one hand-computed iteration") {
    // a -> b; b dangles. n=2, init 0.5/0.5, damping 0.85:
    //   a' = 0.15/2 + 0.85*(0 + 0.5/2)   = 0.2875
    //   b' = 0.15/2 + 0.85*(0.5 + 0.5/2) = 0.7125
    val edges = Seq(("a", "b")).toDF("s", "d")
    val out = PageRank.run(edges, "s", "d", iterations = 1)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("out_degree"), r.getAs[Double]("pagerank"))).toMap
    assert(out("a") == ((1L, 0.2875)))
    assert(out("b") == ((0L, 0.7125)))
  }

  test("rank mass is conserved (sums to 1) even with dangling nodes") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L))
      .toDF("s", "d") // node 5 dangles
    val total = PageRank.run(edges, "s", "d", iterations = 5)
      .collect().map(_.getAs[Double]("pagerank")).sum
    assert(math.abs(total - 1.0) < 1e-4)
  }

  test("a hub pointed to by everyone outranks its satellites") {
    val edges = Seq(("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1"))
      .toDF("s", "d")
    val out = PageRank.run(edges, "s", "d", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pagerank")).toMap
    assert(out("hub") > out("s1") && out("s1") > out("s2"))
    assert(out("s2") == out("s3")) // symmetric satellites tie exactly
  }

  test("duplicate and null edges are dropped before degree counting") {
    val edges = Seq(Some("a") -> Some("b"), Some("a") -> Some("b"),
      Option.empty[String] -> Some("b"), Some("a") -> Option.empty[String])
      .map { case (s, d) => (s.orNull, d.orNull) }.toDF("s", "d")
    val out = PageRank.run(edges, "s", "d", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("out_degree")).toMap
    assert(out == Map("a" -> 1L, "b" -> 0L))
  }
}
