package graft.operators

import graft.SparkSpecBase

class TrianglesSpec extends SparkSpecBase {

  import spark.implicits._

  private def stats(edges: Seq[(String, String)]): (Long, Long, Long) = {
    val r = Triangles.summary(edges.toDF("s", "d"), "s", "d").head()
    (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_triangles"))
  }

  test("one triangle, direction/duplicates/self-loops ignored") {
    val edges = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "a",
      "a" -> "a", "b" -> "c")
    assert(stats(edges) == ((3L, 3L, 1L)))
  }

  test("K4 has four triangles") {
    val nodes = Seq("a", "b", "c", "d")
    val edges = for (x <- nodes; y <- nodes if x < y) yield x -> y
    assert(stats(edges) == ((4L, 6L, 4L)))
  }

  test("a star graph has edges but no triangles") {
    val edges = Seq("hub" -> "s1", "hub" -> "s2", "hub" -> "s3")
    assert(stats(edges) == ((4L, 3L, 0L)))
  }

  test("two triangles sharing an edge") {
    // a-b-c-a and b-c-d-b share edge b-c
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d", "d" -> "b")
    assert(stats(edges) == ((4L, 5L, 2L)))
  }
}
