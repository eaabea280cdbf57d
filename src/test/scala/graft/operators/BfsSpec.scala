package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class BfsSpec extends SparkSpecBase {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("src", "dst")
  private def seeds(ids: Long*) = ids.toDF("node")

  private def run(e: org.apache.spark.sql.DataFrame,
                  s: org.apache.spark.sql.DataFrame, depth: Int,
                  directed: Boolean = false) =
    Bfs.levels(e, "src", "dst", s, "node", depth, directed)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("level"))
      .toMap

  test("path graph: levels count hops; maxDepth truncates; " +
      "unreachable nodes are absent") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    val out = run(e, seeds(1L), depth = 3)
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // early exhaustion: depth 10 still terminates, finds the whole chain
    val full = run(e, seeds(1L), depth = 10)
    assert(full == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    assert(!full.contains(8L) && !full.contains(9L))
  }

  test("multi-source takes the nearest seed; directed respects edge " +
      "direction") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val multi = run(e, seeds(1L, 5L), depth = 2)
    assert(multi == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
    val dir = run(edges((1L, 2L), (3L, 2L)), seeds(1L), depth = 3,
      directed = true)
    assert(dir == Map(1L -> 0L, 2L -> 1L)) // 3 only reachable undirected
    val undir = run(edges((1L, 2L), (3L, 2L)), seeds(1L), depth = 3)
    assert(undir == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  private def wEdges(rows: (Long, Long, Long)*) =
    rows.toDF("src", "dst", "w")

  private def runSp(e: org.apache.spark.sql.DataFrame,
                    s: org.apache.spark.sql.DataFrame, iters: Int,
                    directed: Boolean = false) =
    Bfs.shortestPaths(e, "src", "dst", "w", s, "node", iters, directed)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist"))
      .toMap

  test("shortestPaths: two cheap hops beat one expensive edge; " +
      "maxIter bounds path length; parallel edges take the min") {
    val e = wEdges((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 25L),
      (1L, 3L, 40L))
    assert(runSp(e, seeds(1L), iters = 3, directed = true) ==
      Map(1L -> 0L, 2L -> 10L, 3L -> 20L))
    // one round can only use single-edge paths: 3 costs 25 direct
    assert(runSp(e, seeds(1L), iters = 1, directed = true) ==
      Map(1L -> 0L, 2L -> 10L, 3L -> 25L))
  }

  test("shortestPaths: undirected symmetrizes; early convergence " +
      "equals the full run; multi-source takes the nearest seed") {
    val e = wEdges((1L, 2L, 5L), (2L, 3L, 5L))
    assert(runSp(e, seeds(3L), iters = 9) ==
      Map(3L -> 0L, 2L -> 5L, 1L -> 10L))
    assert(runSp(e, seeds(3L), iters = 9) == runSp(e, seeds(3L), iters = 2))
    assert(runSp(e, seeds(1L, 3L), iters = 9) ==
      Map(1L -> 0L, 3L -> 0L, 2L -> 5L))
  }

  test("shortestPaths: negative weights fail loudly") {
    val e = wEdges((1L, 2L, -1L))
    assertThrows[Exception] {
      runSp(e, seeds(1L), iters = 2)
    }
  }
}
