package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search over an edge list — "how far is
  * every node from this seed set" (blast-radius, reachability tiers,
  * supply-chain hops). Completes the iterative-graph family next to
  * [[Dedup.connectedComponents]] (labels), [[PageRank]] (importance)
  * and [[Triangles]] (cohesion).
  *
  * Level-synchronous frontier expansion: each round is one equi-join of
  * the current frontier against the edges plus an anti-join against the
  * visited set — hash joins and distincts only, no driver-side graph.
  * The edge frame is persisted once and reused every round; frontier
  * and visited are eagerly localCheckpointed per round (the
  * connected-components lineage lesson). Rounds stop at `maxDepth` or
  * when a frontier comes back empty — at most `maxDepth` jobs, each
  * shuffling the frontier (∝ reachable nodes), never the full graph
  * per level.
  *
  * Output: `(node, level)` — the FIRST-discovery depth from the nearest
  * seed (min over seeds), seeds at level 0. Unreachable nodes are
  * absent.
  */
object Bfs {

  def levels(edges: DataFrame, srcCol: String, dstCol: String,
             sources: DataFrame, nodeCol: String, maxDepth: Int,
             directed: Boolean = false): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val rev = edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val e = TrackedCaches.track(
      (if (directed) fwd else fwd.union(rev)).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var visited = sources.select(col(nodeCol).as("node")).distinct()
      .withColumn("level", lit(0L))
      .localCheckpoint(true)
    var frontier = visited.select(col("node"))
    var d = 1
    var exhausted = false
    while (d <= maxDepth && !exhausted) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("level", lit(d.toLong))
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next.select(col("node"))
      }
      d += 1
    }
    visited
  }
}
