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

  /** Multi-source weighted shortest paths — Bellman-Ford, level-
    * synchronous: each round relaxes every edge once (one equi-join +
    * one `min` re-aggregation on the node key), so after round r the
    * frame holds the exact minimum distance over paths of ≤ r edges.
    * Rounds stop at `maxIter` or when a round improves nothing (at
    * which point longer paths cannot improve either — the standard BF
    * invariant, so early stop ≡ running all rounds).
    *
    * Weights must be integral and non-negative: distance compares must
    * be exact (a float `min` chain is order-sensitive at the ulp), and
    * ANSI mode turns any overflow into a loud failure instead of a
    * wrapped distance. Parallel edges collapse to their min weight
    * once, up front. Per round the shuffle carries the distance frame
    * (∝ reached nodes) and never re-shuffles the persisted edge frame's
    * lineage. Output: (node, dist); unreachable nodes absent.
    */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    weightCol: String, sources: DataFrame, nodeCol: String,
                    maxIter: Int, directed: Boolean = false): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val wType = edges.schema(weightCol).dataType
    require(wType == org.apache.spark.sql.types.LongType ||
      wType == org.apache.spark.sql.types.IntegerType,
      s"weightCol $weightCol must be integral (INT/BIGINT), got $wType")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
    val rev = edges.select(col(dstCol).as("src"), col(srcCol).as("dst"),
      col(weightCol).cast("long").as("w"))
    val e = TrackedCaches.track(
      (if (directed) fwd else fwd.union(rev))
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("w").isNotNull)
        // the guard feeds the aggregated column, so it cannot be pruned
        .select(col("src"), col("dst"),
          when(col("w") < 0L, raise_error(
            lit("shortestPaths requires non-negative weights")))
            .otherwise(col("w")).as("w"))
        .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var dist = sources.select(col(nodeCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var it = 0
    var changed = true
    while (it < maxIter && changed) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      val improved = relaxed
        .join(dist.withColumnRenamed("dist", "__old"), Seq("node"), "left")
        .filter(col("__old").isNull || col("dist") < col("__old"))
      changed = !improved.isEmpty
      dist = relaxed
      it += 1
    }
    dist
  }
}
