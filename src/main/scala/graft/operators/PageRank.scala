package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the canonical iterative
  * graph-analytics primitive (the second one here after
  * `Dedup.connectedComponents`): importance flows along edges, damped,
  * with dangling-node mass redistributed uniformly.
  *
  * Per iteration (fixed `iterations` count — deterministic, no
  * convergence test): contribution = rank/out-degree flows over an
  * edges equi-join, sums per destination (map-side combined), dangling
  * mass is a one-row aggregate broadcast back. Everything is keyed
  * equi-joins and hash aggregates — no driver-side graph structure; the
  * only driver scalar is the node count.
  *
  * Determinism/oracle-portability: per-edge contributions are doubles
  * (identical expression tree both engines) summed as DECIMAL(38,18) —
  * exact, order-independent addition — then cast back; the final rank
  * rounds to 6 dp, far above the decimal-conversion noise floor.
  *
  * Scale notes for 100 TB graphs: the rank frame re-derives each
  * iteration, so lineage is cut with an eager localCheckpoint per round
  * (the connected-components lesson: without it the plan doubles per
  * iteration and Catalyst analysis dominates). Hot destination nodes
  * (celebrity vertices) are absorbed by the map-side partial sum — the
  * shuffle carries one row per (partition, dst), not per edge.
  */
object PageRank {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val nodesDeg = nodes.join(outDeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint(true) // referenced every iteration: scan once
    val n = nodesDeg.count() // driver scalar (node COUNT, not node data)
    val d18 = "decimal(38,18)"
    var ranks = nodesDeg.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contribs = ranks.filter(col("deg") > 0)
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("deg")).cast(d18).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("csum"))
      val dangling = ranks.filter(col("deg") === 0L)
        .agg(coalesce(sum(col("rank").cast(d18)), lit(0).cast(d18)).as("dsum"))
      ranks = nodesDeg.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .withColumn("rank",
          lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("csum").cast("double"), lit(0.0)) +
              col("dsum").cast("double") / n))
        .select(col("node"), col("deg"), col("rank"))
        .localCheckpoint(true) // cut per-iteration lineage growth
    }
    ranks.select(col("node"), col("deg").as("out_degree"),
      round(col("rank"), 6).as("pagerank"))
  }
}
