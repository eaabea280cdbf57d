package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting on an undirected graph — the density /
  * clustering metric behind community detection and spam-graph
  * analysis. Input edges may be directed, duplicated, or self-looped;
  * they are canonicalized first.
  *
  * The naive 3-way self-join enumerates every wedge at its center —
  * a celebrity node of degree d contributes d² join rows. This uses the
  * standard DEGREE ORIENTATION bound instead: orient every undirected
  * edge from its lower-(degree, id) endpoint to the higher one; every
  * triangle then has exactly ONE node with two out-edges. Wedges are
  * generated only at that node (out-degree after orientation is
  * O(√m) — no vertex beats that, however skewed the input), and closed
  * by one equi-join against the oriented edge set. All joins are hash
  * equi-joins on node ids; no driver-side adjacency.
  */
object Triangles {

  /** One row: (n_nodes, n_edges, n_triangles). */
  def summary(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val und = raw.select(least(col("a"), col("b")).as("u"),
      greatest(col("a"), col("b")).as("v")).distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // orient from lower (degree, id) to higher — a total order, so each
    // undirected edge appears exactly once in `oriented`
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges centered at the low vertex; (t1, t2) ordered to count each
    // candidate pair once
    val w1 = oriented.select(col("s"), col("t").as("t1"))
    val w2 = oriented.select(col("s"), col("t").as("t2"))
    val wedges = w1.join(w2, Seq("s")).filter(col("t1") < col("t2"))
    // close the wedge with the canonical undirected edge (t1 < t2 already)
    val tris = wedges.join(und,
      col("t1") === col("u") && col("t2") === col("v"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges)
      .crossJoin(tris.agg(count(lit(1)).as("n_triangles")))
  }
}
