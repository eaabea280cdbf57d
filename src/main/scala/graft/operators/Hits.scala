package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999, JACM) — the second
  * classic link-analysis scoring next to [[PageRank]]: a node is a good
  * authority if good hubs point at it, a good hub if it points at good
  * authorities; the two scores are the mutually-recursive fixpoint,
  * L2-normalized each half-step.
  *
  * Per iteration (fixed count, deterministic): authority = in-edge sum
  * of hub scores, hub = out-edge sum of the fresh authority scores —
  * each a keyed equi-join plus a map-side-combined aggregation; each L2
  * norm is a one-row aggregate broadcast back. No driver-side graph
  * state.
  *
  * Determinism/oracle-portability: per-edge contributions and the
  * squared scores are DECIMAL(38,18)-quantized before their sums —
  * exact order-free addition — and every derived double (sqrt of the
  * decimal norm, the normalizing division) is a single correctly-
  * rounded IEEE op both engines reproduce bit-for-bit. Final scores
  * round to 6 dp.
  *
  * Scale notes for 100 TB graphs: hub/auth frames re-derive per
  * iteration, so lineage is cut with an eager localCheckpoint per round
  * (the PageRank lesson); hot authorities are absorbed by the map-side
  * partial sum — the shuffle carries one row per (partition, dst), not
  * per edge.
  */
object Hits {

  private val D = "decimal(38,18)"

  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true) // referenced twice per iteration: scan once
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var scores = nodes
      .withColumn("auth", lit(1.0)).withColumn("hub", lit(1.0))
    for (_ <- 1 to iterations) {
      val authRaw = scores
        .join(e, col("node") === col("src"))
        .select(col("dst"), col("hub").cast(D).as("c"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("araw"))
      val authFrame = nodes.join(authRaw, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("araw").cast("double"), lit(0.0)).as("araw"))
      val anorm = authFrame
        .agg(sqrt(sum((col("araw") * col("araw")).cast(D)).cast("double"))
          .as("nrm"))
      // zero norm (edgeless graph) keeps scores at 0 instead of inf/NaN
      val auths = authFrame.crossJoin(broadcast(anorm))
        .select(col("node"), when(col("nrm") > 0,
          col("araw") / col("nrm")).otherwise(lit(0.0)).as("auth"))
        .localCheckpoint(true) // cut per-iteration lineage growth
      val hubRaw = auths
        .join(e, col("node") === col("dst"))
        .select(col("src"), col("auth").cast(D).as("c"))
        .groupBy(col("src").as("node")).agg(sum(col("c")).as("hraw"))
      val hubFrame = nodes.join(hubRaw, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("hraw").cast("double"), lit(0.0)).as("hraw"))
      val hnorm = hubFrame
        .agg(sqrt(sum((col("hraw") * col("hraw")).cast(D)).cast("double"))
          .as("nrm"))
      val hubs = hubFrame.crossJoin(broadcast(hnorm))
        .select(col("node"), when(col("nrm") > 0,
          col("hraw") / col("nrm")).otherwise(lit(0.0)).as("hub"))
        .localCheckpoint(true)
      scores = auths.join(hubs, Seq("node"))
    }
    scores.select(col("node"), round(col("auth"), 6).as("authority"),
      round(col("hub"), 6).as("hub"))
  }
}
