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
  * max-abs-scaled squared scores are DECIMAL(38,18)-quantized before
  * their sums — exact order-free addition — and every derived double
  * (the pre-scale division, sqrt of the decimal sum, the max-abs
  * remultiply, the normalizing division) is a single correctly-rounded
  * IEEE op both engines reproduce bit-for-bit. Final scores round to
  * 6 dp.
  *
  * Scale notes for 100 TB graphs: hub/auth frames re-derive per
  * iteration, so lineage is cut with an eager localCheckpoint per round
  * (the PageRank lesson); hot authorities are absorbed by the map-side
  * partial sum — the shuffle carries one row per (partition, dst), not
  * per edge.
  */
object Hits {

  private val D = "decimal(38,18)"

  /** One-row L2-norm frame of `v` via max-abs pre-scaling: Σx² would
    * overflow DECIMAL(38,18)'s 20 integer digits once |x| > ~1.3e10 —
    * and the FIRST iteration's raw authority IS the in-degree, so a
    * celebrity node on a web-scale graph would kill the run (round-7
    * advice). ‖v‖ = m·‖v/m‖ with m = max|x| keeps every squared term
    * ≤ 1: the decimal sum then holds to 1e20 rows. Determinism is
    * intact — x/m and m·√s are single correctly-rounded IEEE ops both
    * engines reproduce, and the scaled squares still sum order-free
    * through the decimal. m = 0 (edgeless) yields norm 0, which the
    * caller's `nrm > 0` guard maps to all-zero scores.
    */
  private def scaledNorm(frame: DataFrame, v: String): DataFrame = {
    val mx = frame.agg(max(abs(col(v))).as("mx"))
    frame.crossJoin(broadcast(mx))
      .agg((max(col("mx")) * sqrt(
        sum(when(col("mx") > 0,
          ((col(v) / col("mx")) * (col(v) / col("mx"))).cast(D))
          .otherwise(lit(0).cast(D))).cast("double"))).as("nrm"))
  }

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
      val anorm = scaledNorm(authFrame, "araw")
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
      val hnorm = scaledNorm(hubFrame, "hraw")
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
