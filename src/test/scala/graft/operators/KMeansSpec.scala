package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpecBase {

  /** Three tight, well-separated groups on the axes of R³ (8 points
    * each, jitter ≪ separation), grouped by vec_id % 3. Plain Lloyd is
    * init-sensitive by construction (two seeds in one true group merge
    * the others — the standard failure mode, not a bug), so the fixture
    * is laid out so the DETERMINISTIC md5 init provably covers all
    * three groups: for ids 0..23 the k=3 smallest md5-52-bit keys are
    * ids 6, 19, 23, which fall in residue classes 0, 1, 2. From a
    * covering init, Lloyd must recover the partition.
    */
  private lazy val separated = {
    import spark.implicits._
    val pts = for (id <- 0 until 24) yield {
      val g = id % 3
      val base = Array(0f, 0f, 0f)
      base(g) = 10f
      base((g + 1) % 3) = 0.1f * (id / 3)   // jitter within the group
      (id.toLong, base.toSeq)
    }
    pts.toDF("vec_id", "embedding")
  }

  test("known separated clusters are recovered exactly") {
    val cb = KMeans.fit(separated, k = 3, iters = 5)
    val groups = KMeans.assign(separated, cb)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getLong(0) % 3, r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    // each true group lands in exactly one fitted cluster...
    assert(groups.values.forall(_.size == 1),
      s"a true group split across clusters: $groups")
    // ...and the three fitted clusters are distinct
    assert(groups.values.flatten.toSet.size == 3, s"clusters merged: $groups")
  }

  test("fit is invariant under repartitioning (decimal-exact means)") {
    val emb = Tables.embeddings(spark, sf()).limit(200)
    val a = KMeans.fit(emb, k = 4, iters = 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    val b = KMeans.fit(emb.repartition(7), k = 4, iters = 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq,
      "centroids changed under repartition — a sum is order-dependent")
  }

  test("assign picks the nearest centroid, ties to the lowest cluster id") {
    import spark.implicits._
    val pts = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val cb = Seq((0, Seq(1.0, 0.0), 1.0), (1, Seq(0.0, 1.0), 1.0))
      .toDF("cluster", "centroid", "cn2")
    val out = KMeans.assign(pts, cb).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) == 0 && out(1L) == 1)
    assert(out(2L) == 0, "equidistant point must tie to the lowest cluster id")
  }

  test("silhouetteKMeans: separated clusters score near 1, one centroid yields no score") {
    val cb = KMeans.fit(separated, k = 3, iters = 5)
    val sil = Similarity.silhouetteKMeans(separated, cb).collect()
    assert(sil.length == 3)
    assert(sil.forall(_.getDouble(2) > 0.8),
      s"separated clusters should have silhouette near 1: ${sil.mkString(", ")}")
    import spark.implicits._
    val one = Seq((0, Seq(0.0, 0.0, 0.0), 0.0)).toDF("cluster", "centroid", "cn2")
    val none = Similarity.silhouetteKMeans(separated, one).collect()
    assert(none.length == 1 && none.head.isNullAt(2),
      "a single centroid has no runner-up — mean silhouette must be null")
  }

  test("inertiaHistory is non-increasing (Lloyd monotonicity) and counts every row") {
    val hist = KMeans.inertiaHistory(separated, k = 3, iters = 4)
      .orderBy("iteration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hist.map(_._1).toSeq == (0L to 4L))
    assert(hist.forall(_._2 == 24L))
    hist.map(_._3).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"inertia increased: ${hist.mkString(", ")}")
    }
    // separated clusters converge: the final inertia is the within-group
    // jitter only, far below the init state's cross-group assignments
    assert(hist.last._3 < hist.head._3)
  }

  test("semDedupKMeans verdicts match within-cluster pairwise cosine (sf0.001)") {
    val emb = Tables.embeddings(spark, sf()).limit(100)
    val cb = KMeans.fit(emb, k = 4, iters = 2)
    val out = Similarity.semDedupKMeans(emb, threshold = 0.4, cb).collect()
    assert(out.length == 100)
    // recompute the expected verdict from the assignment + brute pairs
    val assigned = KMeans.assign(emb, cb)
    val joined = emb.join(assigned, "vec_id")
    val a = joined.select(col("cluster"), col("vec_id").as("a_id"),
      col("embedding").as("av"))
    val b = joined.select(col("cluster"), col("vec_id").as("b_id"),
      col("embedding").as("bv"))
    val expected = a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", Similarity.cosineCol(col("av"), col("bv")))
      .groupBy(col("b_id")).agg(max(col("cos")).as("mx"))
      .filter(col("mx") >= 0.4)
      .select("b_id").collect().map(_.getLong(0)).toSet
    val dropped = out.filter(_.getAs[Boolean]("dropped"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(dropped == expected,
      s"verdicts diverge: extra=${dropped -- expected} missing=${expected -- dropped}")
    TrackedCaches.release()
  }
}
