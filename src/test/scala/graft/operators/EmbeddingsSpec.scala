package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpecBase {

  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("jacobiEigen: known 2x2 — eigenvalues 3 and 1, orthonormal vectors " +
      "with the deterministic sign convention") {
    val (values, vectors) = Embeddings.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(values(0) - 3.0) < 1e-12 && math.abs(values(1) - 1.0) < 1e-12)
    val inv = 1.0 / math.sqrt(2.0)
    assert(vectors(0).zip(Array(inv, inv)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // second vector is ±[1,-1]/√2; sign rule makes the largest-|.| entry
    // positive -> first entry positive
    assert(vectors(1)(0) > 0)
    assert(math.abs(vectors(1)(0) * vectors(0)(0) + vectors(1)(1) * vectors(0)(1)) < 1e-12)
  }

  test("covariance: one-pass accumulator path and decimal relational " +
      "path agree (hand-checked 2D case)") {
    // x = [1,2,3,4], y = [2,4,6,8]: var(x)=5/3, cov(x,y)=10/3, var(y)=20/3
    val df = vecDf(Seq(
      (1L, Seq(1f, 2f)), (2L, Seq(2f, 4f)), (3L, Seq(3f, 6f)), (4L, Seq(4f, 8f))))
    def covMap(portable: Boolean) =
      Embeddings.covariance(df, portable = portable).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val fast = covMap(false)
    assert(fast == Map((0L, 0L) -> 1.666667, (0L, 1L) -> 3.333333,
      (1L, 1L) -> 6.666667))
    assert(covMap(true) == fast)
    TrackedCaches.release()
  }

  test("pca: a dominant synthetic axis is recovered as component 0 with " +
      "most of the variance; projection coordinates match the dot product") {
    // spread along (1,1,0)/√2 with small noise on the third dim
    val rows = (1 to 200).map { i =>
      val t = (i - 100.5).toFloat / 10f
      val noise = ((i * 37) % 7 - 3).toFloat / 50f
      (i.toLong, Seq(t, t, noise))
    }
    val df = vecDf(rows)
    val comps = Embeddings.pca(df, k = 2)
    val first = comps.filter(col("component") === 0L).head()
    assert(first.getAs[Double]("explained_ratio") > 0.9)
    val v0 = first.getSeq[Double](first.fieldIndex("vector")).toVector
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(v0(0)) - inv) < 0.01 &&
      math.abs(math.abs(v0(1)) - inv) < 0.01 && math.abs(v0(2)) < 0.1)
    // orthonormality across the returned components
    val r1 = comps.filter(col("component") === 1L).head()
    val v1 = r1.getSeq[Double](r1.fieldIndex("vector")).toVector
    assert(math.abs(v0.zip(v1).map { case (a, b) => a * b }.sum) < 1e-9)
    assert(math.abs(v0.map(x => x * x).sum - 1.0) < 1e-9)
    // projection of a known row: coords = per-component dot products
    val pr = Embeddings.project(df, comps)
      .filter(col("vec_id") === 1L).head()
    val projected = pr.getSeq[Double](pr.fieldIndex("coords")).toVector
    val x = rows.head._2.map(_.toDouble)
    val expect0 = x.zip(v0).map { case (a, b) => a * b }.sum
    assert(math.abs(projected.head - expect0) < 1e-4)
    TrackedCaches.release()
  }

  test("whitened projection has unit variance per component") {
    val rows = (1 to 400).map { i =>
      val t = (i - 200.5).toFloat / 10f
      val u = ((i * 53) % 41 - 20).toFloat / 4f
      (i.toLong, Seq(t + u, t - u, 0.3f * t))
    }
    val df = vecDf(rows)
    val comps = Embeddings.pca(df, k = 2)
    val coords = Embeddings.project(df, comps, whiten = true)
      .select(explode(col("coords")).as("c")).as[Double].collect()
    // pool both components: each is unit-variance, so the pooled
    // variance is 1 as well (means are ~0 by construction)
    val n = coords.length
    val mean = coords.sum / n
    val variance = coords.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    assert(math.abs(variance - 1.0) < 0.05,
      s"whitened pooled variance $variance should be ~1")
    TrackedCaches.release()
  }

  test("centroidDrift: scaled slice keeps cosine 1, orthogonal slice 0, " +
      "missing reference drops everything") {
    val df = Seq(
      (1L, Seq(1f, 0f), "ref"), (2L, Seq(3f, 0f), "ref"),
      (3L, Seq(4f, 0f), "scaled"), // mean (4,0) ∥ ref mean (2,0)
      (4L, Seq(0f, 2f), "ortho"))
      .toDF("vec_id", "embedding", "slice_col")
    val out = Embeddings.centroidDrift(df, "slice_col", "ref")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("cos_to_ref"))).toMap
    assert(out == Map("ref" -> ((2L, 1.0)), "scaled" -> ((1L, 1.0)),
      "ortho" -> ((1L, 0.0))))
    assert(Embeddings.centroidDrift(df, "slice_col", "absent").isEmpty)
  }

  test("covariance: ragged vectors fail loudly; dim cap enforced") {
    val ragged = vecDf(Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f, 3f))))
    intercept[Exception] { Embeddings.covariance(ragged).collect() }
    val ok = vecDf(Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(4f, 5f, 6f))))
    intercept[Exception] { Embeddings.covariance(ok, maxDim = 2).collect() }
  }

  test("randomProjection: zero vector maps to zero, projection is " +
    "deterministic and repartition-invariant") {
    val vs = vecDf(Seq((1L, Seq(0f, 0f, 0f, 0f)),
      (2L, Seq(0.5f, 1.0f, -0.5f, 2.0f))))
    def run(d: org.apache.spark.sql.DataFrame) =
      Embeddings.randomProjection(d, k = 4, dim = 4)
        .orderBy("vec_id", "dim").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val a = run(vs)
    assert(a.filter(_._1 == 1L).forall(_._3 == 0.0))
    assert(a == run(vs.repartition(5)))
  }

  test("randomProjection: exact linearity on dyadic inputs (decimal " +
    "terms terminate)") {
    // 0.5-multiples × m/10000 components terminate within 12 decimal
    // digits, so quantization is exact and proj(2x) = 2·proj(x) exactly
    val x = Seq(0.5f, -1.5f, 2.0f, 1.0f)
    val vs = vecDf(Seq((1L, x), (2L, x.map(_ * 2))))
    val out = Embeddings.randomProjection(vs, k = 6, dim = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    (0 until 6).foreach { p =>
      assert(math.abs(out((2L, p)) - 2.0 * out((1L, p))) <= 2e-6,
        s"dim $p: ${out((2L, p))} vs 2×${out((1L, p))}")
    }
  }

  test("randomProjection preserves norms on average (JL contract)") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
      .filter(org.apache.spark.sql.functions.col("vec_id") < 100)
    val orig = emb.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(v => v * v.toDouble).sum
    }.toMap
    val proj = Embeddings.randomProjection(emb, k = 16, dim = 64)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(r => { val v = r.getDouble(2); v * v }).sum).toMap
    val ratios = orig.keys.toSeq.filter(k => orig(k) > 0)
      .map(k => proj(k) / orig(k))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.4, s"mean norm ratio $mean")
  }

  test("pcaCheck: invariants hold with wide margin on real data; a " +
    "corrupted spectrum order is caught") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val rows = Embeddings.pcaCheck(emb, k = 4).orderBy("component").collect()
    assert(rows.length == 4)
    val n = emb.filter(org.apache.spark.sql.functions
      .col("embedding").isNotNull).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == n)
      // spec floors sit an order of magnitude INSIDE the q136 gate
      // thresholds so erosion is visible here before the board flips
      assert(r.getAs[Double]("norm_err") < 1e-10)
      assert(r.getAs[Double]("max_cross") < 1e-10)
      assert(r.getAs[Double]("eig_drop") >= 0.0)
      assert(r.getAs[Double]("var_rel_err") < 1e-5)
    }
    // eigenvalues strictly descend on this corpus — the monotone check
    // is non-vacuous (a shuffled spectrum would yield a negative drop)
    assert(rows.drop(1).forall(_.getAs[Double]("eig_drop") > 0.0))
  }

  test("cosineHistogram: collapse piles every pair in the top bin") {
    import spark.implicits._
    val collapsed = (0L until 10L).map(i => (i, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.cosineHistogram(collapsed, bins = 20)
      .as[(Long, Long)].collect()
    assert(out.toSeq === Seq((19L, 9L)), "n-1 pairs, all at cos=1")
  }

  test("cosineHistogram: orthogonal pairs land in the center bin") {
    import spark.implicits._
    // alternate two orthogonal axes by md5-rank parity is not
    // controllable; instead make EVERY pair orthogonal via distinct
    // one-hot axes — any pairing has cosine 0 → bin 10
    val oneHot = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == i) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val out = Embeddings.cosineHistogram(oneHot, bins = 20)
      .as[(Long, Long)].collect()
    assert(out.toSeq === Seq((10L, 7L)))
  }

  test("cosineHistogram: pair count is n-1 and bins validated") {
    import spark.implicits._
    val vs = (0L until 25L).map(i =>
      (i, Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.cosineHistogram(vs, bins = 4)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_pairs"))
      .head.getLong(0) === 24L)
    assert(out.filter("bin < 0 OR bin > 3").count() === 0)
    intercept[IllegalArgumentException] {
      Embeddings.cosineHistogram(vs, bins = 0)
    }
  }

  test("geometryCard: hand-computed envelope, μ-norm and anisotropy") {
    import spark.implicits._
    val vs = Seq((1L, Seq(3f, 0f)), (2L, Seq(1f, 2f)),
      (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val r = Embeddings.geometryCard(vs).head()
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Long]("d") == 2L)
    // norms² 9 and 5 → mean 7; μ = (2, 1) → ‖μ‖² = 5; 5/7 = 0.714286
    assert(r.getAs[Double]("mean_norm2") == 7.0)
    assert(r.getAs[Double]("mu_norm2") == 5.0)
    assert(r.getAs[Double]("anisotropy") == 0.714286)
    assert(r.getAs[Double]("min_norm2") == 5.0)
    assert(r.getAs[Double]("max_norm2") == 9.0)
  }
}
