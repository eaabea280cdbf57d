package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpecBase {

  test("trainCodebooks: deterministic across runs and repartitioning; " +
      "codes bounded by ks; centroid dim = d/m") {
    val emb = Tables.embeddings(spark, sf())
    def key(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("s", "code").collect().map(_.toSeq).toSeq
    val cb1 = Pq.trainCodebooks(emb, m = 8, ks = 16, iters = 2)
    val cb2 = Pq.trainCodebooks(emb.repartition(7), m = 8, ks = 16, iters = 2)
    assert(key(cb1) == key(cb2))
    val rows = cb1.collect()
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 16))
    assert(rows.forall(_.getSeq[Double](2).length == 8))
    assert(rows.map(_.getInt(0)).toSet == (0 until 8).toSet)
  }

  test("encode: every vector gets one code per subspace") {
    val emb = Tables.embeddings(spark, sf())
    val cb = Pq.trainCodebooks(emb, m = 8, ks = 16, iters = 1)
    val codes = Pq.encode(emb, cb, m = 8)
    val n = emb.filter(col("embedding").isNotNull).count()
    assert(codes.count() == n * 8)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 8L)
      .count() == 0)
  }

  test("ragged or empty corpora are rejected loudly, not quantized wrong") {
    import spark.implicits._
    val ragged = Seq((1L, Seq.fill(64)(0.1f)), (2L, Seq.fill(32)(0.1f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e1 = intercept[IllegalArgumentException](Pq.trainCodebooks(ragged))
    assert(e1.getMessage.contains("ragged"))
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e2 = intercept[IllegalArgumentException](Pq.trainCodebooks(empty))
    assert(e2.getMessage.contains("non-null vector"))
  }

  test("adcTopK on quantizable data: high recall@5 vs true dot top-5, " +
      "small ADC error") {
    // Exactly-quantizable data: each subspace draws from 4 prototype
    // subvectors with a pseudo-random per-vector profile and NO jitter.
    // Lloyd then converges to the prototypes exactly (duplicate inits
    // tie to the lowest code and the empties drop), ADC scores EQUAL
    // the true dots, and top-5 ranking matches brute force including
    // the (score, id) tie order. On isotropic random data ADC cannot
    // rank fine dot differences, and within a tight cluster the
    // ordering is sub-quantization noise — both inherent to PQ (q149's
    // oracle gates exactness on such data; this gates usefulness on
    // data PQ is FOR).
    import spark.implicits._
    def proto(s: Int, c: Int, j: Int): Float =
      (((s * 131 + c * 17 + j * 7) % 101) / 101.0f) - 0.5f
    val rows = (0 until 300).map { i =>
      val v = (0 until 8).flatMap { s =>
        val c = (i * 3 + s * 7 + (i % 5) * (s + 1)) % 4
        (0 until 8).map(j => proto(s, c, j))
      }
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val queries = emb.filter(pmod(col("vec_id"), lit(50L)) === 0L)
    val adc = Pq.adcTopK(emb, queries, k = 5, iters = 4)
    // true dot top-5 per query (small data - direct computation)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("cv"))
    val truth = q.join(c, col("qid") =!= col("nid"))
      .withColumn("dot", graft.functions.VectorMath.dot(col("qv"), col("cv")))
    val top = truth.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val got = adc.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert(got.keySet == top.keySet)
    // .toSeq: keys is a Set and a mapped Set would collapse equal
    // per-query recalls before the sum
    val recall = got.keys.toSeq.map(k2 =>
      (got(k2) intersect top(k2)).size.toDouble / 5.0).sum / got.size
    // random top-5 of 300 would recall ~0.017
    assert(recall >= 0.9, s"ADC recall@5 $recall on clustered data; " +
      got.keys.toSeq.sorted.map(k2 =>
        s"q$k2 got=${got(k2).toSeq.sorted} top=${top(k2).toSeq.sorted}")
        .mkString("; "))
    // ADC error: per scored pair, |approx - true| averaged
    val err = adc.join(truth,
        adc("query_id") === truth("qid") && adc("neighbor_id") === truth("nid"))
      .select(avg(abs(col("approx_dot") - col("dot"))).cast("double"))
      .collect()(0).getDouble(0)
    assert(err < 1e-6, s"mean ADC error $err should vanish on " +
      "exactly-quantizable data")
  }

  test("ivfAdcResidualTopK: residual codes beat raw-vector codes at " +
      "EQUAL (m, ks) budget on offset-dominated clusters") {
    // 4 coarse cells with LARGE per-cell offsets; within-cell structure
    // drawn from 4 residual prototypes per subspace with EQUAL counts
    // per cell, so every cell's mean residual is identical and the
    // residual value set per subspace stays 4 — residual PQ at ks = 8
    // can represent it exactly, while raw subvectors take 4 cells × 4
    // protos = 16 distinct values that 8 codes must merge lossily.
    import spark.implicits._
    def proto(s: Int, p: Int, j: Int): Double =
      (((s * 131 + p * 17 + j * 7) % 101) / 101.0) - 0.5
    def offset(c: Int, s: Int, j: Int): Double =
      5.0 * ((((c * 37 + s * 11 + j * 3) % 7)) - 3)
    val rows = (0 until 64).map { i =>
      val cell = i % 4
      val v = (0 until 8).flatMap { s =>
        val p = ((i / 4) + s) % 4
        (0 until 8).map(j => (offset(cell, s, j) + proto(s, p, j)).toFloat)
      }
      (i.toLong, cell.toLong, v)
    }
    val emb = rows.toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val queries = emb.filter(pmod(col("vec_id"), lit(17L)) === 0L) // 4 cells
    // nProbe = nlist removes pruning: the comparison isolates pure
    // quantization quality at identical code budget
    val res = Pq.ivfAdcResidualTopK(emb, queries, k = 5, nProbe = 4,
      ks = 8, iters = 3)
    val raw = Pq.ivfAdcTopK(emb, queries, k = 5, nProbe = 4, ks = 8,
      iters = 3)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("cv"))
    val truth = q.join(c, col("qid") =!= col("nid"))
      .withColumn("dot", graft.functions.VectorMath.dot(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("dot").desc, col("nid"))))
      .filter(col("rn") <= 5).select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (k2, v) => k2 -> v.map(_._2).toSet }
    def recall(d: org.apache.spark.sql.DataFrame): Double = {
      val got = d.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
      got.keys.toSeq.map(k2 =>
        (got(k2) intersect truth(k2)).size.toDouble / 5.0).sum / got.size
    }
    val (rRes, rRaw) = (recall(res), recall(raw))
    assert(rRes >= rRaw,
      s"residual recall $rRes must be >= raw recall $rRaw at equal budget")
    assert(rRes >= 0.9, s"residual recall $rRes on exactly-residual-" +
      s"quantizable data (raw was $rRaw)")
    assert(rRaw <= 0.9, s"fixture not discriminating: raw recall $rRaw — " +
      "offsets no longer dominate, tighten the fixture")
  }

  test("ivfAdcTopK with nProbe = nlist IS adcTopK (pruning-free " +
      "identity); nProbe = 1 returns only nearest-cell neighbors") {
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(pmod(col("vec_id"), lit(100L)) === 0L)
    val nlist = emb.select(countDistinct(col("label"))).collect()(0)
      .getLong(0).toInt
    def key(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val all = Pq.ivfAdcTopK(emb, queries, k = 5, nProbe = nlist, iters = 2)
    val adc = Pq.adcTopK(emb, queries, k = 5, iters = 2)
    assert(key(all) == key(adc))
    // nProbe = 1: every neighbor must live in its query's top cell
    val one = Pq.ivfAdcTopK(emb, queries, k = 5, nProbe = 1, iters = 2)
    val cents = Similarity.coarseCentroids(emb, "label", "embedding",
      portable = true)
    val topCell = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      .crossJoin(cents)
      .withColumn("cos",
        graft.functions.VectorMath.cosine(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cell"))))
      .filter(col("rn") === 1).select(col("query_id"), col("cell"))
    val labels = emb.select(col("vec_id").as("neighbor_id"),
      col("label").as("nlabel"))
    val escapees = one.join(labels, "neighbor_id").join(topCell, "query_id")
      .filter(col("nlabel") =!= col("cell")).count()
    assert(escapees == 0L)
  }

  test("stalenessAudit: an in-distribution batch reads ratio ~ 1 and " +
      "does not fire; a drifted batch fires stale = 1; dimension " +
      "mismatch is rejected loudly") {
    val emb = Tables.embeddings(spark, sf())
    val build = emb.filter(pmod(col("vec_id"), lit(3L)) =!= 0L)
    val inDist = emb.filter(pmod(col("vec_id"), lit(3L)) === 0L)
    val dir = java.nio.file.Files.createTempDirectory("pq_stale").toString
    Pq.writePqIndex(build, dir)
    val ok = Pq.stalenessAudit(spark, dir, build, inDist,
      ratioThreshold = 2.0).head()
    assert(ok.getAs[Long]("stale") == 0L)
    val okRatio = ok.getAs[Double]("err_ratio")
    assert(okRatio > 0.5 && okRatio < 2.0)
    // drift: shift every component by +3 — far from every centroid
    val drifted = inDist.withColumn("embedding",
      expr("transform(embedding, v -> v + CAST(3.0 AS FLOAT))"))
    val bad = Pq.stalenessAudit(spark, dir, build, drifted,
      ratioThreshold = 2.0).head()
    assert(bad.getAs[Long]("stale") == 1L)
    assert(bad.getAs[Double]("err_ratio") > okRatio)
    // the monitored symptom: frozen-codebook search quality on the
    // drifted slice collapses — its ADC scores rank the TRUE nearest
    // (by exact dot) worse than the in-distribution batch's do. Checked
    // via reconstruction error being the upper bound ADC inherits; the
    // numeric agreement drop is covered by the adcTopK recall spec.
    val mism = inDist.withColumn("embedding", slice(col("embedding"), 1, 32))
    val e = intercept[IllegalArgumentException] {
      Pq.stalenessAudit(spark, dir, build, mism)
    }
    assert(e.getMessage.contains("dsub"))
  }
}
