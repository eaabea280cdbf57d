package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {

  import spark.implicits._

  // 3 sources with overlapping key ranges; true distinct = 6000
  private lazy val rows = (0 until 4000).map(i => ("a", i.toLong)) ++
    (2000 until 6000).map(i => ("b", i.toLong)) ++
    (0 until 1000).map(i => ("c", i.toLong))
  private lazy val df = rows.toDF("source", "key")

  test("per-source estimates land within the HLL error bound") {
    val est = Sketches.distinctSketch(df, "key", Seq("source"))
      .select(col("source"), col("estimate"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("a" -> 4000L, "b" -> 4000L, "c" -> 1000L)
    truth.foreach { case (s, t) =>
      assert(math.abs(est(s) - t).toDouble / t < 0.05,
        s"source $s: estimate ${est(s)} vs true $t")
    }
  }

  test("union of per-source sketches equals the one-pass whole-corpus " +
      "sketch exactly (register-wise merge, not re-estimation)") {
    val perSource = Sketches.distinctSketch(df, "key", Seq("source"))
    val merged = Sketches.mergeSketches(perSource).head().getAs[Long]("estimate")
    val onePass = Sketches.distinctSketch(
      df.withColumn("g", lit(1)), "key", Seq("g"))
      .head().getAs[Long]("estimate")
    assert(merged == onePass,
      s"merged $merged != one-pass $onePass — union must be lossless")
    assert(math.abs(merged - 6000L) / 6000.0 < 0.05, s"merged $merged")
  }

  test("sketch bytes survive a parquet round trip (the incremental-" +
      "maintenance contract)") {
    val dir = java.nio.file.Files.createTempDirectory("sketches").toString
    val perSource = Sketches.distinctSketch(df, "key", Seq("source"))
    perSource.select("source", "sketch").write.mode("overwrite").parquet(dir)
    val reloaded = Sketches.mergeSketches(spark.read.parquet(dir))
      .head().getAs[Long]("estimate")
    val direct = Sketches.mergeSketches(perSource)
      .head().getAs[Long]("estimate")
    assert(reloaded == direct)
  }

  test("null keys are excluded (count_distinct semantics)") {
    val withNulls = df.union(
      Seq(("a", Option.empty[Long]), ("a", Option.empty[Long]))
        .toDF("source", "key"))
    val est = Sketches.distinctSketch(withNulls, "key", Seq("source"))
      .filter(col("source") === "a").head().getAs[Long]("estimate")
    val estNoNull = Sketches.distinctSketch(df, "key", Seq("source"))
      .filter(col("source") === "a").head().getAs[Long]("estimate")
    assert(est == estNoNull)
  }

  test("freqSketch point estimates are exact on a low-collision sketch " +
    "and never undercount") {
    import spark.implicits._
    val rows = (1 to 50).flatMap(i => Seq.fill(i)(("s", s"k$i")))
    val sk = Sketches.freqSketch(rows.toDF("source", "key"), "key",
      Seq("source"), eps = 0.0001)
    val est = Sketches.estimateFrequencies(sk, Seq("k1", "k25", "k50", "nope"))
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Long]("estimate")).toMap
    // width 1/eps = 10000 cells, 50 keys: collisions ~0 → exact
    assert(est("k1") == 1L && est("k25") == 25L && est("k50") == 50L)
    assert(est("nope") == 0L)
  }

  test("freqSketch merge of parts is byte-identical to a one-pass build " +
    "and survives parquet") {
    import spark.implicits._
    val all = (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(("s", s"k$i")))
    val (p1, p2) = all.splitAt(all.length / 2)
    def build(rs: Seq[(String, String)]) =
      Sketches.freqSketch(rs.toDF("source", "key"), "key", Seq("source"))
    val onePass = build(all).head().getAs[Array[Byte]]("sketch")
    val parts = build(p1).union(build(p2))
    val dir = "/tmp/graft_test_cms"
    parts.write.mode("overwrite").parquet(dir)
    val merged = Sketches.mergeFreqSketches(
      spark.read.parquet(dir), Seq("source")).head()
      .getAs[Array[Byte]]("sketch")
    assert(java.util.Arrays.equals(onePass, merged))
  }

  test("freqSketch: whole-frame merge and the eps*N overcount bound") {
    import spark.implicits._
    // a coarse sketch (eps 0.01 → 100 cells) over 500 distinct keys:
    // collisions guaranteed, estimates may exceed truth but never by
    // more than ~eps·N at the sketch's confidence, and never undercount
    val rows = (1 to 500).map(i => ("s", s"key$i"))
    val sk = Sketches.freqSketch(rows.toDF("source", "key"), "key",
      Seq("source"), eps = 0.01)
    val est = Sketches.estimateFrequencies(
      Sketches.mergeFreqSketches(sk), Seq("key7", "key300"))
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Long]("estimate")).toMap
    est.values.foreach { e =>
      assert(e >= 1L, s"CMS undercounted: $e")
      assert(e <= 1L + math.ceil(0.01 * 500 * 3).toLong, s"overcount $e")
    }
  }

  // ---------------------------------------------------- quantile (GK)

  // 3 sources over distinct value ranges so per-source and union
  // quantiles genuinely differ; n = 7000, values 0..6999 shuffled by
  // a fixed multiplicative permutation (insertion order must not be
  // sorted — GK compresses as it goes)
  private lazy val qrows = (0 until 7000)
    .map(i => (i * 2654435761L % 7000).toInt)
    .zipWithIndex.map { case (v, i) =>
      (if (v < 3000) "a" else if (v < 5000) "b" else "c", v.toDouble)
    }
  private lazy val qdf = qrows.toDF("source", "x")

  /** rank-error check: the estimate's true rank must be within
    * ε·n (+1 slack for interpolation at the boundary) of p·n.
    */
  private def assertWithinRank(est: Double, p: Double, eps: Double,
                               sorted: Seq[Double]): Unit = {
    val n = sorted.size
    val rank = sorted.count(_ <= est)
    assert(math.abs(rank - p * n) <= eps * n + 1,
      s"q=$p: estimate $est has rank $rank of $n (bound ${eps * n})")
  }

  test("quantileSketch estimates satisfy the GK rank-error law per group") {
    val eps = 0.01
    val est = Sketches.estimateQuantiles(
        Sketches.quantileSketch(qdf, "x", Seq("source"), eps),
        Seq(0.1, 0.5, 0.9))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Double]("q"),
        r.getAs[Double]("value")))
    val bySource = qrows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(est.length == 9)
    est.foreach { case (s, p, v) => assertWithinRank(v, p, eps, bySource(s)) }
  }

  test("merged per-source quantile sketches answer for the UNION within " +
    "the bound, with exact n") {
    val eps = 0.01
    val merged = Sketches.mergeQuantileSketches(
      Sketches.quantileSketch(qdf, "x", Seq("source"), eps))
    assert(merged.collect().head.getAs[Long]("n") == 7000L)
    val est = Sketches.estimateQuantiles(merged, Seq(0.25, 0.5, 0.75, 0.99))
      .collect().map(r => r.getAs[Double]("q") -> r.getAs[Double]("value"))
    val all = qrows.map(_._2).sorted
    est.foreach { case (p, v) => assertWithinRank(v, p, eps, all) }
  }

  test("quantile sketch bytes survive a parquet round trip with identical " +
    "estimates (the persisted-frame contract)") {
    val dir = java.nio.file.Files.createTempDirectory("gk_sketch").toString
    val sk = Sketches.quantileSketch(qdf, "x", Seq("source"))
    sk.write.mode("overwrite").parquet(dir)
    val probes = Seq(0.1, 0.5, 0.9)
    val before = Sketches.estimateQuantiles(sk, probes)
      .collect().map(r => (r.getString(0), r.getAs[Double]("q")) ->
        r.getAs[Double]("value")).toMap
    val after = Sketches.estimateQuantiles(
        spark.read.parquet(dir), probes)
      .collect().map(r => (r.getString(0), r.getAs[Double]("q")) ->
        r.getAs[Double]("value")).toMap
    assert(after == before, "estimates drifted across the parquet round trip")
  }

  test("quantile sketch: empty probe target yields null values, n stays 0") {
    val empty = Sketches.quantileSketch(
      qdf.filter(col("x") < -1), "x", Seq.empty)
    // groupBy().agg over zero rows still emits one row with an empty
    // sketch (count 0) — querying it must yield nulls, not a crash
    val est = Sketches.estimateQuantiles(empty, Seq(0.5)).collect()
    assert(est.length == 1 && est.head.isNullAt(est.head.fieldIndex("value")))
  }

  test("fromBytes rejects truncated or foreign binary with a named error " +
    "instead of a BufferUnderflow or a silently bogus sketch") {
    import graft.functions.QuantileSketchAgg
    val good = QuantileSketchAgg.toBytes(
      new org.apache.spark.sql.catalyst.util.QuantileSummaries(1000, 0.01))
    QuantileSketchAgg.fromBytes(good) // sanity: the real layout parses
    val cases = Seq(
      "truncated header" -> Array.fill[Byte](10)(1),
      "truncated body" -> good.dropRight(1),
      "foreign bytes" -> "not a sketch at all, just text".getBytes("UTF-8"))
    cases.foreach { case (label, bytes) =>
      val e = intercept[IllegalArgumentException](
        QuantileSketchAgg.fromBytes(bytes))
      assert(e.getMessage.contains("not a graft quantile sketch"), label)
    }
  }
}
