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
}
