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
}
