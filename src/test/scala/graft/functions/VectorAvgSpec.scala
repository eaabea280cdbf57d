package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VectorAvgSpec extends SparkSpecBase {

  test("element-wise mean across groups") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1f, 2f)), (0, Seq(3f, 4f)),
      (1, Seq(10f, 20f))).toDF("g", "v")
    val out = df.groupBy("g").agg(VectorAvg.vectorAvg(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(2.0, 3.0))
    assert(out(1) == Seq(10.0, 20.0))
  }

  test("null vectors are skipped; empty group yields empty centroid") {
    import spark.implicits._
    val df = Seq((0, Some(Seq(2f, 4f))), (0, None)).toDF("g", "v")
    val out = df.groupBy("g").agg(VectorAvg.vectorAvg(col("v")).as("c"))
      .head().getSeq[Double](1)
    assert(out == Seq(2.0, 4.0))
  }

  test("ragged vector lengths fail loudly instead of silently truncating") {
    import spark.implicits._
    val df = Seq((0, Seq(1f, 2f)), (0, Seq(3f))).toDF("g", "v")
    val e = intercept[org.apache.spark.SparkException] {
      df.groupBy("g").agg(VectorAvg.vectorAvg(col("v")).as("c")).collect()
    }
    // surfaces via reduce ("vector length") or merge ("buffer lengths")
    // depending on which partitions the two rows land in
    assert(e.getMessage.contains("vectorAvg: mismatched")
      || Option(e.getCause).exists(_.getMessage.contains("vectorAvg: mismatched")))
  }
}
