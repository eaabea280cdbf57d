package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpecBase {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side lands on key 1 (the skew case)
    val big = spark.range(0, 10000)
      .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (10L, "cold"), (20L, "cold2")).toDF("k", "v")

    val plain = big.join(small, "k").agg(count(lit(1)), sum("payload")).head()
    val salted = SkewJoin.saltedJoin(big, small, "k", saltFactor = 8)
      .agg(count(lit(1)), sum("payload")).head()
    assert(salted == plain)
  }

  test("rows with keys absent from the small side drop (inner semantics)") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "b")).toDF("k", "x")
    val small = Seq((1L, "only")).toDF("k", "v")
    val out = SkewJoin.saltedJoin(big, small, "k", 4).collect()
    assert(out.length == 1 && out(0).getAs[String]("x") == "a")
  }
}
