package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpecBase {

  import spark.implicits._

  test("rangeRank equals the window row_number, groups spanning partitions") {
    // 3 groups × 200 rows across 8 range partitions -> every group spans
    // several physical partitions and the offset arithmetic is exercised
    val df = (1 to 600).map(i => (s"g${i % 3}", (i * 37) % 601, i.toLong))
      .toDF("g", "v", "id").repartition(5)
    val got = Ranking.rangeRank(df, Seq("g"), Seq("v", "id"), "rk",
        numPartitions = 8)
      .select("g", "id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"), col("id"))).cast("long"))
      .select("g", "id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    TrackedCaches.release()
  }

  test("rangeRank with no groups is a global row_number") {
    val df = (1 to 100).map(i => ((i * 13) % 101, i.toLong)).toDF("v", "id")
    val got = Ranking.rangeRank(df, Nil, Seq("v"), "rk", numPartitions = 4)
      .select("v", "rk").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // v values are distinct 1..100 shuffled: rank of v must be v
    assert(got.forall { case (v, rk) => rk == v.toLong })
    TrackedCaches.release()
  }

  test("rangeRank is deterministic under input repartitioning") {
    val df = (1 to 300).map(i => (s"g${i % 2}", i * 7 % 301, i.toLong))
      .toDF("g", "v", "id")
    def ranks(d: org.apache.spark.sql.DataFrame) =
      Ranking.rangeRank(d, Seq("g"), Seq("v", "id"), "rk", numPartitions = 6)
        .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = ranks(df)
    val b = ranks(df.repartition(11))
    assert(a == b)
    TrackedCaches.release()
  }

  test("equiDepthBins reproduces ntile(k) exactly, including uneven fill") {
    // n=103, k=5 -> ntile sizes 21,21,21,20,20
    val df = (1 to 103).map(i => ((i * 59) % 103, i.toLong)).toDF("v", "id")
    val got = Ranking.equiDepthBins(df, "v", Seq("id"), k = 5)
      .select("v", "id", "bin").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("bin",
        (ntile(5).over(Window.orderBy(col("v"), col("id"))) - 1).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    TrackedCaches.release()
  }

  test("quantileTransform equals percent_rank per group; singleton group -> 0") {
    val df = ((1 to 50).map(i => ("a", (i * 7 % 53).toDouble, i.toLong)) :+
      (("solo", 9.0, 99L))).toDF("g", "v", "id")
    val got = Ranking.quantileTransform(df, "v", Seq("g"), Seq("id"))
      .collect().map(r => r.getLong(2) -> r.getAs[Double]("q")).toMap
    val want = df.withColumn("q", round(percent_rank().over(
        Window.partitionBy(col("g")).orderBy(col("v"), col("id"))), 6))
      .collect().map(r => r.getLong(2) -> r.getAs[Double]("q")).toMap
    assert(got == want)
    assert(got(99L) == 0.0)
    TrackedCaches.release()
  }

  test("rangeRankMulti: coarse and fine sets in one pass, fine groups interleaved") {
    // tags alternate within each value run, so the (g, tag) groups are
    // NOT contiguous under the shared (g, v, tag, id) sort
    val df = (1 to 240).map { i =>
      (s"g${i % 2}", if (i % 3 == 0) "a" else "b", (i * 31) % 97, i.toLong)
    }.toDF("g", "tag", "v", "id").repartition(5)
    val got = Ranking.rangeRankMulti(df, Seq("g", "v", "tag", "id"),
        Seq(Seq("g"), Seq("g", "tag")), Seq("ra", "ro"), numPartitions = 7)
      .collect().map(r => r.getLong(3) -> (r.getLong(4), r.getLong(5))).toMap
    val wAll = Window.partitionBy(col("g"))
      .orderBy(col("v"), col("tag"), col("id"))
    val wOwn = Window.partitionBy(col("g"), col("tag"))
      .orderBy(col("v"), col("id"))
    val want = df
      .withColumn("ra", row_number().over(wAll).cast("long"))
      .withColumn("ro", row_number().over(wOwn).cast("long"))
      .collect().map(r => r.getLong(3) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
    TrackedCaches.release()
  }

  test("exactQuantiles: value at rank ceil(p*n), exact on a known sequence") {
    // values 1..100 shuffled: decile p has value ceil(p*100)
    val df = (1 to 100).map(i => ((i * 37) % 101, i.toLong)).toDF("v", "id")
      .filter(col("v") =!= 0)
    val n = df.count() // 100 distinct values 1..100? (i*37)%101 covers 1..100
    assert(n == 100)
    val out = Ranking.exactQuantiles(df, "v", Seq("id"),
        Seq(0.1, 0.25, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(out == Map(0.1 -> 10, 0.25 -> 25, 0.5 -> 50, 1.0 -> 100))
    TrackedCaches.release()
  }

  test("gini: equality is 0, full concentration is (n-1)/n, linear ramp 0.25") {
    val df = (Seq.fill(4)(1.0).map(("eq", _)) ++
      Seq(0.0, 0.0, 0.0, 4.0).map(("conc", _)) ++
      Seq(1.0, 2.0, 3.0, 4.0).map(("ramp", _)))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("g", "v", "id")
    val out = Ranking.gini(df, "v", Seq("g"), Seq("id"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(out == Map("eq" -> 0.0, "conc" -> 0.75, "ramp" -> 0.25))
    TrackedCaches.release()
  }

  test("gini: negative values error, zero-sum groups are dropped") {
    val bad = Seq(("g", -1.0, 1L), ("g", 2.0, 2L)).toDF("g", "v", "id")
    val ex = intercept[Exception] {
      Ranking.gini(bad, "v", Seq("g"), Seq("id")).collect()
    }
    assert(ex.getMessage.contains("non-negative"))
    TrackedCaches.release()
    val zero = Seq(("z", 0.0, 1L), ("z", 0.0, 2L), ("ok", 1.0, 3L),
      ("ok", 3.0, 4L)).toDF("g", "v", "id")
    val out = Ranking.gini(zero, "v", Seq("g"), Seq("id"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("ok"))
    TrackedCaches.release()
  }

  test("lorenz: hand-computed cumulative shares; final share is exactly 1") {
    // values 1..4, k=2: bottom half {1,2} holds 3/10, top half {3,4} 7/10
    val df = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val out = Ranking.lorenz(df, "v", Seq("id"), k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("bin_sum"), r.getAs[Double]("cum_share")))
      .toMap
    assert(out(0L) == ((2L, 3.0, 0.3)))
    assert(out(1L) == ((2L, 7.0, 1.0)))
    TrackedCaches.release()
  }

  test("rangeRankMulti fails fast past maxDriverStateRows instead of " +
      "collecting a high-cardinality group set onto the driver") {
    // 500 distinct groups over 4 partitions can exceed a cap of 100
    val df = (1 to 500).map(i => (s"g$i", i.toLong)).toDF("g", "id")
    val e = intercept[IllegalArgumentException] {
      Ranking.rangeRankMulti(df, Seq("g", "id"), Seq(Seq("g")), Seq("rk"),
        numPartitions = 4, maxDriverStateRows = 100)
    }
    assert(e.getMessage.contains("maxDriverStateRows"))
    assert(e.getMessage.contains("OVER (PARTITION BY"))
    TrackedCaches.release()
  }

  test("spearman: rangeRank path and window path agree exactly") {
    val df = (1 to 500)
      .map(i => (s"f${i % 3}", (i * 31 % 211).toDouble, (i * 17 % 199).toDouble, i.toLong))
      .toDF("g", "x", "y", "id")
    def rho(rr: Boolean) =
      Profile.spearman(df, "x", "y", Seq("g"), Seq("id"), rangeRanks = rr)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("spearman_rho")).toMap
    assert(rho(true) == rho(false))
    TrackedCaches.release()
  }

  test("quantileNormalize: same-shape groups at different scales land " +
    "on the identical pooled marginal (hand-computed)") {
    import spark.implicits._
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("B", 4L, 10.0), ("B", 5L, 20.0), ("B", 6L, 30.0))
      .toDF("g", "id", "v")
    val out = Ranking.quantileNormalize(df, Seq("g"), "v", Seq("id"))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("v")) ->
        r.getAs[Double]("normalized")).toMap
    // pooled sorted: 1,2,3,10,20,30; both groups target ranks 2,4,6
    assert(out(("A", 1.0)) == 2.0 && out(("A", 2.0)) == 10.0 &&
      out(("A", 3.0)) == 30.0)
    assert(out(("B", 10.0)) == 2.0 && out(("B", 20.0)) == 10.0 &&
      out(("B", 30.0)) == 30.0)
    TrackedCaches.release()
  }

  test("quantileNormalize: unequal group sizes, order preserved, nulls " +
    "dropped, repartition-invariant") {
    import spark.implicits._
    val df = Seq(("A", 1L, Option(5.0)), ("A", 2L, Option(1.0)),
      ("B", 3L, Option(7.0)), ("B", 4L, Option(2.0)),
      ("B", 5L, Option(9.0)), ("B", 6L, Option(4.0)),
      ("B", 7L, Option.empty[Double]))
      .toDF("g", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Ranking.quantileNormalize(d, Seq("g"), "v", Seq("id"))
        .orderBy("g", "id").collect()
        .map(r => (r.getAs[String]("g"), r.getAs[Long]("id"),
          r.getAs[Double]("normalized"))).toSeq
    val a = run(df)
    assert(a.size == 6) // null row dropped
    val m = a.map(t => (t._1, t._2) -> t._3).toMap
    // within-group order preserved: v(id2)=1 < v(id1)=5 in A; B's chain
    assert(m(("A", 2L)) < m(("A", 1L)))
    assert(m(("B", 4L)) < m(("B", 6L)) && m(("B", 6L)) < m(("B", 3L)) &&
      m(("B", 3L)) < m(("B", 5L)))
    assert(a == run(df.repartition(5)))
    TrackedCaches.release()
  }
}
