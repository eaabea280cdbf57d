package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MarketBasketSpec extends SparkSpecBase {

  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a} 4:{b,d}
  private val baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"),
    (4L, "b"), (4L, "d"))
    .toDF("basket", "item")

  test("pairStats: hand-checked support, confidence, lift") {
    val out = MarketBasket.pairStats(baskets, "basket", "item")
      .collect()
      .map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
      .toMap
    // n=4 baskets; a:3 b:3 c:1 d:1
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d")))
    assert(out(("a", "b")) == (2L, 0.5, round6(2.0 / 3), round6(8.0 / 9)))
    assert(out(("a", "c")) == (1L, 0.25, round6(1.0 / 3), round6(4.0 / 3)))
    assert(out(("b", "d")) == (1L, 0.25, round6(1.0 / 3), round6(4.0 / 3)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("duplicate (basket, item) rows collapse before counting") {
    val dup = baskets.union(Seq((1L, "a"), (2L, "b")).toDF("basket", "item"))
    val out = MarketBasket.pairStats(dup, "basket", "item")
      .filter(col("item_a") === "a" && col("item_b") === "b").head()
    assert(out.getAs[Long]("n_ab") == 2L)
  }

  test("minPairCount prunes rare pairs") {
    val out = MarketBasket.pairStats(baskets, "basket", "item",
      minPairCount = 2L).collect()
    assert(out.map(r => (r.getString(r.fieldIndex("item_a")),
      r.getString(r.fieldIndex("item_b")))).toSet == Set(("a", "b")))
  }

  test("maxBasketSize drops mega-baskets entirely (and from the totals)") {
    val mega = (1 to 50).map(i => (9L, s"i$i")).toDF("basket", "item")
    val out = MarketBasket.pairStats(baskets.union(mega), "basket", "item",
      maxBasketSize = 10)
    // no pair involves a mega-basket item, and n_baskets stays 4
    assert(!out.collect().exists(_.getAs[String]("item_a").startsWith("i")))
    val ab = out.filter(col("item_a") === "a" && col("item_b") === "b").head()
    assert(ab.getAs[Double]("support") == 0.5)
  }

  test("itemNeighbors: symmetrized cosine ranking with k cut") {
    // a:3 b:3 c:1 d:1; pairs ab:2 ac:1 bc:1 bd:1
    // cos(a,b) = 2/3; cos(a,c) = cos(b,c) = cos(b,d) = 1/√3
    val out = MarketBasket.itemNeighbors(baskets, "basket", "item", k = 2)
      .collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("neighbor"), r.getAs[Double]("cosine")))
      .toMap
    val r3 = round6(1.0 / math.sqrt(3.0))
    assert(out(("a", 1L)) == ("b", round6(2.0 / 3)))
    assert(out(("a", 2L)) == ("c", r3))
    // b's neighbors: a at 2/3, then c before d on the neighbor tiebreak
    assert(out(("b", 1L)) == ("a", round6(2.0 / 3)))
    assert(out(("b", 2L)) == ("c", r3))
    // c and d each see their sole partners; no rank-3 rows anywhere
    assert(out(("c", 1L))._1 == "a" || out(("c", 1L))._1 == "b")
    assert(!out.keySet.exists(_._2 > 2L))
  }
}
