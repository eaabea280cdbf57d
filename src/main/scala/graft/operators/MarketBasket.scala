package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: for every unordered item pair,
  * exact support / confidence / lift over a (basket, item) relation —
  * the association-rules core (the A-priori candidate-counting step for
  * pair-sized itemsets, computed exactly rather than iteratively).
  *
  * Plan shape:
  *   - distinct (basket, item) — one shuffle on the pair;
  *   - pair generation is a SELF-JOIN ON THE BASKET KEY with `item_a <
  *     item_b`, so the blowup is Σ C(|basket|,2) — quadratic only in the
  *     (bounded) basket size, never in the corpus;
  *   - per-pair counts — one shuffle on (item_a, item_b), map-side
  *     combined;
  *   - single-item counts and the basket total are tiny aggregates that
  *     come back as BROADCAST joins / a literal cross join of one row.
  *
  * 100 TB story: the only large exchanges are keyed by basket and by
  * item pair. A pathological mega-basket (one basket with 10⁵ items)
  * would explode the self-join — `maxBasketSize` drops such baskets
  * up front (standard practice: a basket that large carries no
  * association signal).
  */
object MarketBasket {

  /** Shared pair scaffolding: per-pair co-occurrence counts joined with
    * both single-item counts and the one-row basket total — columns
    * (item_a, item_b, n_ab, n_a, n_b, n_baskets).
    */
  private def pairFrame(baskets: DataFrame, basketCol: String,
                        itemCol: String, minPairCount: Long,
                        maxBasketSize: Int): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    // a cap below 2 silently filters EVERY pair-capable basket — that is
    // always a caller typo, fail fast like the minPairCount guard
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val items = baskets
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val sized = items
      .withColumn("__bn", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("b"))))
      .filter(col("__bn") <= maxBasketSize)
      .drop("__bn")
    val nBaskets = sized.select(countDistinct(col("b")).as("n_baskets"))
    val itemCounts = sized.groupBy(col("i")).agg(count(lit(1)).as("c"))
    val a = sized.select(col("b"), col("i").as("item_a"))
    val c = sized.select(col("b"), col("i").as("item_b"))
    val pairCounts = a.join(c, Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    // itemCounts is one row per DISTINCT ITEM — data-cardinality, not
    // structurally small (a 1e8-item catalog would OOM a forced broadcast).
    // Plain equi-joins; AQE picks broadcast when the catalog actually fits.
    // nBaskets stays an explicit broadcast: it is one row by construction.
    pairCounts
      .join(itemCounts.select(col("i").as("item_a"),
        col("c").as("n_a")), Seq("item_a"))
      .join(itemCounts.select(col("i").as("item_b"),
        col("c").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
  }

  def pairStats(baskets: DataFrame, basketCol: String, itemCol: String,
                minPairCount: Long = 1L,
                maxBasketSize: Int = 1000): DataFrame =
    pairFrame(baskets, basketCol, itemCol, minPairCount, maxBasketSize)
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        // widen BEFORE multiplying: n_a * n_b in long overflows past ~3e9
        // frequencies; double keeps the (already-rounded) quotient exact
        // for the magnitudes that matter
        round(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))

  /** "Related items": each item's `k` nearest neighbors by
    * co-occurrence cosine `n_ab / √(n_a·n_b)` — the classic item-item
    * collaborative-filtering similarity. Built on the same capped pair
    * scaffolding as [[pairStats]]; the pair set is symmetrized
    * (each unordered pair feeds both endpoints' lists) and the top-k
    * cut is a per-item `row_number` window — items are NUMEROUS, so the
    * window keeps full parallelism (this is its regime; TopKAgg would
    * constrain item ids to bigint for no scale win here). Ties break on
    * neighbor id. Cosine is one double tree over exact counts (widened
    * before the multiply, the lift overflow lesson), rounded 6 dp.
    */
  def itemNeighbors(baskets: DataFrame, basketCol: String, itemCol: String,
                    k: Int, minPairCount: Long = 1L,
                    maxBasketSize: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pf = pairFrame(baskets, basketCol, itemCol, minPairCount,
      maxBasketSize)
    val sym = pf.select(col("item_a").as("item"),
        col("item_b").as("neighbor"), col("n_ab"),
        col("n_a").as("n_i"), col("n_b").as("n_j"))
      .unionByName(pf.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("n_ab"),
        col("n_b").as("n_i"), col("n_a").as("n_j")))
      .withColumn("__cos", col("n_ab").cast("double") /
        sqrt(col("n_i").cast("double") * col("n_j").cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("__cos").desc, col("neighbor"))
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("rank"), col("n_ab"),
        round(col("__cos"), 6).as("cosine"))
  }
}
