package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key carries a large
  * share of the big side's rows, a plain shuffle join sends that key's
  * whole volume to one task. Salting splits each hot key into
  * `saltFactor` sub-keys — the big side picks a deterministic per-row
  * salt, the small side is replicated `saltFactor` times — so the hot
  * key's rows spread over `saltFactor` tasks.
  *
  * Prefer AQE's skew-join handling (`spark.sql.adaptive.skewJoin.*`, on
  * by default) when it applies: it only splits oversized SORT-MERGE join
  * partitions post-shuffle. Explicit salting remains the tool when the
  * skew sits inside one KEY (AQE cannot split a single key's partition
  * for correctness of joins that need co-location) or for
  * aggregate-then-join shapes.
  *
  * The salt must differ across a hot key's ROWS, not its values — hashing
  * the row contents would collapse identical duplicate rows (common for a
  * hot key after a projection) onto one salt and silently undo the
  * mitigation. It is derived from `monotonically_increasing_id()`: which
  * salt a row gets varies with physical partitioning, but the JOIN RESULT
  * is salt-independent (every salt matches the replicated small side), so
  * the output stays deterministic.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltCol: Column = pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
    val b = big.withColumn("__salt", saltCol)
    val s = small
      .withColumn("__salt_i", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt_i").cast("long")).drop("__salt_i")
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
