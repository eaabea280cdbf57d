package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpecBase {

  test("equals the row_number window formulation on random scored rows") {
    import spark.implicits._
    // deterministic pseudo-random scores, spread over 16 partitions so the
    // partial-aggregate merge path actually runs
    val scored = spark.range(0, 5000).repartition(16)
      .select((col("id") % 40).as("query_id"),
        col("id").as("neighbor_id"),
        (xxhash64(col("id")) % 1000).cast("double").as("cosine"))
    val agg = scored.groupBy("query_id")
      .agg(TopKAgg.topK(col("cosine"), col("neighbor_id"), 3).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val win = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(agg == win)
  }

  test("ties break on smaller id; fewer rows than k yields all rows") {
    import spark.implicits._
    val scored = Seq(
      (1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.9),
      (2L, 42L, 0.1)).toDF("query_id", "neighbor_id", "cosine")
    val out = scored.groupBy("query_id")
      .agg(TopKAgg.topK(col("cosine"), col("neighbor_id"), 2).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("pos"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0, 7L), (1L, 1, 3L), (2L, 0, 42L)))
  }
}
