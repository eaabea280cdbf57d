package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpecBase {

  test("bucketed tables join without a shuffle exchange") {
    val base = Files.createTempDirectory("bucketed").toString
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    Bucketed.save(li, "bucketed_li", s"$base/li", "l_orderkey", 4)
    Bucketed.save(ord, "bucketed_ord", s"$base/ord", "o_orderkey", 4)

    val joined = Bucketed.read(spark, "bucketed_li")
      .join(Bucketed.read(spark, "bucketed_ord"),
        col("l_orderkey") === col("o_orderkey"))
    joined.count() // materialize (AQE finalizes the plan)
    assert(Bucketed.shuffleExchangeCount(joined) == 0,
      "bucket-co-located join must not shuffle:\n" +
        joined.queryExecution.executedPlan)

    // and the answer matches the unbucketed join
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
  }
}
