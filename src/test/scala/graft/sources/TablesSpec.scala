package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.types.TimestampType

class TablesSpec extends SparkSpecBase {

  test("loadCached routes events through the ns-timestamp loader") {
    // a raw parquet read of events either crashes (PARQUET_TYPE_ILLEGAL)
    // or yields bigint-nanos ts depending on session conf history; the
    // generic loader must dispatch to Tables.events for EVERY caller
    val df = Tables.loadCached(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.selectExpr("count(ts)").head().getLong(0) > 0)
  }
}
