package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.types.TimestampType

class TablesSpec extends SparkSpecBase {

  test("loadCached routes events through the ts-normalizing loader") {
    // the generator's physical ts type has varied across data drops
    // (bigint nanos, timestamp[us]/NTZ); the generic loader must
    // dispatch to Tables.events for EVERY caller so downstream code
    // always sees session-zone TimestampType
    val df = Tables.loadCached(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.selectExpr("count(ts)").head().getLong(0) > 0)
  }
}
