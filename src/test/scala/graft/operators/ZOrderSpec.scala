package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Z-order layout = 2-D row-group skipping: files own rectangles of
  * (x, y) space, so a selective literal filter on EITHER key prunes;
  * a linear (x, y) sort serves only x. Mirrors SortedSkipSpec's
  * numOutputRows evidence.
  */
class ZOrderSpec extends SparkSpecBase {

  import spark.implicits._

  private val dir = "/tmp/graft_test_zorder"

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collectFirst { case f: FileSourceScanExec => f }
      case f: FileSourceScanExec => Some(f)
    }.flatten
    assert(scan.isDefined, df.queryExecution.executedPlan.toString)
    assert(scan.get.metadata("PushedFilters").contains("LessThan"),
      scan.get.metadata("PushedFilters"))
    scan.get.metrics("numOutputRows").value
  }

  // a full 256×256 grid: every (x, y) cell once
  private def grid = spark.range(0L, 65536L)
    .select((col("id") / 256L).cast("long").as("x"),
      pmod(col("id"), lit(256L)).as("y"))

  test("zValue interleaves bits (hand-checked Morton codes)") {
    val out = grid.limit(0).sparkSession.range(1)
      .select(
        ZOrder.zValue(lit(0L), lit(0L)).as("z00"),
        ZOrder.zValue(lit(1L), lit(0L)).as("z10"),
        ZOrder.zValue(lit(0L), lit(1L)).as("z01"),
        ZOrder.zValue(lit(3L), lit(5L)).as("z35"),
        ZOrder.zValue(lit(65535L), lit(65535L)).as("zmax"))
      .head()
    assert(out.getLong(0) == 0L)
    assert(out.getLong(1) == 1L)
    assert(out.getLong(2) == 2L)
    // x=3 (011) even bits → 0b000101; y=5 (101) odd bits → 0b100010;
    // z = 0b100111 = 39
    assert(out.getLong(3) == 39L)
    assert(out.getLong(4) == 0xFFFFFFFFL)
  }

  test("z-ordered layout prunes on BOTH dimensions; linear sort only on " +
    "the leading key") {
    val zDir = s"$dir-z"
    val linDir = s"$dir-lin"
    ZOrder.writeZOrdered(grid, zDir, "x", "y", numFiles = 32)
    grid.repartitionByRange(32, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(linDir)
    // 1/16 slice of each dimension
    val zX = scanRows(spark.read.parquet(zDir).filter(col("x") < 16L))
    val zY = scanRows(spark.read.parquet(zDir).filter(col("y") < 16L))
    val linX = scanRows(spark.read.parquet(linDir).filter(col("x") < 16L))
    val linY = scanRows(spark.read.parquet(linDir).filter(col("y") < 16L))
    // linear layout: x-filter prunes hard, y-filter reads the world
    assert(linX <= 8192L, s"linear x-scan emitted $linX rows")
    assert(linY == 65536L, s"linear y-scan emitted $linY rows")
    // z layout: both filters prune (rectangles, not stripes); allow for
    // range-boundary straddle but demand at least half the table skipped
    assert(zX <= 32768L, s"z x-scan emitted $zX rows")
    assert(zY <= 32768L, s"z y-scan emitted $zY rows")
    // and the content is bit-identical regardless of layout
    assert(spark.read.parquet(zDir).filter(col("y") < 16L).count() == 4096L)
    assert(spark.read.parquet(linDir).filter(col("y") < 16L).count() == 4096L)
    assert(spark.read.parquet(zDir).count() == 65536L)
  }

  test("wide key spans quantize monotonically (span > 2^16 still clusters)") {
    val wide = spark.range(0L, 20000L)
      .select((col("id") * lit(1000000L)).as("x"), col("id").as("y"))
    val wDir = s"$dir-wide"
    ZOrder.writeZOrdered(wide, wDir, "x", "y", numFiles = 8)
    assert(spark.read.parquet(wDir).count() == 20000L)
    val hit = scanRows(spark.read.parquet(wDir)
      .filter(col("x") < 1000000000L)) // first 5% of the span
    assert(hit <= 10000L, s"wide-span x-scan emitted $hit rows")
  }

  test("full-Long key span fails fast instead of hanging the driver") {
    // a hash-valued key spanning nearly the whole Long range overflows
    // the span arithmetic; the old shift loop spun forever on it
    val hashy = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      ZOrder.writeZOrdered(hashy, s"$dir-overflow", "x", "y", numFiles = 2)
    }
    assert(e.getMessage.contains("exceeds Long range"))
  }

  test("empty and all-null-key inputs write without clustering") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    ZOrder.writeZOrdered(empty, s"$dir-empty", "x", "y", numFiles = 4)
    assert(spark.read.parquet(s"$dir-empty").count() == 0L)
    val nulls = Seq((Option.empty[Long], Option.empty[Long]),
      (Option.empty[Long], Option.empty[Long])).toDF("x", "y")
    ZOrder.writeZOrdered(nulls, s"$dir-nulls", "x", "y", numFiles = 4)
    assert(spark.read.parquet(s"$dir-nulls").count() == 2L)
  }
}
