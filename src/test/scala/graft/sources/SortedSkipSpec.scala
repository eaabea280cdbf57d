package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Range-partitioned sorted parquet layout: each file (and so each row
  * group) owns a contiguous key range, so a pushed-down literal predicate
  * skips whole row groups via parquet min/max stats. Plain parquet skips
  * at the ROW-GROUP level, not the listing level — `numFiles` stays
  * constant and the evidence is the scan's output-row count: sorted
  * layout → only the row groups owning the range are read; round-robin
  * layout → every row group spans the full range and nothing skips.
  * (File-level skipping needs table-format stats — Delta/Iceberg — on
  * top of exactly this sorted layout.) q87 gates the layout's
  * correctness; this spec pins the skipping itself.
  */
class SortedSkipSpec extends SparkSpecBase {

  import spark.implicits._

  private val dir = "/tmp/graft_test_sorted_skip"

  private def scanRows(df: DataFrame): Long = {
    df.collect() // metrics fill on execution
    val scan = df.queryExecution.executedPlan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collectFirst { case f: FileSourceScanExec => f }
      case f: FileSourceScanExec => Some(f)
    }.flatten
    assert(scan.isDefined, df.queryExecution.executedPlan.toString)
    assert(scan.get.metadata("PushedFilters").contains("LessThan"),
      scan.get.metadata("PushedFilters")) // predicate reached the reader
    scan.get.metrics("numOutputRows").value
  }

  private def writeLayout(path: String, sorted: Boolean): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val df = (0L until 100000L).map(i => (i, s"row$i")).toDF("k", "v")
    val laid =
      if (sorted) df.repartitionByRange(20, col("k")).sortWithinPartitions(col("k"))
      else df.repartition(20) // round-robin: every file spans the key range
    laid.write.parquet(path)
  }

  test("sorted layout skips row groups under a pushed literal predicate; unsorted reads all") {
    writeLayout(dir, sorted = true)
    writeLayout(s"$dir-unsorted", sorted = false)
    // 5% of the keyspace
    val sortedRows = scanRows(
      spark.read.parquet(dir).filter(col("k") < 5000L))
    val unsortedRows = scanRows(
      spark.read.parquet(s"$dir-unsorted").filter(col("k") < 5000L))
    // sorted: only the file(s)/row group(s) owning [0, 5000) are read
    assert(sortedRows <= 12000L, s"sorted scan emitted $sortedRows rows")
    // unsorted: min/max stats prune nothing - the full table is read
    assert(unsortedRows == 100000L, s"unsorted scan emitted $unsortedRows rows")
    // both layouts return exactly the matching rows
    assert(spark.read.parquet(dir).filter(col("k") < 5000L).count() == 5000L)
    assert(spark.read.parquet(s"$dir-unsorted")
      .filter(col("k") < 5000L).count() == 5000L)
  }
}
