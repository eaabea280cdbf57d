package graft.sources

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PartitionedSpec extends SparkSpecBase {

  /** The files a frame's scan ACTUALLY reads at execution time (post
    * partition-pruning) — `df.inputFiles` would report the whole
    * relation. Test-side diagnostic: collects to the driver, so it lives
    * here, not in the operator surface.
    */
  private def filesActuallyRead(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(input_file_name()).distinct().collect().map(_.getString(0)).toSeq

  test("a filter on the partition column prunes to one directory") {
    val base = Files.createTempDirectory("partitioned").toString
    val ev = Tables.events(spark, sf())
    Partitioned.save(ev, base, Seq("event_type"))

    val pruned = Partitioned.read(spark, base)
      .filter(col("event_type") === "purchase")
    val files = filesActuallyRead(pruned)
    assert(files.nonEmpty)
    assert(files.forall(_.contains("event_type=purchase")),
      s"scan touched non-matching partitions: ${files.filterNot(_.contains("event_type=purchase"))}")

    // PartitionFilters carries the predicate (not PushedFilters — the
    // column doesn't exist inside the files)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))

    val expected = ev.filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
  }
}
