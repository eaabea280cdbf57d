package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints `explain("formatted")` for
  * representative queries so plan properties (PushedFilters, pruned
  * ReadSchema, broadcast joins, WholeStageCodegen spans) can be audited.
  * Usage: `sbt "runMain graft.Plans [sfDir] [queryName ...]"`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_filter_project", "q03_revenue_by_nation", "q10_sessions",
        "q14_minhash_neardups", "q18_ann_bruteforce")
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n===================== $name =====================")
          fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
