package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join lever at 100 TB: two
  * tables bucketed (and sorted) on the same key with the same bucket
  * count join WITHOUT a shuffle exchange on either side (each bucket
  * pairs 1:1 across tables), so a terabyte-scale fact⋈fact equi-join
  * costs zero network movement at query time. The shuffle is paid once,
  * at write time.
  *
  * Bucketing in Spark requires a catalog table (`saveAsTable`); plain
  * `parquet(path)` writes cannot carry bucket metadata.
  */
object Bucketed {

  def save(df: DataFrame, table: String, path: String,
           bucketCol: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Number of shuffle exchanges in the frame's executed plan — 0 for a
    * properly co-located bucketed join (diagnostic for specs/audits).
    */
  def shuffleExchangeCount(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
}
