package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style partitioned layout helpers — the partition-pruning lever at
  * 100 TB: data written as `path/col=value/...` directories lets Catalyst
  * turn a filter on the partition column into a directory-listing prune
  * (`PartitionFilters` in the scan node), so a one-day query over years
  * of daily-partitioned data reads one directory, not the table.
  */
object Partitioned {

  def save(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
