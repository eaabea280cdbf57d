package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operations a long-lived lake needs around the
  * query engine — starting with small-file compaction: streaming
  * ingests and per-executor writers leave thousands of KB-scale
  * parquet files whose open/footer costs dominate scans long before
  * data volume does (the classic small-file problem).
  */
object Maintenance {

  /** Rewrite a parquet directory as ~`targetFileBytes`-sized files:
    * output file count = ⌈Σ input bytes / target⌉. Returns that count.
    *
    * The listing is driver-side metadata — one entry per INPUT file,
    * bounded by the very problem being fixed, and never row data. The
    * rewrite itself is one round-robin shuffle of the directory's data:
    * a compaction IS a full rewrite by definition — at 100 TB you run
    * it per partition directory (date=…/source=…), never over the
    * whole table at once, which also keeps each shuffle bounded.
    * Compression ratios shift when row groups merge, so output sizes
    * track the target approximately, not exactly.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    val in = new Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(in)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    require(totalBytes > 0, s"no parquet data under $inDir")
    val n = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      .toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
