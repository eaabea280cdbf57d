package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Fingerprint

/** Continuous corpus fingerprinting: maintain the per-partition
  * `(n_rows, checksum)` frame of a landed corpus as data streams in,
  * WITHOUT ever rescanning history — each micro-batch contributes its
  * own [[Fingerprint.partitionFingerprints]] and merges by plain
  * addition, which is exact because the checksum is an order-free
  * decimal sum (checksum(A ∪ B) = checksum(A) + checksum(B)).
  *
  * State is versioned parquet under `stateDir/v=<batchId+1>`; each batch
  * reads the newest version ≤ its own batchId as the merge base, so a
  * RETRIED batch rebuilds its version from the same base instead of
  * double-counting itself — idempotent under Structured Streaming's
  * at-least-once foreachBatch contract. The state frame is
  * partition-cardinality-sized and never touches the driver.
  *
  * Downstream, [[Fingerprint.diffFingerprints]] against a snapshot's
  * stored fingerprints answers "which partitions changed since the
  * snapshot" from the two state frames alone.
  */
object StreamingFingerprint {

  private[streaming] def latestVersion(spark: org.apache.spark.sql.SparkSession,
                                       stateDir: String,
                                       upTo: Long): Option[Long] = {
    val dir = new java.io.File(stateDir)
    if (!dir.isDirectory) None
    else dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ <= upTo)
      .sorted.lastOption
  }

  private[streaming] def mergeState(state: DataFrame, delta: DataFrame,
                                    partCols: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(partCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("checksum")).cast("decimal(38,0)").as("checksum"))

  /** Attach the maintenance sink to a streaming frame. Returns the
    * started query; the newest `stateDir/v=*` is always a complete,
    * readable fingerprint frame.
    */
  def maintain(stream: DataFrame, partCols: Seq[String],
               hashCols: Seq[String], stateDir: String,
               checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val delta = Fingerprint.partitionFingerprints(batch, partCols, hashCols)
        val merged = latestVersion(spark, stateDir, upTo = batchId) match {
          case Some(v) =>
            mergeState(spark.read.parquet(s"$stateDir/v=$v"), delta, partCols)
          case None => mergeState(delta.limit(0), delta, partCols)
        }
        merged.write.mode("overwrite").parquet(s"$stateDir/v=${batchId + 1}")
      }
      .start()
}
