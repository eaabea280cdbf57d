package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, TrackedCaches}

/** Continuous near-dup detection against a PERSISTED MinHash index —
  * the streaming closure of the incremental-dedup loop: each
  * micro-batch (1) probes the index for near-dup pairs — batch ×
  * already-indexed corpus plus within-batch — via
  * [[Dedup.nearDupsFromIndex]], then (2) GROWS the index with
  * [[Dedup.appendMinhashIndex]] so every later batch dedups against
  * this one. Only the arriving batch is ever signed; the indexed
  * corpus is never re-read beyond its band keys.
  *
  * Semantics notes, both deliberate:
  *  - `onPairs` runs BEFORE the append and must MATERIALIZE its frame
  *    (write/collect) synchronously — the append stage-and-swaps the
  *    index dirs the pair frame lazily reads, so a deferred
  *    materialization would read a moved directory.
  *  - Failure-replayed batches re-append (foreachBatch is
  *    at-least-once), but the append itself is IDEMPOTENT since r14:
  *    [[Dedup.appendMinhashIndex]]'s `dedupeBatch` guard drops
  *    already-indexed ids, so a replay is a no-op and the index is
  *    effectively-once — strictly stronger than the reference append
  *    sink's documented at-least-once (SURVEY §2A13). The reported
  *    PAIRS still re-emit on replay (deterministically identical).
  *
  * Per-batch internal caches (shingle arrays, candidate frames) are
  * scoped-released so a long-running stream holds no growing cache.
  */
object StreamingNearDup {

  def start(stream: DataFrame, indexDir: String,
            onPairs: (DataFrame, Long) => Unit,
            threshold: Double, idCol: String = "doc_id",
            textCol: String = "text", shingleSize: Int = 3,
            numHashes: Int = 32, rowsPerBand: Int = 4,
            maxBucket: Long = 1000L,
            checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        TrackedCaches.scopedRelease {
          processBatch(batch.sparkSession, batch.toDF(), indexDir,
            onPairs, batchId, threshold, idCol, textCol, shingleSize,
            numHashes, rowsPerBand, maxBucket)
        }
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** The per-micro-batch body of [[start]] — probe, report, append —
    * exposed so composed sinks ([[StreamingIngest]]'s ledgered path)
    * reuse the exact same sequence instead of re-stating it. The
    * caller owns cache scoping (`TrackedCaches.scopedRelease`) and the
    * `onPairs` materialization contract documented on [[start]].
    */
  def processBatch(spark: org.apache.spark.sql.SparkSession,
                   batch: DataFrame, indexDir: String,
                   onPairs: (DataFrame, Long) => Unit, batchId: Long,
                   threshold: Double, idCol: String = "doc_id",
                   textCol: String = "text", shingleSize: Int = 3,
                   numHashes: Int = 32, rowsPerBand: Int = 4,
                   maxBucket: Long = 1000L): Unit = {
    // §1.5 job labels: the per-batch probe/append job counts are THE
    // cost driver of the streaming ingest gates — label them so a job
    // profile attributes each job to its phase
    spark.sparkContext.setJobDescription(s"neardup b$batchId: probe")
    val pairs = Dedup.nearDupsFromIndex(spark, indexDir, batch, idCol,
      textCol, threshold, shingleSize, numHashes, rowsPerBand, maxBucket)
    onPairs(pairs, batchId)
    spark.sparkContext.setJobDescription(s"neardup b$batchId: append")
    Dedup.appendMinhashIndex(spark, indexDir, batch, idCol, textCol,
      shingleSize, numHashes, rowsPerBand, maxBucket)
    spark.sparkContext.setJobDescription(null)
  }
}
