package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{PhashIndex, TrackedCaches}

/** Continuous MULTIMODAL near-dup detection against a persisted
  * perceptual-hash index — [[StreamingNearDup]]'s contract on the media
  * domain: each micro-batch of assets (1) probes the index for
  * perceptual near-dup pairs — batch × already-indexed corpus plus
  * within-batch — via [[PhashIndex.nearDups]] (real dHash for images,
  * real envelope hash for PCM WAV, decoded ONCE per arriving asset),
  * then (2) GROWS the index with [[PhashIndex.append]] so every later
  * batch dedups against this one. Stored payloads are never re-decoded;
  * the index frames the stream touches are (long, long) keys.
  *
  * The [[StreamingNearDup]] semantics carry over verbatim: `onPairs`
  * must materialize synchronously (the append swaps the dirs the pair
  * frame lazily reads), and a failure-replayed batch re-appends as a
  * no-op ([[PhashIndex.append]]'s `dedupeBatch` guard), so the index is
  * effectively-once while the reported pairs re-emit deterministically.
  */
object StreamingPhashDedup {

  def start(stream: DataFrame, indexDir: String,
            onPairs: (DataFrame, Long) => Unit,
            maxHamming: Int = 3, idCol: String = "asset_id",
            maxChunkBucket: Long = 100000L,
            checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        TrackedCaches.scopedRelease {
          processBatch(batch.sparkSession, batch.toDF(), indexDir,
            onPairs, batchId, maxHamming, idCol, maxChunkBucket)
        }
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** The per-micro-batch body — probe, report, append — exposed for
    * composed sinks, mirroring [[StreamingNearDup.processBatch]].
    */
  def processBatch(spark: org.apache.spark.sql.SparkSession,
                   batch: DataFrame, indexDir: String,
                   onPairs: (DataFrame, Long) => Unit, batchId: Long,
                   maxHamming: Int = 3, idCol: String = "asset_id",
                   maxChunkBucket: Long = 100000L): Unit = {
    val pairs = PhashIndex.nearDups(spark, indexDir, batch, idCol,
      maxHamming, maxChunkBucket)
    onPairs(pairs, batchId)
    PhashIndex.append(spark, indexDir, batch, idCol, maxChunkBucket)
  }
}
