package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Similarity, TrackedCaches}

/** Continuous ANN ingest against a PERSISTED IVF index — the vector
  * sibling of [[StreamingNearDup]]: each arriving micro-batch of
  * embeddings (1) probes the index for its top-k nearest
  * already-indexed neighbors ([[Similarity.ivfTopKFromIndex]] — the
  * semantic-near-dup / dedup-before-embed-store readout), then
  * (2) GROWS the index with [[Similarity.appendIvfIndex]], whose
  * decimal-moment merge keeps the grown index bit-identical to a
  * rebuild over everything seen (q327's exactness), so every later
  * batch probes the full history.
  *
  * Semantics (shared with [[StreamingNearDup]]):
  *  - `onHits` runs BEFORE the append and must MATERIALIZE its frame
  *    synchronously — the append stage-and-swaps the centroid frames
  *    the probe lazily reads.
  *  - foreachBatch is at-least-once, and the append is replay-IDEMPOTENT
  *    (`dedupeBatch` drops already-indexed ids), so the INDEX is
  *    effectively-once; replayed batches re-emit their hits
  *    (deterministically identical).
  *
  * The index must be a `portable = true` build (the moments frame is
  * the append contract). Per-batch internal caches are scope-released.
  */
object StreamingAnnIngest {

  def start(stream: DataFrame, indexDir: String,
            onHits: (DataFrame, Long) => Unit,
            k: Int = 5, nProbe: Int = 2,
            coarseCol: String = "label", idCol: String = "vec_id",
            vecCol: String = "embedding",
            checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        TrackedCaches.scopedRelease {
          val hits = Similarity.ivfTopKFromIndex(spark, indexDir,
            batch.toDF(), k, nProbe, idCol, vecCol)
          onHits(hits, batchId)
          Similarity.appendIvfIndex(spark, indexDir, batch.toDF(),
            coarseCol, idCol, vecCol)
        }
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
