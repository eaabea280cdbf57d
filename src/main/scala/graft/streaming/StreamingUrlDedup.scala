package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

import graft.operators.{TrackedCaches, WebCuration}

/** Continuous crawl-frontier URL dedup against a persisted seen-set —
  * the crawl-family member of the streaming-ingest shelf (text q334,
  * ANN q338, media q365): each micro-batch of (id, url) rows
  * (1) probes the index ([[WebCuration.newUrls]]: canonicalize, dedup
  * within the batch, anti-join the stored seen set), (2) reports the
  * NEW canonical URLs — the pages worth fetching/keeping — and
  * (3) GROWS the index so every later batch dedups against this one.
  *
  * `onNew` must materialize synchronously (the append writes into the
  * directory the new-URL frame lazily reads). The new-URL frame is
  * persisted for the batch so the canonicalize+anti-join subtree runs
  * once, not once per sink (the report and the append share it), and
  * released per batch under [[TrackedCaches.scopedRelease]].
  *
  * A failure-replayed batch (foreachBatch is at-least-once) finds all
  * its URLs already seen: it reports ZERO new URLs and appends
  * nothing — unlike the near-dup streams, BOTH the index and the
  * report stream are effectively-once here, because the report itself
  * is defined against the index state.
  */
object StreamingUrlDedup {

  def start(stream: DataFrame, indexDir: String,
            onNew: (DataFrame, Long) => Unit,
            urlCol: String = "url", idCol: String = "doc_id",
            checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        TrackedCaches.scopedRelease {
          processBatch(batch.sparkSession, batch.toDF(), indexDir,
            onNew, batchId, urlCol, idCol)
        }
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** The per-micro-batch body — probe, report, append — exposed for
    * composed sinks, mirroring [[StreamingPhashDedup.processBatch]]. */
  def processBatch(spark: org.apache.spark.sql.SparkSession,
                   batch: DataFrame, indexDir: String,
                   onNew: (DataFrame, Long) => Unit, batchId: Long,
                   urlCol: String = "url",
                   idCol: String = "doc_id"): Unit = {
    val fresh = TrackedCaches.track(
      WebCuration.newUrls(spark, indexDir, batch, urlCol, idCol)
        .persist(StorageLevel.MEMORY_AND_DISK))
    onNew(fresh, batchId)
    // the probe already holds exactly the rows to add — append the
    // persisted frame rather than re-running the anti-join
    fresh.write.mode("append").parquet(s"$indexDir/seen")
  }
}
