package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{LogReg, TrackedCaches}

/** The ingest-hygiene pipeline assembled: every arriving document runs
  * the full curation gauntlet IN ORDER before it may join the corpus —
  *
  *   1. quality gate ([[StreamingQualityFilter.keep]]; stateless σ(w·z)
  *      under the batch-trained model),
  *   2. benchmark decontamination ([[StreamingDecon.keep]]; stateless
  *      sorted-intersection against the eval shingle set),
  *   3. near-dup detection + index growth ([[StreamingNearDup]]; per
  *      micro-batch probe of the persisted MinHash index, then
  *      append — later batches dedup against this one).
  *
  * Stages 1–2 are stateless transformations (no state store); stage
  * 3 owns the sink. The composition mirrors the BATCH pipeline's stage
  * order ([[graft.operators.Curation.stages]]) so an ingest stream and
  * a backfill batch apply the SAME policy — the property a curation
  * owner actually needs when the two paths must agree.
  *
  * `onLedger` threads the per-batch disposition sink through the
  * stream — the streaming twin of
  * [[graft.operators.Curation.disposition]]: when set, every arriving
  * document of every micro-batch is accounted for as one
  * `(idCol, dropped_at)` row — `s1_quality` / `s2_decontaminated` /
  * `kept` — BEFORE survivors probe the index, so "why did my document
  * vanish from the stream" has the same answer surface as the batch
  * backfill (same stage labels, same first-drop semantics; a doc the
  * quality model cannot score — null feature — is an s1 exit, exactly
  * as the batch filter treats its null probability). The callback owns
  * durability (write/collect synchronously, like `onPairs`). Without a
  * ledger the stages drop rows as they always did — the flag columns
  * are never computed, so the default path pays nothing.
  */
object StreamingIngest {

  def pipeline(stream: DataFrame, model: LogReg.Model,
               evalDocs: DataFrame, indexDir: String,
               onPairs: (DataFrame, Long) => Unit,
               qualityThreshold: Double = 0.5,
               deconShingleSize: Int = 8,
               nearDupThreshold: Double = 0.5,
               idCol: String = "doc_id",
               textCol: String = "text",
               onLedger: Option[(DataFrame, Long) => Unit] = None)
      : StreamingQuery = {
    // Warm the eval-shingle frame ONCE at stream setup: every
    // micro-batch's decon check rebuilds the identical one-row
    // aggregate plan, so persisting it here lets the CacheManager
    // substitute the cached frame per batch instead of re-running the
    // eval-side explode+distinct+collect each time. Registered OUTSIDE
    // the per-batch scopedRelease, so batch scopes dedupe against it
    // and never sweep it; the session-wide release reclaims it.
    TrackedCaches.track(
      StreamingDecon.evalShingles(evalDocs, deconShingleSize, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    onLedger match {
    case None =>
      val cleaned = StreamingDecon.keep(
        StreamingQualityFilter.keep(stream, model, qualityThreshold),
        evalDocs, deconShingleSize, minShared = 1L, idCol, textCol)
      StreamingNearDup.start(cleaned, indexDir, onPairs,
        nearDupThreshold, idCol, textCol)
    case Some(ledger) =>
      // the ledgered path runs stages 1–2 as FLAGS inside foreachBatch
      // (batch-land — the same expressions, same survivor sets as the
      // composed keep() path): quality is judged on every row, decon
      // only on quality survivors (an s1 exit needs no shingle pass —
      // first-drop semantics keep the extra cost at zero for the rows
      // the ledger exists to explain)
      val writer = stream.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          TrackedCaches.scopedRelease {
            val q = batch.toDF().withColumn("__qk",
              coalesce(model.probability >= qualityThreshold, lit(false)))
            // flagged feeds BOTH the ledger union and the survivor set
            // handed to processBatch — persist it (tracked, so the
            // scopedRelease above frees it with the batch) so the
            // quality-score + decon broadcast-join subtree runs once
            // per micro-batch, not twice
            val flagged = TrackedCaches.track(StreamingDecon.flag(
              q.filter(col("__qk")).drop("__qk"),
              evalDocs, deconShingleSize, minShared = 1L, idCol, textCol)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
            batch.sparkSession.sparkContext
              .setJobDescription(s"ingest b$batchId: ledger")
            ledger(
              q.filter(!col("__qk"))
                .select(col(idCol), lit("s1_quality").as("dropped_at"))
                .unionByName(flagged.select(col(idCol),
                  when(col("contaminated"), lit("s2_decontaminated"))
                    .otherwise(lit("kept")).as("dropped_at"))),
              batchId)
            StreamingNearDup.processBatch(batch.sparkSession,
              flagged.filter(!col("contaminated"))
                .drop("n_shared", "contaminated"),
              indexDir, onPairs, batchId, nearDupThreshold, idCol, textCol)
          }
          ()
        }
      writer.start()
    }
  }
}
