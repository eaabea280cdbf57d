package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LogReg

/** The ingest-hygiene pipeline assembled: every arriving document runs
  * the full curation gauntlet IN ORDER before it may join the corpus —
  *
  *   1. quality gate ([[StreamingQualityFilter.keep]]; stateless σ(w·z)
  *      under the batch-trained model),
  *   2. benchmark decontamination ([[StreamingDecon.keep]]; stateless
  *      sorted-intersection against the eval shingle set),
  *   3. near-dup detection + index growth ([[StreamingNearDup.start]];
  *      per micro-batch probe of the persisted MinHash index, then
  *      append — later batches dedup against this one).
  *
  * Stages 1–2 are plain stream transformations (no state store); stage
  * 3 owns the sink. The composition mirrors the BATCH pipeline's stage
  * order ([[graft.operators.Curation.stages]]) so an ingest stream and
  * a backfill batch apply the SAME policy — the property a curation
  * owner actually needs when the two paths must agree.
  */
object StreamingIngest {

  def pipeline(stream: DataFrame, model: LogReg.Model,
               evalDocs: DataFrame, indexDir: String,
               onPairs: (DataFrame, Long) => Unit,
               qualityThreshold: Double = 0.5,
               deconShingleSize: Int = 8,
               nearDupThreshold: Double = 0.5,
               idCol: String = "doc_id",
               textCol: String = "text"): StreamingQuery = {
    val cleaned = StreamingDecon.keep(
      StreamingQualityFilter.keep(stream, model, qualityThreshold),
      evalDocs, deconShingleSize, minShared = 1L, idCol, textCol)
    StreamingNearDup.start(cleaned, indexDir, onPairs,
      nearDupThreshold, idCol, textCol)
  }
}
