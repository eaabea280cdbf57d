package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LogReg

/** Streaming application of a batch-trained quality classifier — the
  * deployment half of the [[graft.operators.LogReg]] train-offline /
  * apply-anywhere split: a curation job fits the model on the labeled
  * corpus, and the ingest stream scores and gates every arriving
  * document with the SAME standardization and weights.
  *
  * Everything here is STATELESS per-row column arithmetic (the model is
  * plain driver literals baked into the expression), so the stage needs
  * no state store, no watermark, and composes with any output mode or
  * downstream stateful stage. Scores are bit-identical to the batch
  * scorer's — [[StreamingQualityFilterSpec]] pins streaming-vs-batch
  * score equality row for row.
  *
  * Scale: per-row codegen'd math on executors; at any ingest rate the
  * cost is one σ(w·z(x)) per document — there is nothing to shuffle.
  */
object StreamingQualityFilter {

  /** Score a document stream: adds `probCol` (6-dp probability) and
    * `predCol` (p ≥ threshold). Rows with a null feature are dropped —
    * they cannot be scored, and silently passing them would defeat the
    * gate.
    */
  def score(stream: DataFrame, model: LogReg.Model,
            threshold: Double = 0.5,
            probCol: String = "p_quality",
            predCol: String = "pred_quality"): DataFrame = {
    val p = model.probability
    stream.filter(model.featureCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn(probCol, round(p, 6))
      .withColumn(predCol, p >= threshold)
  }

  /** The filter form: only documents the model keeps (p ≥ threshold)
    * survive, scored column retained for downstream audit.
    */
  def keep(stream: DataFrame, model: LogReg.Model,
           threshold: Double = 0.5,
           probCol: String = "p_quality"): DataFrame =
    score(stream, model, threshold, probCol, "__keep")
      .filter(col("__keep")).drop("__keep")
}
