package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification with add-one smoothing
  * — the generative trained classifier next to the discriminative
  * [[LogReg]] and the rank-profile [[LangProfile]]:
  *
  *   score(doc, label) = ln P(label) + Σ_w c(doc, w) · ln P(w | label)
  *   P(w | label)      = (c(label, w) + 1) / (tokens(label) + |V|)
  *
  * with every log quantized ONCE to 6-dp micros, so per-document
  * scores are exact long arithmetic (order-free, ANSI-safe: |lp6| ≤
  * ~4e7 even at petabyte token counts, × doc length ≤ 1e5 stays far
  * under 2^63) and the DuckDB oracle replays bit-identically.
  *
  * Words the label never saw still score: the smoothed unknown-word
  * mass `u6(label) = q6(ln(1/(tokens+|V|)))` covers the unmatched
  * remainder `(n_doc − matched) · u6`, so every (doc, label) pair gets
  * a full-likelihood score — no label can silently drop from the
  * argmax (the guard [[LangProfile]] gets structurally, NB gets
  * arithmetically).
  *
  * Scale design (100 TB): the (label, word) likelihood table is
  * |labels| × |vocabulary| (Heaps-bounded); corpus work is one
  * (doc, word) count, one word-keyed join against that table, and one
  * map-side-combinable argmax `min(struct(−score, label))`. The label
  * grid comes from a broadcast ≤|labels|-row stats frame (schema-
  * bounded dimension, the nation/region precedent). No driver state.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no classifier; this extends the mandated text-analysis family
  * (SURVEY §2B4).
  */
object NaiveBayes {

  /** Classify every document against the corpus's own fitted model:
    * `(idCol, labelCol, pred_label, score6, correct)` — `score6` the
    * winning label's exact micro-nat log-score (BIGINT), `correct` a
    * BIGINT 1/0 against the labeled column. Ties break to the
    * lexicographically first label.
    */
  def classify(docs: DataFrame, idCol: String = "doc_id",
               labelCol: String = "lang",
               textCol: String = "text"): DataFrame = {
    val scored = scoredGrid(docs, idCol, labelCol, textCol)
    val best = scored.groupBy(col(idCol))
      .agg(min(struct((-col("score6")).as("ns"), col("__label"))).as("b"))
      .select(col(idCol), col("b.__label").as("pred_label"),
        (-col("b.ns")).as("score6"))
    best.join(docs.select(col(idCol), col(labelCol)), Seq(idCol))
      .select(col(idCol), col(labelCol), col("pred_label"), col("score6"),
        when(col(labelCol) === col("pred_label"), lit(1L))
          .otherwise(lit(0L)).as("correct"))
  }

  /** The full (doc × label) score grid: `(idCol, __label, score6)`. */
  private def scoredGrid(docs: DataFrame, idCol: String,
                         labelCol: String, textCol: String): DataFrame = {
    val base = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
    val words = base.select(col(idCol), col(labelCol),
      explode(TextAnalysis.tokensCol(col(textCol))).as("word"))

    val v = words.agg(countDistinct(col("word")).as("v"))
    val dt = base.agg(count(lit(1)).as("dt"))

    // (label, word) likelihoods: Heaps-bounded table, one shuffle
    val lwc = words.groupBy(col(labelCol), col("word"))
      .agg(count(lit(1)).as("cw"))
    val ltot = lwc.groupBy(col(labelCol)).agg(sum(col("cw")).as("tot"))
    val lp = lwc.join(ltot, Seq(labelCol))
      .crossJoin(broadcast(v))
      .select(col(labelCol), col("word"),
        ExactSum.quantize6(
          log((col("cw") + lit(1L)).cast("double") /
              (col("tot") + col("v")).cast("double"))).as("lp6"))

    // ≤|labels| rows: prior + unknown-word mass per label
    val ls = base.groupBy(col(labelCol)).agg(count(lit(1)).as("dl"))
      .join(ltot, Seq(labelCol))
      .crossJoin(broadcast(v))
      .crossJoin(broadcast(dt))
      .select(col(labelCol).as("__label"),
        ExactSum.quantize6(
          log(col("dl").cast("double") / col("dt").cast("double")))
          .as("prior6"),
        ExactSum.quantize6(
          log(lit(1.0) / (col("tot") + col("v")).cast("double")))
          .as("u6"))

    val dwc = words.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("c"))
    val dn = dwc.groupBy(col(idCol)).agg(sum(col("c")).as("n"))
    val matched = dwc.join(lp, Seq("word"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sum(col("c") * col("lp6")).as("sm"), sum(col("c")).as("m"))
      .withColumnRenamed(labelCol, "__label")

    dn.crossJoin(broadcast(ls))
      .join(matched, Seq(idCol, "__label"), "left")
      .select(col(idCol), col("__label"),
        (col("prior6") + coalesce(col("sm"), lit(0L)) +
          (col("n") - coalesce(col("m"), lit(0L))) * col("u6"))
          .as("score6"))
  }

  /** Label-noise audit (confident-learning-lite): the documents whose
    * own label LOSES the NB argmax, with the log-score margin
    * `best − labeled` — the triage order for human relabeling (largest
    * margin = the model is most confident the label is wrong). The
    * per-doc score frame is |labels| rows, so the rank window is
    * label-count-bounded.
    *
    * Output: `(idCol, labelCol, pred_label, score6, label_score6,
    * margin6)`, disagreeing documents only.
    */
  def labelAudit(docs: DataFrame, idCol: String = "doc_id",
                 labelCol: String = "lang",
                 textCol: String = "text"): DataFrame = {
    val scored = scoredGrid(docs, idCol, labelCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score6").desc, col("__label"))
    val perDoc = scored.withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        max(when(col("__rn") === 1, col("__label"))).as("pred_label"),
        max(when(col("__rn") === 1, col("score6"))).as("score6"))
    val labeled = scored
      .join(docs.select(col(idCol), col(labelCol)), Seq(idCol))
      .filter(col("__label") === col(labelCol))
      .select(col(idCol), col(labelCol),
        col("score6").as("label_score6"))
    perDoc.join(labeled, Seq(idCol))
      .filter(col("pred_label") =!= col(labelCol))
      .select(col(idCol), col(labelCol), col("pred_label"),
        col("score6"), col("label_score6"),
        (col("score6") - col("label_score6")).as("margin6"))
  }
}
