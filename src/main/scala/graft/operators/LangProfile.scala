package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained rank-profile language identification (Cavnar & Trenkle
  * 1994, "N-Gram-Based Text Categorization") — the TRAINED counterpart
  * of the heuristic `TextAnalysis.langIdCol` (q22/q214): per-language
  * character-trigram RANK profiles learned from a labeled corpus, and
  * classification by out-of-place rank distance.
  *
  *   - Train: per (lang, trigram) counts over `_`-padded words; each
  *     language's profile is its `topN` trigrams ranked by
  *     (count desc, trigram) — rank is all that is kept, the C&T
  *     insight (Zipf makes ranks stable where raw counts are not).
  *   - Classify: build the SAME profile per document, then for each
  *     candidate language sum |doc_rank − lang_rank| over shared
  *     trigrams plus `penalty` (= topN, the C&T maximum) for each doc-
  *     profile trigram missing from the language profile. Lowest
  *     distance wins; ties break to the lexicographically first
  *     language. A language sharing NO trigram with the document
  *     would score the unreachable maximum `|profile|·penalty`, which
  *     every language with ≥ 1 shared trigram strictly beats (each
  *     shared trigram contributes |dr−lr| ≤ topN−1 < penalty) — so the
  *     shared-trigram join loses no argmin candidate.
  *
  * Scale design (100 TB): the (lang, trigram) count table is bounded
  * by |languages| × |trigram types| (alphabet³ — parameters, not
  * data); language ranks come from the rank core. The document side
  * is one trigram explode + two doc-keyed aggregations (doc-bounded
  * window groups) and a trigram-keyed join against the ≤ |langs|·topN
  * profile frame — corpus-linear, hint-free (AQE broadcasts the
  * profile at any realistic size). The argmin is a map-side-combinable
  * `min(struct(dist, lang))`. No driver state.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no language ID; this extends the mandated text-analysis family
  * (SURVEY §2B4) with its standard trained classifier.
  */
object LangProfile {

  /** Per-occurrence character trigrams of `_`-padded lowercase words,
    * carrying the given key columns. A 1-char word still yields one
    * trigram (`_x_`), so every token contributes.
    */
  private def trigramStream(docs: DataFrame, keyCols: Seq[String],
                            textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(keyCols.map(col) :+
        explode(TextAnalysis.tokensCol(col(textCol))).as("__w"): _*)
      .select(keyCols.map(col) :+
        concat(lit("_"), col("__w"), lit("_")).as("__p"): _*)
      .select(keyCols.map(col) :+
        explode(expr("sequence(1, length(__p) - 2)")).as("__i") :+
        col("__p"): _*)
      .select(keyCols.map(col) :+
        expr("substring(__p, __i, 3)").as("tri"): _*)

  /** Trained profiles: `(lang, rank, tri, cnt)` — each language's
    * `topN` trigrams by (cnt desc, tri), rank 1-based via the rank
    * core (per-language groups, never a one-task window).
    */
  def profiles(docs: DataFrame, langCol: String = "lang",
               textCol: String = "text", topN: Int = 30): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    // |langs| × |trigram types| rows — checkpointed because the rank
    // core below makes several passes (else each replays the corpus
    // trigram explode)
    val cnt = trigramStream(docs, Seq(langCol), textCol)
      .groupBy(col(langCol), col("tri"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    Ranking.rangeRank(cnt.withColumn("__nc", -col("cnt")),
        Seq(langCol), Seq("__nc", "tri"), "rank")
      .filter(col("rank") <= topN)
      .select(col(langCol), col("rank").cast("long").as("rank"),
        col("tri"), col("cnt"))
  }

  /** Classify every document against the corpus's own trained
    * profiles: `(idCol, langCol, pred_lang, dist, correct)` with
    * `correct` a BIGINT 1/0 against the labeled column. `penalty`
    * defaults to `topN` (the C&T out-of-profile maximum).
    */
  def classify(docs: DataFrame, idCol: String = "doc_id",
               langCol: String = "lang", textCol: String = "text",
               topN: Int = 30, penalty: Int = -1): DataFrame = {
    val pen = if (penalty < 0) topN else penalty
    // multi-use + rank-core passes: checkpoint the small profile frame
    val lp = profiles(docs, langCol, textCol, topN)
      .select(col(langCol).as("__lang"), col("tri"),
        col("rank").as("lr"))
      .localCheckpoint()
    val dtri = trigramStream(docs, Seq(idCol), textCol)
      .groupBy(col(idCol), col("tri"))
      .agg(count(lit(1)).as("cnt"))
    // doc profile: doc-bounded window groups (≤ trigram types per doc)
    // ≤ topN rows per doc; checkpointed because it feeds BOTH the
    // distance join and the profile-size frame (else the corpus
    // trigram explode + window evaluate twice in one job)
    val dprof = dtri
      .withColumn("dr", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("cnt").desc, col("tri"))).cast("long"))
      .filter(col("dr") <= topN)
      .select(col(idCol), col("tri"), col("dr"))
      .localCheckpoint()
    val psz = dprof.groupBy(col(idCol)).agg(count(lit(1)).as("p"))
    val dist = dprof.join(lp, Seq("tri"))
      .groupBy(col(idCol), col("__lang"))
      .agg(sum(abs(col("dr") - col("lr"))).as("s"),
        count(lit(1)).as("m"))
      .join(psz, Seq(idCol))
      .select(col(idCol), col("__lang"),
        (col("s") + (col("p") - col("m")) * lit(pen.toLong)).as("dist"))
    val best = dist.groupBy(col(idCol))
      .agg(min(struct(col("dist"), col("__lang"))).as("b"))
      .select(col(idCol), col("b.__lang").as("pred_lang"),
        col("b.dist").as("dist"))
    best.join(docs.select(col(idCol), col(langCol)), Seq(idCol))
      .select(col(idCol), col(langCol), col("pred_lang"), col("dist"),
        when(col(langCol) === col("pred_lang"), lit(1L))
          .otherwise(lit(0L)).as("correct"))
  }
}
