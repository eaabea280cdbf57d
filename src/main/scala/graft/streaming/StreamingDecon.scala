package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Benchmark decontamination ON INGEST — the streaming closure of the
  * eval-hygiene story (quality filter → near-dup → THIS): every
  * arriving document is checked for `shingleSize`-gram overlap with
  * the benchmark eval set before it can enter the corpus, so
  * contamination is stopped at the door instead of audited after the
  * fact.
  *
  * The eval side is structurally tiny (an MB-scale benchmark — the
  * documented broadcast case of
  * [[graft.operators.Decontamination.contaminationPairs]]), so its
  * DISTINCT hashed shingles collapse to ONE sorted-array row that
  * cross-joins the stream: per arriving row the check is a sorted
  * array intersection — STATELESS, no state store, no watermark, any
  * output mode. Documents shorter than the shingle size have no
  * shingles and pass (same contract as the batch operator).
  */
object StreamingDecon {

  /** Adds `n_shared` (distinct shingles shared with the eval set) and
    * `contaminated` (n_shared ≥ minShared) to the stream.
    */
  /** The one-row sorted eval-shingle frame the per-row check
    * cross-joins. Exposed (package-private) so a long-running stream
    * owner ([[StreamingIngest.pipeline]]) can persist it ONCE at
    * stream setup: [[flag]] rebuilds the identical plan every
    * micro-batch, so the CacheManager substitutes the warmed frame and
    * the eval-side explode+distinct+collect aggregation runs once per
    * stream instead of once per micro-batch.
    */
  private[streaming] def evalShingles(evalDocs: DataFrame,
                                      shingleSize: Int,
                                      textCol: String): DataFrame =
    evalDocs
      .select(explode(graft.functions.TextHashes.hashedShingles(
        TextAnalysis.tokensCol(col(textCol)), shingleSize)).as("h"))
      .distinct()
      .agg(sort_array(collect_list(col("h"))).as("__ev"))

  def flag(stream: DataFrame, evalDocs: DataFrame, shingleSize: Int = 8,
           minShared: Long = 1L, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val evalSh = evalShingles(evalDocs, shingleSize, textCol)
    val sh = sort_array(graft.functions.TextHashes.hashedShingles(
      TextAnalysis.tokensCol(col(textCol)), shingleSize))
    // null text null-propagates through the shingle pipeline; the
    // documented policy (shared with the batch operator) is that a
    // document with NO shingles passes, so coalesce instead of letting
    // NULL n_shared make `!contaminated` silently drop the row in keep()
    stream.withColumn("__sh", sh)
      .crossJoin(evalSh)
      .withColumn("n_shared",
        coalesce(graft.functions.ArraySetOps.sortedIntersectCount(
          col("__sh"), col("__ev")).cast("long"), lit(0L)))
      .withColumn("contaminated", col("n_shared") >= minShared)
      .drop("__sh", "__ev")
  }

  /** The gating form: contaminated documents are DROPPED, clean ones
    * pass through unchanged (flag columns removed).
    */
  def keep(stream: DataFrame, evalDocs: DataFrame, shingleSize: Int = 8,
           minShared: Long = 1L, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame =
    flag(stream, evalDocs, shingleSize, minShared, idCol, textCol)
      .filter(!col("contaminated"))
      .drop("n_shared", "contaminated")
}
