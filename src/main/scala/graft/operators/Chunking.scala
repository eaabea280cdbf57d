package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Per-document sliding-window chunking — the RAG / long-context prep
  * step that [[Packing.chunkTokenStream]] (corpus-stream concat &
  * chunk) deliberately is NOT: each document is split independently
  * into windows of at most `maxTokens` whitespace tokens with
  * `overlap` tokens of context carried between consecutive windows,
  * and no window ever crosses a document boundary.
  *
  * Window layout for a doc of `n` tokens with stride
  * `s = maxTokens − overlap`: chunk `i` covers tokens
  * `[i·s + 1, min(n, i·s + maxTokens)]`, and the chunk count is
  * `ceil(max(n − overlap, 1) / s)` — every token lands in ≥ 1 chunk,
  * consecutive chunks share exactly `overlap` tokens, the final chunk
  * may be short. Whitespace-empty documents yield no chunks (they
  * have no tokens to window).
  *
  * Execution shape: tokenize → `explode(sequence(...))` → `slice` —
  * one per-row projection + explode, ZERO shuffles and no UDF, so at
  * 100 TB it is embarrassingly parallel and output-bounded (×
  * `1/(1−overlap/maxTokens)` row growth, the caller's knob). Uses the
  * house token convention ([[TextAnalysis.tokensCol]]: split on
  * whitespace after trim+lower) so chunk token counts agree with
  * every other token-counting gate.
  *
  * Reference context: the reference plugin (`FileAppenderSink.java`)
  * has no chunking; this extends the mandated text-analysis family
  * (SURVEY §2B4) with the retrieval/long-context windowing stage.
  */
object Chunking {

  /** `(idCol, chunk_id, n_tokens, chunk_text)` — one row per window,
    * `chunk_id` 0-based per document, `chunk_text` the window's tokens
    * re-joined with single spaces (lowercased, per the house token
    * convention). */
  def slidingChunks(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", maxTokens: Int = 64,
                    overlap: Int = 16): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val nChunks = ceil(greatest(col("__n") - overlap, lit(1))
      .cast("double") / stride).cast("int")
    // drop empty tokens rather than pre-filtering on trim: SQL trim
    // strips only spaces, so a tabs/newlines-only doc would otherwise
    // slip through as an array of empty strings (in both engines)
    df.withColumn("__toks",
        filter(TextAnalysis.tokensCol(col(textCol)), t => t =!= ""))
      .filter(size(col("__toks")) > 0)
      .withColumn("__n", size(col("__toks")))
      .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("__w", slice(col("__toks"),
        col("chunk_id") * stride + 1, lit(maxTokens)))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__w")).as("chunk_text"))
  }
}
