package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document repeated-substring detection and removal — the
  * ExactSubstr family of training-data dedup (find long token runs
  * shared verbatim across documents, then cut them out), re-expressed
  * relationally instead of via suffix arrays.
  *
  * A position's `k`-token window that also occurs in ≥ `minDocs` OTHER
  * documents marks the position as repeated; runs of repeated positions
  * closer than `k` merge into maximal spans (gaps-and-islands). Any
  * verbatim cross-document duplicate of length ≥ k tokens is covered by
  * at least one shared window, so spans are a superset of every such
  * duplicate — the suffix-array result for cross-doc repeats, from plain
  * equi-joins.
  *
  * Scale design (the 100 TB story):
  *  - the gram STRING dies before any shuffle: windows are built per-row
  *    (array slice + join, codegen'd) and immediately hashed to a 64-bit
  *    key, so the two aggregations shuffle (id, pos, h) longs, never
  *    k-token strings.
  *  - document frequency = two map-side-combinable hash aggregations
  *    (distinct (h, doc), then count per h) — no windows, no self-joins.
  *  - the repeated-position join is a plain equi-join on the long key;
  *    AQE picks broadcast when the common-gram side fits.
  *  - span merge is a lag + running-sum window partitioned by doc_id —
  *    full parallelism (one doc's positions are tiny).
  * Compare suffix arrays: a distributed suffix sort is a global string
  * sort of corpus-size × pointer data with heavy skew; this shape is two
  * long-key aggs + one join, linear and combinable end-to-end.
  *
  * Oracle parity: the DuckDB replay groups by the gram string itself
  * (same counts as the 64-bit hash w.h.p. — the q16 equivalence used by
  * boilerplateShare / nearDups).
  */
object SubstringDedup {

  /** One row per (doc_id, pos 1-based, xxhash64 of its k-token window),
    * for docs with ≥ k tokens. Whitespace tokenization, matching the
    * corpus gates (q23 family).
    */
  private def positionGrams(docs: DataFrame, idCol: String, textCol: String,
                            k: Int): DataFrame = {
    val ws = split(col(textCol), " ")
    // sequence(1, n) DESCENDS when n < 1 — guard short docs to an empty
    // window list instead
    val grams = when(size(ws) >= k,
        transform(sequence(lit(1), size(ws) - (k - 1)),
          i => struct(i.cast("long").as("pos"),
            xxhash64(array_join(slice(ws, i, lit(k)), " ")).as("h"))))
      .otherwise(array().cast("array<struct<pos:long,h:long>>"))
    // the window-hash transform is a higher-order-function subtree
    // (interpreted, not codegen) — on a single-file corpus it otherwise
    // builds the whole gram cache in ONE task (the round-16 battery
    // forensics' 232 s-CPU stall); FrameOps.parallelized un-starves it
    FrameOps.parallelized(docs).select(col(idCol), explode(grams).as("g"))
      .select(col(idCol), col("g.pos").as("pos"), col("g.h").as("h"))
  }

  /** Maximal spans of cross-document repeated `k`-token windows:
    * `(doc_id, span_start, span_end, n_grams)` with 1-based inclusive
    * token positions and `n_grams` = repeated window starts merged into
    * the span. A window is repeated when its document frequency ≥
    * `minDocs` (distinct docs, so intra-doc repetition alone never
    * qualifies — that is [[TextAnalysis.repetitionFeatures]]' job).
    */
  def repeatedSpans(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", k: Int = 4,
                    minDocs: Long = 2L): DataFrame = {
    require(k >= 2, s"window size k ($k) must be at least 2")
    require(minDocs >= 2L, s"minDocs ($minDocs) below 2 marks every position")
    // the (id, pos, h) frame feeds both the df count and the hit join —
    // persist (tracked for release) so the corpus is tokenized and
    // hashed once per query, not once per consumer
    val pg = TrackedCaches.track(
      positionGrams(docs, idCol, textCol, k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfs = pg.select(col("h"), col(idCol)).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val hits = pg.join(dfs.filter(col("df") >= minDocs).select("h"), "h")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // start a new island when the previous repeated position is > k-1
    // behind (windows no longer overlap or touch); first row lags null
    // -> otherwise-branch -> island break, as intended
    val marked = hits.withColumn("brk",
      when(col("pos") - lag(col("pos"), 1).over(w) <= k, lit(0L))
        .otherwise(lit(1L)))
    marked.withColumn("grp", sum(col("brk")).over(w))
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .drop("grp")
  }

  /** Documents with every repeated span cut out: `(doc_id, clean,
    * n_tokens_kept)`. Every input doc survives (a fully-repeated doc
    * comes back with empty `clean`) so the operator composes with
    * downstream per-doc stages 1:1.
    */
  def removeRepeatedSpans(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text", k: Int = 4,
                          minDocs: Long = 2L): DataFrame = {
    val covered = repeatedSpans(docs, idCol, textCol, k, minDocs)
      .select(col(idCol),
        explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val words = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("word"))
    val kept = words.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(array_sort(collect_list(struct(col("pos"),
          col("word")))), s => s.getField("word"))).as("clean"),
        count(lit(1)).as("n_tokens_kept"))
    docs.select(col(idCol))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean"), lit("")).as("clean"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
  }
}
