package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content fingerprinting for dataset versioning: an ORDER-FREE checksum
  * of a table (or of each partition of it) that two runs, two engines,
  * or two snapshot versions can compare without moving data — "did this
  * corpus change, and if so, which partitions?" answered by one
  * map-side-combinable aggregation per side.
  *
  * Mechanics: each row canonicalizes to a separator-joined string (nulls
  * get a sentinel distinct from the empty string), hashes to the top 64
  * bits of its MD5 (unsigned, via `conv` — the bits every ANSI engine
  * can recompute), and the checksum is the exact DECIMAL sum of those
  * per-row values. Addition commutes, so the checksum is independent of
  * row order, partitioning, and parallelism — and checksum(A ∪ B) =
  * checksum(A) + checksum(B), which lets incremental loads maintain the
  * corpus fingerprint without rescanning history (the [[AggState]]
  * property, for identity).
  *
  * A colliding pair of differing corpora requires engineering MD5
  * collisions into the sum — fine for drift DETECTION; use a
  * cryptographic transcript if adversarial integrity is the goal.
  */
object Fingerprint {

  /** Unsigned top-64-bits-of-MD5 of the canonicalized row, as
    * DECIMAL(20,0) — `('0x' || substr(md5(s), 1, 16))::UBIGINT` in
    * DuckDB terms.
    */
  def rowHashCol(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "rowHashCol needs at least one column")
    // unit separator between fields (("ab","c") must not collide with
    // ("a","bc")); record separator as the null sentinel (distinct from
    // the empty string). Single bytes in UTF-8, so the MD5 replays
    // byte-identically from SQL via chr(31)/chr(30).
    val canon = cols.map(c => coalesce(c.cast("string"), lit("\u001e")))
    conv(substring(md5(concat_ws("\u001f", canon: _*)), 1, 16), 16, 10)
      .cast("decimal(20,0)")
  }

  /** One fingerprint row per value of `partCols`: `(partCols…, n_rows,
    * checksum)`. Hash covers `hashCols` in the given order.
    */
  def partitionFingerprints(df: DataFrame, partCols: Seq[String],
                            hashCols: Seq[String]): DataFrame = {
    require(partCols.nonEmpty, "partitionFingerprints needs partition columns")
    df.groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(rowHashCol(hashCols.map(col))).cast("decimal(38,0)")
          .as("checksum"))
  }

  /** The whole-table fingerprint: one row of `(n_rows, checksum)`. */
  def datasetFingerprint(df: DataFrame, hashCols: Seq[String]): DataFrame =
    df.groupBy()
      .agg(count(lit(1)).as("n_rows"),
        sum(rowHashCol(hashCols.map(col))).cast("decimal(38,0)")
          .as("checksum"))

  /** Partition-level diff of two corpus versions from their fingerprint
    * frames alone: `(partCols…, status ∈ added|removed|changed)` —
    * unchanged partitions are absent, so the output is ∝ drift, never
    * corpus size. Feed it two [[partitionFingerprints]] outputs (cheap
    * to persist alongside each snapshot).
    */
  def diffFingerprints(before: DataFrame, after: DataFrame,
                       partCols: Seq[String]): DataFrame = {
    val b = before.select(partCols.map(col) :+
      col("n_rows").as("__n_b") :+ col("checksum").as("__c_b"): _*)
    val a = after.select(partCols.map(col) :+
      col("n_rows").as("__n_a") :+ col("checksum").as("__c_a"): _*)
    b.join(a, partCols, "full_outer")
      .withColumn("status",
        when(col("__c_b").isNull, lit("added"))
          .when(col("__c_a").isNull, lit("removed"))
          .when(col("__c_b") =!= col("__c_a") ||
            col("__n_b") =!= col("__n_a"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(partCols.map(col) :+ col("status"): _*)
  }
}
