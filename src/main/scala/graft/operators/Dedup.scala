package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design notes (the 100 TB story, per operator):
  *  - exact: single hash-aggregate shuffle on the dedup key, with map-side
  *    partial aggregation; survivor choice is deterministic (min of a tie
  *    key) — `dropDuplicates` would return an arbitrary row per group.
  *  - MinHash+LSH: per-doc signature is embarrassingly parallel (no
  *    shuffle); banding turns the quadratic all-pairs problem into
  *    equi-joins on (band, bucket) keys; a bucket-size cap bounds the
  *    worst-case skew blowup (a hot bucket of b docs costs b² pairs).
  *  - SimHash: one 64-bit signature per doc (no shuffle), then candidate
  *    generation by exact-match on 16-bit chunks (pigeonhole: hamming ≤ 3
  *    ⇒ at least one of 4 chunks equal) — again equi-joins only.
  *  - n-gram Jaccard: fully relational (explode → join on shared rare
  *    terms → count), with a document-frequency cap as the blocking key so
  *    the join never touches stop-term pairs.
  *  - embedding near-dup: brute-force is O(n²) and only for oracle-scale
  *    verification; the scale path is random-hyperplane LSH (sign
  *    signatures, then equi-join on buckets) in [[Similarity]].
  */
object Dedup {

  /** Exact dedup: one survivor per key group, deterministically the row
    * with the smallest `tieKey`. One shuffle (hash aggregate), map-side
    * combine enabled by the groupBy form.
    */
  def exact(df: DataFrame, keys: Seq[String], tieKey: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieKey))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Group-level exact-dedup summary: per normalized key, the surviving id
    * and the duplicate count — the aggregate form avoids the window sort
    * entirely (pure hash-agg, cheapest shuffle shape at scale).
    */
  def exactSummary(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("survivor_id"), count(lit(1)).as("dup_count"))

  // ---------------------------------------------------------------- MinHash

  /** Word shingles of size `n` (documents shorter than `n` tokens collapse
    * to a single whole-text shingle), distinct per doc.
    */
  def shinglesCol(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokensCol(text)
    val joined = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(when(size(toks) >= n, joined).otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signature: element `i` is `min over shingles of
    * xxhash64(shingle, i)` — the (shingle, seed) pair through one codegen'd
    * 64-bit hash is a standard portable seeded family. Entirely per-row:
    * no shuffle, no UDF.
    */
  def minhashSignatureCol(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** LSH banding: docs agreeing on all `rowsPerBand` signature slots of any
    * band land in the same (band, bucket). Returns candidate doc pairs
    * (a < b), deduplicated across bands, with hot buckets capped at
    * `maxBucket` docs (skew guard: a single degenerate bucket would
    * otherwise contribute O(bucket²) pairs).
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, numHashes: Int = 32,
                        rowsPerBand: Int = 4, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    val sig = minhashSignatureCol(shinglesCol(col(textCol), shingleSize), numHashes)
    val banded = docs
      .select(col(idCol).as("doc"), sig.as("sig"))
      .select(col("doc"), posexplode(
        transform(sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))
      ).as(Seq("band", "bucket")))
    val capped = banded
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("__n") <= maxBucket).drop("__n")
    capped.as("l").join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      .distinct()
  }

  /** MinHash near-dup pairs with exact Jaccard verification over the
    * shingle sets (array_intersect/array_union on the per-doc arrays —
    * no extra shuffle beyond the two candidate-side joins).
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, shingleSize: Int = 3, numHashes: Int = 32,
                      rowsPerBand: Int = 4): DataFrame = {
    val withShingles = docs.select(
      col(idCol).as("doc"), shinglesCol(col(textCol), shingleSize).as("sh"))
    val cand = minhashCandidates(docs, idCol, textCol, shingleSize, numHashes, rowsPerBand)
    cand
      .join(withShingles.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(withShingles.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens: per bit, sum +1/-1 votes from
    * each token occurrence's xxhash64 bit, then take signs. Duplicate
    * tokens vote once per occurrence (frequency weighting falls out of
    * folding over the raw token array). Pure higher-order functions —
    * per-row, codegen'd, no shuffle.
    */
  def simhashCol(text: Column): Column = {
    val toks = TextAnalysis.tokensCol(text)
    val votes = aggregate(toks, array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          j => when(call_function("getbit", xxhash64(t), j) === 1, 1L).otherwise(-1L)),
        (a, v) => a + v))
    aggregate(zip_with(votes, sequence(lit(0), lit(63)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming` (< 4):
    * candidates via the 4×16-bit-chunk pigeonhole (equi-join per chunk),
    * verified with `bit_count(a XOR b)`.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes hamming <= 3")
    val sigs = docs.select(col(idCol).as("doc"), simhashCol(col(textCol)).as("sig"))
    val chunked = sigs.select(col("doc"), col("sig"), posexplode(
      transform(sequence(lit(0), lit(3)),
        k => call_function("shiftright", col("sig"), k * 16).bitwiseAND(0xFFFFL)))
      .as(Seq("chunk", "ck")))
    chunked.as("l").join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.ck") === col("r.ck") &&
          col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Fully relational n-gram Jaccard near-dup over word shingles:
    * candidate pairs are docs sharing at least one *rare* shingle
    * (document frequency ≤ `maxDf` — the blocking predicate that keeps
    * the self-join off ubiquitous shingles), then the TRUE intersection is
    * counted relationally for candidates only, and
    * |union| = |A| + |B| − |A∩B|. Integer counts throughout → the final
    * division is bit-identical in any engine (oracle-friendly, unlike the
    * hash-based MinHash/SimHash paths).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleSize: Int = 3,
                        maxDf: Long = 5L): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
        explode(shinglesCol(col(textCol), shingleSize)).as("term"))
      .filter(col("term") =!= "")
    val sizes = tok.groupBy(col("doc")).agg(count(lit(1)).as("n_terms"))
    val rare = tok.join(
      tok.groupBy("term").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf), "term")
    val cand = rare.select(col("doc").as("doc_a"), col("term"))
      .join(rare.select(col("doc").as("doc_b"), col("term")), "term")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val inter = cand
      .join(tok.select(col("doc").as("doc_a"), col("term")), "doc_a")
      .join(tok.select(col("doc").as("doc_b"), col("term").as("term_b")), "doc_b")
      .filter(col("term") === col("term_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("doc_a"), col("n_terms").as("na")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n_terms").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
