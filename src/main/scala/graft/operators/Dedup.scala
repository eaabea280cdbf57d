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
  *  - MinHash+LSH: shingle hashing and signatures are native codegen
  *    expressions ([[graft.functions.TextHashes]]) — zero shuffle, zero
  *    intermediate rows, inside WholeStageCodegen (HOF formulations fall
  *    back to interpreted eval — measured 30× slower). The per-doc shingle
  *    arrays are persisted and shared by the candidate and verify sides,
  *    so the corpus is tokenized once per query. Banding turns the
  *    quadratic all-pairs problem into equi-joins on (band, bucket) keys;
  *    a bucket-size cap bounds the worst-case skew blowup (a hot bucket of
  *    b docs costs b² pairs).
  *  - SimHash: same relational shape — per-(doc, token-hash) rows, 64
  *    codegen'd vote sums, sign-assembled into one 64-bit signature; then
  *    candidate generation by exact-match on 16-bit chunks (pigeonhole:
  *    hamming ≤ 3 ⇒ at least one of 4 chunks equal) — equi-joins only.
  *  - n-gram Jaccard: fully relational (explode → join on shared rare
  *    terms → count), with a document-frequency cap as the blocking key so
  *    the join never touches stop-term pairs. Terms are joined as 64-bit
  *    hashes (cheap long keys, same counts w.h.p.) while Jaccard stays an
  *    exact integer ratio — oracle-identical to the string formulation.
  *  - embedding near-dup: brute-force is O(n²) and only for oracle-scale
  *    verification; the scale path is random-hyperplane LSH (sign
  *    signatures, then equi-join on buckets) in [[Similarity]].
  */
object Dedup {

  /** Caches created internally by graft operators (shingle arrays,
    * [[TextAnalysis.lmSurprisal]] term counts, [[Similarity.semDedup]]
    * assignments) register with [[TrackedCaches]]; this is the public
    * release hook ([[Curation.report]] calls it automatically).
    * [[connectedComponents]] labels are the one deliberate EXCEPTION —
    * they are localCheckpoint-backed (blocks ARE the data; releasing
    * would break later use) and are freed by the ContextCleaner when the
    * caller drops the frame.
    */
  private def tracked(df: DataFrame): DataFrame = TrackedCaches.track(df)

  private[graft] def trackedCacheCount: Int = TrackedCaches.count

  /** Unpersist every cache a graft operator has created since the last
    * release (blocking=false: reclamation proceeds asynchronously).
    * Results already materialized stay valid — only their backing cache is
    * dropped; re-running an unreleased plan recomputes instead of erroring.
    */
  def releaseCaches(): Unit = TrackedCaches.release()

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

  /** Incremental exact dedup — the production shape: a NEW batch of
    * documents is deduplicated against itself, then against the key set
    * of everything already ingested (so the historical corpus is never
    * rescanned — only its compact one-column key projection is read).
    * `known` needs a `keyCol` column; duplicate keys in it are harmless
    * (anti-join semantics ignore right-side multiplicity — no distinct
    * pass). At 100 TB the anti-join broadcasts when the key set is small
    * and hash-shuffles both sides on the key otherwise; the batch side
    * is one window pass on the same key partitioning.
    */
  def incrementalExact(batch: DataFrame, known: DataFrame,
                       keyCol: String, tieKey: String): DataFrame =
    exact(batch, Seq(keyCol), tieKey)
      .join(known.select(col(keyCol)), Seq(keyCol), "left_anti")

  // ------------------------------------------------------------- shingles

  /** Word shingles of size `n` (documents shorter than `n` tokens collapse
    * to a single whole-text shingle), distinct per doc.
    */
  def shinglesCol(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokensCol(text)
    val joined = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(when(size(toks) >= n, joined).otherwise(array(concat_ws(" ", toks))))
  }

  /** 64-bit-hashed word shingles over a token-array column: same set as
    * [[shinglesCol]] but each shingle is `xxhash64` of its `n` tokens — no
    * intermediate strings, and downstream joins/aggregations work on cheap
    * long keys. Distinct per doc, first-occurrence order. The n-token
    * window hashing runs in the native
    * [[graft.functions.TextHashes.HashedShingles]] codegen expression
    * (bit-identical values to the multi-arg `xxhash64` HOF formulation it
    * replaced, which was interpreted per array element and dominated the
    * near-dup queries' runtime); only the rare short-doc fallback stays a
    * plain SQL expression.
    */
  def hashedShinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n, graft.functions.TextHashes.hashedShingles(toks, n))
      .otherwise(array(xxhash64(toks)))

  // ---------------------------------------------------------------- MinHash

  /** MinHash signatures as one `array<long>` column `sig`:
    * `sig(i) = min over shingles of XXH64(shingle_hash, seed = i)` — a
    * portable seeded family, computed per row by the native
    * [[graft.functions.TextHashes.MinHashSigs]] codegen expression (zero
    * shuffle, zero intermediate rows; the relational
    * explode → 32-min-aggregate alternative costs a shuffle of
    * |shingles| rows).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, numHashes: Int = 32): DataFrame =
    signaturesFromShingleArrays(docShingleArrays(docs, idCol, textCol, shingleSize), numHashes)

  private def signaturesFromShingleArrays(arrays: DataFrame, numHashes: Int): DataFrame =
    arrays.select(col("doc"),
      graft.functions.TextHashes.minhashSigs(col("sh"), numHashes).as("sig"))

  /** LSH S-curve sizing card for a (b bands × r rows) MinHash family
    * (Leskovec/Rajaraman/Ullman, MMDS §3.4.2): per Jaccard similarity
    * s in `sPoints`, the banding collision probability
    * 1 − (1 − s^r)^b, plus the family's 50 %-collision threshold
    * ≈ (1/b)^(1/r) — the card an index owner reads BEFORE picking
    * numHashes/rowsPerBand, next to the MEASURED detector PRF1
    * (q233/q236) read after. Integer powers expand to explicit IEEE
    * multiply chains (b and r are small config ints) so the curve
    * replays bit-identically in any engine; the threshold's fractional
    * power goes through exp/ln on exact integer ratios, rounded to 6
    * (the entropyLDiversity convention). Parameter-bounded frame —
    * |sPoints| rows, no data touched at any corpus size.
    */
  def lshCalibration(spark: org.apache.spark.sql.SparkSession,
                     numHashes: Int, rowsPerBand: Int,
                     sPoints: Seq[Double]): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    require(sPoints.nonEmpty && sPoints.forall(s => s >= 0.0 && s <= 1.0),
      s"sPoints must be in [0, 1], got $sPoints")
    require(sPoints.distinct.size == sPoints.size,
      s"sPoints must be distinct, got $sPoints")
    val b = numHashes / rowsPerBand
    import spark.implicits._
    val pts = sPoints.toDF("s")
    val sr = (1 to rowsPerBand).map(_ => col("s")).reduce(_ * _)
    val miss = lit(1.0) - sr
    val pNone = (1 to b).map(_ => miss).reduce(_ * _)
    pts.select(col("s"),
        lit(b.toLong).as("bands"), lit(rowsPerBand.toLong).as("rows_per_band"),
        round(lit(1.0) - pNone, 6).as("p_collide"),
        round(exp(log(lit(1.0) / b) / rowsPerBand), 6).as("threshold"))
  }

  /** LSH banding: docs agreeing on all `rowsPerBand` signature slots of any
    * band land in the same (band, bucket). Returns candidate doc pairs
    * (a < b), deduplicated across bands, with hot buckets capped at
    * `maxBucket` docs (skew guard: a single degenerate bucket would
    * otherwise contribute O(bucket²) pairs).
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, numHashes: Int = 32,
                        rowsPerBand: Int = 4, maxBucket: Int = 1000): DataFrame =
    candidatesFromSigs(minhashSignatures(docs, idCol, textCol, shingleSize, numHashes),
      numHashes, rowsPerBand, maxBucket)

  private def bandedOf(sigs: DataFrame, numHashes: Int,
                       rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    sigs.select(col("doc"), posexplode(array((0 until numBands).map { b =>
      xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), lit(b))
    }: _*)).as(Seq("band", "bucket")))
  }

  private def candidatesFromSigs(sigs: DataFrame, numHashes: Int,
                                 rowsPerBand: Int, maxBucket: Int): DataFrame =
    groupedPairs(bandedOf(sigs, numHashes, rowsPerBand),
      Seq("band", "bucket"), maxBucket)

  /** Candidate pairs from grouped doc lists: window-count cap →
    * collect_list → double-explode (codegen'd Generate). Replaces the
    * rare-side self-join formulation, which shuffles the exploded rows
    * three times and measured ~1.5× slower; the groupBy reuses the
    * window's hash partitioning, so the whole stage costs ONE exchange.
    *
    * Order matters for the skew guard: the cap is applied by the
    * O(1)-state (spillable) window COUNT before collect_list ever runs,
    * so a degenerate hot group never materializes its doc list in an
    * aggregation buffer — capping on size(ds) after collecting would
    * bound the quadratic pair blowup but not the O(group) single-buffer
    * array.
    */
  private[operators] def groupedPairs(df: DataFrame, groupCols: Seq[String],
                                      maxGroup: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n").between(2, maxGroup)).drop("__n")
      .groupBy(groupCols.map(col): _*)
      .agg(collect_list(col("doc")).as("ds"))
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** MinHash near-dup pairs with exact Jaccard verification over the
    * (hashed) shingle sets, computed relationally: |A∩B| from an equi-join
    * on the shingle hash restricted to candidate pairs, |A∪B| = |A|+|B|−|A∩B|.
    * Integer counts throughout → the ratio is exact.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, shingleSize: Int = 3, numHashes: Int = 32,
                      rowsPerBand: Int = 4): DataFrame = {
    val arrays = sharedShingleArrays(docs, idCol, textCol, shingleSize)
    val sigs = signaturesFromShingleArrays(arrays, numHashes)
    jaccardOfCandidates(candidatesFromSigs(sigs, numHashes, rowsPerBand, maxBucket = 1000),
      arrays, threshold)
  }

  /** Per-doc hashed-shingle ARRAYS (doc, sh) — compact verification-side
    * frame: one row per doc, broadcastable, feeds `array_intersect`.
    */
  private def docShingleArrays(docs: DataFrame, idCol: String, textCol: String,
                               shingleSize: Int): DataFrame =
    // single-file corpora otherwise tokenize+shingle on ONE core —
    // FrameOps.parallelized is the guide-§2.5 unsplittable-input fix,
    // an identity at production scan widths
    FrameOps.parallelized(docs).filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc"), TextAnalysis.tokensCol(col(textCol)).as("toks"))
      .select(col("doc"), hashedShinglesFromTokens(col("toks"), shingleSize).as("sh"))

  /** [[docShingleArrays]] persisted for reuse by both the candidate and the
    * verify side of a near-dup query — the tokenize+shingle pass over the
    * corpus runs once instead of once per plan subtree. MEMORY_AND_DISK:
    * the frame is one compact row per doc, but at 100 TB it can exceed
    * executor memory, so spill rather than recompute. Spark's CacheManager
    * keys on the logical plan, so a second operator over the same corpus
    * and shingle size (e.g. MinHash then n-gram Jaccard in one pipeline)
    * reuses the same cache entry instead of stacking a new one.
    */
  private def sharedShingleArrays(docs: DataFrame, idCol: String, textCol: String,
                                  shingleSize: Int): DataFrame =
    tracked(sharedShingleArraysPlan(docs, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The exact (un-persisted) plan [[sharedShingleArrays]] caches —
    * split out so [[appendMinhashIndex]] can probe the CacheManager for
    * it (via the public `Dataset.storageLevel`) without registering a
    * cache entry of its own.
    */
  private def sharedShingleArraysPlan(docs: DataFrame, idCol: String,
                                      textCol: String,
                                      shingleSize: Int): DataFrame =
    docShingleArrays(docs, idCol, textCol, shingleSize)
      // sorted ONCE per doc here (n log n on the cached build side) so the
      // verify join can count intersections with a zero-allocation
      // primitive merge per candidate pair instead of building a boxed
      // hash set per pair — the verify join runs O(candidate pairs) ≫
      // O(docs) intersections. Shingle values are distinct already;
      // MinHash signatures are order-invariant, so sorting is free there.
      .select(col("doc"), sort_array(col("sh")).as("sh"))

  /** Shared tail: exact Jaccard for candidate pairs via the native
    * [[graft.functions.ArraySetOps.SortedIntersectCount]] codegen
    * expression over per-doc SORTED shingle arrays (one row per doc —
    * Spark auto-broadcasts below the threshold and shuffle-joins above
    * it; no explicit hint, which would force an over-cap broadcast on a
    * billion-doc corpus). Progression: `size(array_intersect(...))`
    * materialized the intersection array per pair; IntersectCount counted
    * via a per-pair boxed hash set; the sorted two-pointer merge counts
    * with ZERO per-pair allocation (sort paid once per doc on the cached
    * build side). The exploded relational alternative (cand ⋈ tok ⋈ tok
    * on the shingle key) materializes |cand| × |shingles/doc| rows and
    * measured 4× slower than even the hash-set form.
    * |union| = |A| + |B| − |A∩B|; integer counts → the ratio is exact.
    */
  private def jaccardOfCandidates(cand: DataFrame, shingles: DataFrame,
                                  threshold: Double): DataFrame =
    cand
      .join(shingles.select(col("doc").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingles.select(col("doc").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      // `shingles` comes from [[sharedShingleArrays]] = sorted + distinct,
      // so the sorted two-pointer merge applies (measured ~2× on the
      // 1.1M-pair sf0.1 verify join vs the per-pair hash-set form).
      .withColumn("inter",
        graft.functions.ArraySetOps.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))

  /** Exact Jaccard for a GIVEN pair frame (doc_a, doc_b) — the ground-
    * truth side of detector-recall measurement: no candidate generation,
    * just the shared shingle arrays and the sorted-merge intersection
    * count over exactly the pairs the caller asks about. Output:
    * (doc_a, doc_b, jaccard) for pairs at or above `threshold`, same
    * exact-integer ratio as [[minhashNearDups]]'s verify side.
    */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                      textCol: String, threshold: Double,
                      shingleSize: Int = 3): DataFrame =
    jaccardOfCandidates(pairs.select(col("doc_a"), col("doc_b")),
      sharedShingleArrays(docs, idCol, textCol, shingleSize), threshold)

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash signatures as a (doc, sig) frame: per bit, sum +1/-1
    * votes from each token occurrence's xxhash64 bit, then take signs.
    * Duplicate tokens vote once per occurrence. Computed per row by the
    * native [[graft.functions.TextHashes.SimHash64]] codegen expression
    * (zero shuffle; bit-identical to the relational 64-vote-sum
    * formulation since both hash tokens with XXH64 seed 42).
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        portable: Boolean = false): DataFrame = {
    val hash: Column => Column =
      if (portable) graft.functions.TextHashes.simhash64Md5
      else graft.functions.TextHashes.simhash64
    docs.select(col(idCol).as("doc"), TextAnalysis.tokensCol(col(textCol)).as("toks"))
      .select(col("doc"), hash(col("toks")).as("sig"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming` (< 4):
    * candidates via the 4×16-bit-chunk pigeonhole (shared
    * [[groupedPairs]] path — `maxChunkBucket` caps a degenerate chunk
    * value shared by a huge doc population, the same skew guard as the
    * MinHash bands; capped chunks trade recall for boundedness),
    * verified with `bit_count(a XOR b)`.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, maxChunkBucket: Long = 100000L,
                      portable: Boolean = false): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes hamming <= 3")
    // The plan references sigs three times (chunk explode + both verify
    // joins) and recomputes the signature each time — deliberately NOT
    // persisted: SimHash64 is one codegen pass over the row, and caching
    // here measured ~2× SLOWER (materialization barrier + lost pipeline
    // fusion outweigh the recompute; unlike the shingle ARRAYS, which are
    // expensive to build and large enough to matter).
    val sigs = simhashSignatures(docs, idCol, textCol, portable)
    val chunked = sigs.select(col("doc"), posexplode(
      transform(sequence(lit(0), lit(3)),
        k => call_function("shiftright", col("sig"), k * 16).bitwiseAND(0xFFFFL)))
      .as(Seq("chunk", "ck")))
    groupedPairs(chunked, Seq("chunk", "ck"), maxChunkBucket)
      .join(sigs.select(col("doc").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc").as("doc_b"), col("sig").as("sig_b")), "doc_b")
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
    * |union| = |A| + |B| − |A∩B|. Join keys are 64-bit shingle hashes
    * (collision-free w.h.p., so counts — and the exact integer-ratio
    * Jaccard — are identical to the string formulation the oracle runs).
    */
  /** TF-weighted Jaccard near-dup pairs — the multiset refinement of
    * [[ngramJaccardPairs]]: `WJ(a, b) = Σ_t min(tf_a, tf_b) /
    * Σ_t max(tf_a, tf_b)`, which a set Jaccard overstates when one doc
    * repeats a shared phrase (weighting is the standard fix). Computed
    * exactly from the identity `Σ max = T_a + T_b − Σ min` — one
    * candidate-restricted equi-join for the Σ min, two token-count
    * totals; all integer counts, so the ratio is exact.
    *
    * Blocking: candidates must share a RARE shingle (corpus df in
    * [2, maxDf]) — q16's blocking predicate; multiplicities are the
    * per-doc SHINGLE repeat counts (`shingleSize` word grams, 1 =
    * plain tokens); join keys are xxhash64 gram hashes (collision-free
    * w.h.p., so counts match the oracle's string formulation).
    */
  def weightedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                           threshold: Double, shingleSize: Int = 3,
                           maxDf: Long = 5L): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold out of (0,1]: $threshold")
    require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")
    val k = shingleSize
    val tf = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc"),
        TextAnalysis.tokensCol(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= k)
      .select(col("doc"), col("__tk"),
        explode(sequence(lit(1), size(col("__tk")) - (k - 1))).as("__p"))
      .select(col("doc"), xxhash64(concat_ws(" ",
        slice(col("__tk"), col("__p"), lit(k)))).as("h"))
      .groupBy(col("doc"), col("h"))
      .agg(count(lit(1)).as("tf"))
    val totals = tf.groupBy(col("doc")).agg(sum(col("tf")).as("t"))
    val rare = tf.groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2L, maxDf)).select(col("h"))
    val cand = groupedPairs(tf.join(rare, Seq("h"))
      .select(col("doc"), col("h")), Seq("h"), maxDf)
    val smin = cand
      .join(tf.select(col("doc").as("doc_a"), col("h"),
        col("tf").as("__ta")), Seq("doc_a"))
      .join(tf.select(col("doc").as("doc_b"), col("h"),
        col("tf").as("__tb")), Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(least(col("__ta"), col("__tb"))).as("__sm"))
    smin
      .join(totals.select(col("doc").as("doc_a"), col("t").as("__Ta")),
        Seq("doc_a"))
      .join(totals.select(col("doc").as("doc_b"), col("t").as("__Tb")),
        Seq("doc_b"))
      .withColumn("wjaccard", col("__sm").cast("double") /
        (col("__Ta") + col("__Tb") - col("__sm")).cast("double"))
      .filter(col("wjaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("wjaccard"), 6).as("wjaccard"))
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleSize: Int = 3,
                        maxDf: Long = 5L): DataFrame = {
    val arrays = sharedShingleArrays(docs, idCol, textCol, shingleSize)
    val tok = arrays.select(col("doc"), explode(col("sh")).as("h"))
    val cand = groupedPairs(tok, Seq("h"), maxDf)
    jaccardOfCandidates(cand, arrays, threshold)
  }

  /** Corpus novelty curve — the diminishing-returns measurement behind
    * "is more of this source still worth ingesting?": walking docs in
    * id order in buckets of `bucketSize`, how many NEVER-SEEN-BEFORE
    * shingles does each bucket contribute, and cumulatively? A flat
    * cumulative tail means new data is re-treading old n-grams (the
    * saturation signal dedup/mixing decisions key on).
    *
    * One explode → min-agg (first_seen per shingle, map-side
    * combinable), one bucket count, and the cumulative comes from the
    * weighted range-rank core — no unpartitioned window even when the
    * curve has millions of buckets. Shingles are the 64-bit hashes the
    * whole dedup family joins on (counts identical to the string
    * formulation w.h.p. — the q16 equivalence the oracle replays).
    */
  def noveltyCurve(docs: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, bucketSize: Long = 50L): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    val firstSeen = sharedShingleArrays(docs, idCol, textCol, shingleSize)
      .select(col("doc"), explode(col("sh")).as("h"))
      .groupBy(col("h")).agg(min(col("doc")).as("first_seen"))
    val perBucket = firstSeen
      .select(expr(s"first_seen div $bucketSize").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_new"))
    Ranking.rangeRankMulti(perBucket, Seq("bucket"), Seq(Nil),
        Seq("cum_new"), weightCol = Some("n_new"))
      .select(col("bucket"), col("n_new"), col("cum_new"))
  }

  /** The MinHash index's swap-managed generation frames. A REBUILD
    * rewrites all three as one generation; an append swaps only
    * bands/dropped (shingles is append-only there — new files, no
    * generation hazard). See [[IndexSwap]]. PUBLIC so maintenance
    * tooling ([[Maintenance.sweepIndexDebris]], [[Maintenance.indexCard]])
    * can name the canonical family instead of hand-listing a subset —
    * recovery's all-staged-complete check only spans the frames it is
    * given, so a partial list can promote half a torn generation. */
  val minhashFrames = Seq("shingles", "bands", "dropped")
  private val minhashAppendFrames = Seq("bands", "dropped")

  /** Persist a MinHash-LSH near-dup index of a corpus, so later batches
    * dedup AGAINST it without re-signing the corpus — the incremental
    * form every production dedup service needs (the near-dup sibling of
    * [[incrementalExact]]). Layout: `dir/bands` = (doc, band, bucket)
    * candidate keys, `dir/shingles` = (doc, sorted shingle array) for
    * exact verification. Mega-buckets (> `maxBucket` docs) are dropped
    * AT BUILD time — the same skew guard / recall trade as the
    * in-memory path, paid once instead of per probe.
    */
  def writeMinhashIndex(docs: DataFrame, dir: String,
                        idCol: String, textCol: String,
                        shingleSize: Int = 3, numHashes: Int = 32,
                        rowsPerBand: Int = 4,
                        maxBucket: Long = 1000L): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    IndexSwap.clean(fs, dir, minhashFrames)
    val arrays = sharedShingleArrays(docs, idCol, textCol, shingleSize)
    arrays.write.mode("overwrite")
      .parquet(IndexSwap.stagedPath(dir, "shingles"))
    val banded = bandedOf(signaturesFromShingleArrays(arrays, numHashes),
      numHashes, rowsPerBand)
    val w = Window.partitionBy(col("band"), col("bucket"))
    // the over-cap (band, bucket) KEYS are persisted too (`dir/dropped`):
    // an append can never recover a dropped bucket's members without
    // re-signing the corpus, so the key set is the contract that keeps
    // [[appendMinhashIndex]] ≡ rebuild exact — a batch doc landing in a
    // once-dropped bucket must stay out of it, as it would in a rebuild
    val counted = banded.withColumn("__n", count(lit(1)).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      counted.filter(col("__n") <= maxBucket).drop("__n")
        .write.mode("overwrite")
        .parquet(IndexSwap.stagedPath(dir, "bands"))
      counted.filter(col("__n") > maxBucket)
        .select(col("band"), col("bucket")).distinct()
        .write.mode("overwrite")
        .parquet(IndexSwap.stagedPath(dir, "dropped"))
    } finally counted.unpersist()
    // a REBUILD over a live index publishes as one generation too — a
    // crash mid-build can no longer pair new shingles with old bands
    IndexSwap.swapAll(fs, dir, minhashFrames)
  }

  /** Incremental index maintenance — the 100 TB append path: sign ONLY
    * the new batch, union its band keys into the persisted index, and
    * re-apply the mega-bucket cap to the TOUCHED (band, bucket) groups
    * only; untouched groups pass through unrecounted. The result is
    * EXACTLY the index [[writeMinhashIndex]] would build over
    * corpus ∪ batch: kept buckets accumulate both sides' keys, a
    * touched bucket pushed past `maxBucket` is dropped whole (and its
    * key recorded), and a build-time-dropped bucket stays dropped —
    * batch keys landing in it are discarded via the persisted
    * `dir/dropped` key set, since the bucket's corpus members are
    * unrecoverable without the re-sign this function exists to avoid.
    *
    * Parameters must match the build (same contract as
    * [[nearDupsFromIndex]]). Ids already IN the index are dropped from
    * the batch (`dedupeBatch`, default on): a failure-replayed batch —
    * foreachBatch is at-least-once — re-appends as a NO-OP instead of
    * duplicating keys, which upgrades the streaming path from
    * at-least-once to effectively-once. The guard is one column-pruned
    * anti-join against the stored doc ids; a bulk loader that
    * guarantees fresh ids can pass `dedupeBatch = false` and skip it.
    * The bands/dropped frames are index-KEY-scale (never corpus text):
    * the rewrite is staged to sibling dirs and swapped via FS rename,
    * because the new frames read the live dirs — an in-place overwrite
    * would corrupt its own input. (A bucket-partitioned bands layout
    * would rewrite only touched partitions; at the current layout the
    * key frame rewrite is one shuffle of (doc, band, bucket) longs.)
    * Batch shingle arrays append as new files — corpus arrays are
    * never rewritten.
    */
  def appendMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                         dir: String, batch: DataFrame,
                         idCol: String, textCol: String,
                         shingleSize: Int = 3, numHashes: Int = 32,
                         rowsPerBand: Int = 4,
                         maxBucket: Long = 1000L,
                         dedupeBatch: Boolean = true): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    IndexSwap.recover(fs, dir, minhashFrames)
    // Two shapes, picked by whether a just-run probe already signed the
    // batch. Per-doc signing commutes with the already-indexed filter,
    // so both compute the same rows:
    //  - PROBE-WARM (streaming probe-then-append,
    //    [[graft.streaming.StreamingNearDup.processBatch]]): the probe
    //    ([[nearDupsFromIndex]]) cached the full-batch shingle frame.
    //    Sign the FULL batch (CacheManager substitutes the probe's
    //    cache — tokenize+shingle+sort runs ONCE per micro-batch) and
    //    anti-join the SIGNED arrays against the stored ids.
    //  - COLD (one-shot bulk append, no probe): signing the full batch
    //    first would tokenize+shingle rows the anti-join is about to
    //    drop AND shuffle the heavy shingle-array payload through the
    //    anti-join. Anti-join the cheap raw (id, text) rows first and
    //    sign only the remainder — the r15 shape, which a blanket
    //    sign-first rewrite regressed 31% on the batch path (r16
    //    verdict); the probe-cache guard keeps both paths optimal.
    // Dataset.storageLevel does the CacheManager lookup (sameResult on
    // the canonicalized plan) without touching private Spark API.
    val signedPlan = sharedShingleArraysPlan(batch, idCol, textCol,
      shingleSize)
    val probeWarm = signedPlan.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE
    val bArrays =
      if (!dedupeBatch)
        sharedShingleArrays(batch, idCol, textCol, shingleSize)
      else if (probeWarm)
        sharedShingleArrays(batch, idCol, textCol, shingleSize)
          .join(spark.read.parquet(s"$dir/shingles").select(col("doc")),
            Seq("doc"), "left_anti")
      else
        // parallelize the BATCH side before the anti-join: the joined
        // frame's inputFiles includes the index dir, so the downstream
        // un-starve check inside docShingleArrays would see >= cores
        // files and leave the signing stage at the 1-task scan's width
        sharedShingleArrays(
          FrameOps.parallelized(batch.select(col(idCol), col(textCol)))
            .join(spark.read.parquet(s"$dir/shingles")
                .select(col("doc").as(idCol)),
              Seq(idCol), "left_anti"),
          idCol, textCol, shingleSize)
    val bBands = bandedOf(signaturesFromShingleArrays(bArrays, numHashes),
      numHashes, rowsPerBand)
    // pre-`dropped` indexes (none in this repo's history, but the read
    // is guarded): treat the key set as empty
    val dropped0 =
      if (fs.exists(p(s"$dir/dropped"))) spark.read.parquet(s"$dir/dropped")
      else bBands.select(col("band"), col("bucket")).limit(0)
    val live = bBands.join(dropped0, Seq("band", "bucket"), "left_anti")
    val iBands = spark.read.parquet(s"$dir/bands")
    val touched = live.select(col("band"), col("bucket")).distinct()
    val storedTouched = iBands.join(touched, Seq("band", "bucket"),
      "left_semi")
    val storedUntouched = iBands.join(touched, Seq("band", "bucket"),
      "left_anti")
    val w = Window.partitionBy(col("band"), col("bucket"))
    // distinct before the cap recount: in the crash window where a
    // prior append's SWAP landed but its shingle-append did not, the
    // replayed batch (not deduped — its docs are missing from shingles)
    // re-delivers band keys the stored side already holds; without the
    // distinct those keys would duplicate and inflate bucket counts
    val counted = storedTouched
      .unionByName(live.select(iBands.columns.map(col): _*))
      .dropDuplicates(iBands.columns.toIndexedSeq)
      .withColumn("__n", count(lit(1)).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the Seq-key semi/anti joins reorder columns to (band, bucket,
      // doc); restore the build layout so append preserves the schema
      val newBands = storedUntouched.unionByName(
        counted.filter(col("__n") <= maxBucket).drop("__n"))
        .select(iBands.columns.map(col): _*)
      val newDropped = dropped0.unionByName(
        counted.filter(col("__n") > maxBucket)
          .select(col("band"), col("bucket")).distinct())
      newBands.write.mode("overwrite")
        .parquet(IndexSwap.stagedPath(dir, "bands"))
      newDropped.write.mode("overwrite")
        .parquet(IndexSwap.stagedPath(dir, "dropped"))
    } finally counted.unpersist()
    // both frames staged complete → publish as ONE generation (no
    // crash point leaves bands/dropped mixed or missing)
    IndexSwap.swapAll(fs, dir, minhashAppendFrames)
    bArrays.write.mode("append").parquet(s"$dir/shingles")
  }

  /** One-row recall-cap ledger of a persisted MinHash index — the
    * dedup-family staleness monitor next to the PQ append's
    * reconstruction-error audit ([[Pq.stalenessAudit]]): the banded
    * index drops over-cap (band, bucket) keys (the skew guard that
    * bounds within-bucket pair cost) and persists the key set in
    * `dir/dropped`; as appends grow the index, the operating question
    * is how much candidate surface the caps are costing — a rising
    * `dropped_rate` means recall is quietly leaking and the cap (or
    * the banding) needs re-sizing BEFORE the next 10× of corpus.
    * `n_buckets` = live kept bucket keys, `n_dropped` = dropped keys,
    * `dropped_rate` = n_dropped / (n_buckets + n_dropped) (one IEEE
    * division, 6 dp). Run it after each append and alarm on the
    * trend, exactly like the PQ `stale` flag.
    *
    * Scale: two column-pruned KEY-frame scans with map-side-combinable
    * counts — the shingle store (the corpus-scale frame) is never
    * read.
    */
  def droppedAudit(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexSwap.recover(fs, dir, minhashFrames)
    val kept = spark.read.parquet(s"$dir/bands")
      .select(col("band"), col("bucket")).distinct()
      .agg(count(lit(1)).as("n_buckets"))
    // pre-`dropped` indexes: same guard as [[appendMinhashIndex]]'s
    // dropped0 — the audit must report zero, not throw path-not-found
    val dropped =
      (if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/dropped")))
         spark.read.parquet(s"$dir/dropped")
       else spark.range(0).select(col("id").as("band")))
        .agg(count(lit(1)).as("n_dropped"))
    kept.crossJoin(dropped) // one-row sides — AQE broadcasts
      .select(col("n_buckets"), col("n_dropped"),
        round(col("n_dropped").cast("double") /
          (col("n_buckets") + col("n_dropped")).cast("double"), 6)
          .as("dropped_rate"))
  }

  /** Near-dup pairs of a NEW batch: batch×index pairs (via equi-join of
    * the batch's band keys against the stored bands — the corpus is
    * never re-signed) plus within-batch pairs, all exact-Jaccard
    * verified at `threshold`. The stored shingle arrays are semi-joined
    * down to the candidate doc ids and cached BEFORE the two verify
    * joins, so the heavy array decode touches candidate rows only (the
    * band-key scan itself is one pass over the stored keys; a
    * bucket-partitioned bands layout would add partition pruning on
    * top). Parameters must match the index build; ids must be unique
    * across corpus ∪ batch (same contract as [[incrementalExact]]).
    * Pairs are oriented doc_a < doc_b.
    */
  def nearDupsFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                        batch: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleSize: Int = 3,
                        numHashes: Int = 32, rowsPerBand: Int = 4,
                        maxBucket: Long = 1000L): DataFrame = {
    IndexSwap.recover(new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      dir, minhashFrames)
    val bArrays = sharedShingleArrays(batch, idCol, textCol, shingleSize)
    val bBands = bandedOf(signaturesFromShingleArrays(bArrays, numHashes),
      numHashes, rowsPerBand)
    val iBands = spark.read.parquet(s"$dir/bands")
    val cross = bBands
      .join(iBands.select(col("band"), col("bucket"), col("doc").as("__di")),
        Seq("band", "bucket"))
      .filter(col("doc") =!= col("__di"))
      .select(least(col("doc"), col("__di")).as("doc_a"),
        greatest(col("doc"), col("__di")).as("doc_b"))
      .distinct()
    val within = groupedPairs(bBands, Seq("band", "bucket"), maxBucket)
    // disjoint by construction (cross always has one index-side doc),
    // so a plain union needs no dedup
    val cand = TrackedCaches.track(cross.union(within)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the verify step consumes the array frame TWICE (doc_a and doc_b
    // joins): prune the store to candidate docs first, and cache the
    // pruned result so the store is decoded once, not twice
    val needed = cand.select(col("doc_a").as("doc"))
      .union(cand.select(col("doc_b").as("doc"))).distinct()
    // array_compact: parquet read-back surfaces array elements as
    // nullable, which the codegen SortedIntersectCount rejects; the
    // stored arrays are null-free, so compacting is a type-level no-op
    val stored = spark.read.parquet(s"$dir/shingles")
      .select(col("doc"), array_compact(col("sh")).as("sh"))
      .join(needed, Seq("doc"), "left_semi")
    val allArrays = TrackedCaches.track(
      bArrays.select(col("doc"), col("sh")).union(stored)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    jaccardOfCandidates(cand, allArrays, threshold)
  }

  /** Per-document memorization-risk readout — the CROSS-document
    * complement of the Gopher within-doc repetition features: what
    * fraction of each document's distinct n-gram shingles occurs in
    * at least one OTHER document (per-doc shingles are distinct, so
    * corpus df ≥ 2 ⟺ shared). High `shared_frac6` marks documents a
    * model could reproduce verbatim from elsewhere in the corpus —
    * the per-DOC drill-down under q310's per-source burden.
    *
    * One explode over the shared (cached) shingle arrays, one
    * map-side-combinable df count, one join back, one per-doc rollup —
    * no pair generation anywhere (this is a UNARY readout, not a
    * pair detector).
    */
  def duplicatedShingleFraction(docs: DataFrame, idCol: String = "doc_id",
                                textCol: String = "text",
                                shingleSize: Int = 3): DataFrame = {
    val tok = sharedShingleArrays(docs, idCol, textCol, shingleSize)
      .select(col("doc"), explode(col("sh")).as("h"))
    val dfq = tok.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    tok.join(dfq, Seq("h"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= 2L, lit(1L)).otherwise(lit(0L)))
          .as("n_shared"))
      .select(col("doc").as(idCol), col("n_shingles"), col("n_shared"),
        round(col("n_shared").cast("double") /
          col("n_shingles").cast("double"), 6).as("shared_frac6"))
  }

  /** Corpus-level exact LINE dedup with document rewrite — the
    * C4/RefinedWeb boilerplate-removal step at line granularity:
    * every distinct line (exact string key) keeps exactly its FIRST
    * corpus occurrence — first = the minimum (doc id, line position)
    * under that total order — every other occurrence is dropped, and
    * each document is reassembled from its surviving lines in
    * original order. Output one row per input document:
    * `(idCol, clean_text, n_lines, n_removed)` — attrition visible,
    * never silent; a document losing every line emits `clean_text`
    * `""`.
    *
    * Scale shape: one explode, one map-side-combinable `min(struct)`
    * argmin per distinct line, one join back, one order-free
    * sorted-struct reassembly per doc (doc-length-bounded groups) —
    * no window over the corpus, no driver state. The first-occurrence
    * group/join keys on a 128-BIT HASH of the line (md5 → 16-byte
    * binary) by default: the argmin frame and the join shuffle carry a
    * fixed-width key instead of arbitrary-length line strings — at
    * 100 TB that is the difference between shuffling keys and
    * shuffling the corpus — with the usual w.h.p. collision caveat
    * (the wjaccard precedent; 2⁻⁶⁴-scale at any feasible line count).
    * `hashKey = false` keeps the exact-string key (correctness-first
    * twin; DedupSpec pins the two forms equal).
    */
  def lineDedup(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text",
                hashKey: Boolean = true): DataFrame = {
    val lines = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("lpos", "line")))
    val key = if (hashKey) unhex(md5(col("line").cast("binary"))) else col("line")
    val keyed = lines.withColumn("__k", key)
    val first = keyed.groupBy(col("__k"))
      .agg(min(struct(col(idCol).as("d"), col("lpos").as("p"))).as("f"))
      .select(col("__k"), col("f.d").as("__fd"), col("f.p").as("__fp"))
    keyed.join(first, Seq("__k"))
      .withColumn("__keep",
        col(idCol) === col("__fd") && col("lpos") === col("__fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(!col("__keep"), lit(1L)).otherwise(lit(0L)))
          .as("n_removed"),
        array_sort(collect_list(when(col("__keep"),
          struct(col("lpos").as("p"), col("line").as("s"))))).as("__ks"))
      .select(col(idCol),
        array_join(expr("transform(__ks, x -> x.s)"), "\n")
          .as("clean_text"),
        col("n_lines"), col("n_removed"))
  }

  /** Asymmetric shingle-containment pairs — the quote/subset detector
    * Jaccard structurally misses: a short document wholly quoted inside
    * a long one has `C(A→B) = |A∩B| / |A| = 1` while its Jaccard
    * `|A∩B| / |A∪B|` stays near |A|/|B| (tiny). The standard measure
    * for nested duplication (Broder's containment, the resemblance
    * companion).
    *
    * Same plan shape as [[ngramJaccardPairs]] — rare-shingle blocking
    * (df ≤ `maxDf`) generates candidates as an equi-join, the sorted
    * two-pointer merge counts the true intersection once per candidate
    * pair — and the same documented recall trade: a pair sharing ONLY
    * ubiquitous shingles escapes the blocking. Emits one row per
    * unordered candidate pair with BOTH directions' ratios
    * (exact integer ratios), kept when either reaches `threshold`.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, shingleSize: Int = 3,
                       maxDf: Long = 5L): DataFrame = {
    val arrays = sharedShingleArrays(docs, idCol, textCol, shingleSize)
    val tok = arrays.select(col("doc"), explode(col("sh")).as("h"))
    val cand = groupedPairs(tok, Seq("h"), maxDf)
    cand
      .join(arrays.select(col("doc").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(arrays.select(col("doc").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter",
        graft.functions.ArraySetOps.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("__ca", col("inter").cast("double") / size(col("sh_a")))
      .withColumn("__cb", col("inter").cast("double") / size(col("sh_b")))
      .filter(greatest(col("__ca"), col("__cb")) >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("__ca"), 6).as("cont_a_in_b"),
        round(col("__cb"), 6).as("cont_b_in_a"))
  }

  // ------------------------------------------------- cluster formation

  /** Connected components over near-dup pairs — the step AFTER pair
    * finding that every dedup pipeline needs: pairs (A,B),(B,C) must
    * collapse to ONE surviving document, not two independent removals.
    * Returns `(doc, cluster)` for every doc appearing in a pair, where
    * `cluster` is the smallest doc id in the component — which is also
    * the deterministic survivor, so `docs.join(cc.filter(doc =!= cluster),
    * "anti")` drops exactly the non-survivors.
    *
    * Algorithm: min-label propagation with pointer jumping to fixpoint.
    * Each round propagates the min label across edges AND adopts the
    * label of the current label (path halving), so rounds =
    * O(log component-diameter) at three label-keyed shuffles per round.
    * Near-dup components are template families — dense, near-clique,
    * tiny diameter — so 2-3 rounds close virtually any real corpus;
    * `maxIter` bounds adversarial chains and the operator THROWS if not
    * converged (silently partial clusters would under-dedup). Label state is one row per distinct doc — linear,
    * spillable, no driver-side structures; the fixpoint (min id reachable)
    * is unique, so the result is independent of partitioning and
    * iteration order.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    // Each round's label frame is localCheckpoint'd, not persist'd:
    // `next` references `labels` TWICE (propagation join + convergence
    // check), so with plain caching the logical tree doubles per round —
    // after k rounds every downstream action pays Catalyst analysis on a
    // 2^k-node plan (measured: ~3 s per action at 10 rounds, dominating
    // the actual sub-second execution). localCheckpoint truncates the
    // lineage to the materialized blocks (the standard Spark idiom for
    // iterative algorithms; at cluster scale swap in reliable
    // `checkpoint()` if executor loss during the loop must be survivable).
    def materialize(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
    // the checkpoint blocks live OUTSIDE the CacheManager; reach the RDD
    // through the LogicalRDD node to free them deterministically
    def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    def free(df: DataFrame): Unit =
      checkpointRdd(df).foreach(_.unpersist(blocking = false))
    // label(d) = min(d, min neighbor)
    var labels = materialize(edges.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("cluster"))
      .withColumnRenamed("src", "doc"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for d: min over neighbors of their current label
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc", "dst"), "dst")
        .groupBy(col("src").as("doc"))
        .agg(min(col("cluster")).as("nbr_cluster"))
      val stepped = labels.join(viaNeighbors, Seq("doc"), "left")
        .select(col("doc"),
          least(col("cluster"), coalesce(col("nbr_cluster"), col("cluster")))
            .as("cluster"))
      // pointer jumping: also adopt the label OF the current label (labels
      // only ever decrease and name component members, so this stays inside
      // the component and preserves the min-id fixpoint) — remaining
      // diameter halves per round, so chains close in O(log d) rounds
      // instead of O(d)
      val jumped = stepped
        .join(labels.select(col("doc").as("cluster"), col("cluster").as("hop")),
          Seq("cluster"), "left")
        .select(col("doc"),
          least(col("cluster"), coalesce(col("hop"), col("cluster")))
            .as("cluster"))
      val next = materialize(jumped)
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), "doc")
        .filter(col("cluster") =!= col("old")).limit(1).count()
      free(labels)
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds - " +
          "component diameter exceeds maxIter; raise it")
    // The returned labels stay materialized (recomputing a LogicalRDD is
    // impossible — the blocks ARE the data), so they are deliberately NOT
    // registered with releaseCaches(): releasing them would turn any later
    // use of the result into a hard error. The blocks are freed by Spark's
    // ContextCleaner as soon as the caller drops the frame (GC-based RDD
    // cleanup) — intermediates were already freed in-loop above.
    labels
  }

  /** Detector-evaluation MATRIX: precision/recall/F1 of each named
    * detector's (doc_a, doc_b) pair set against one exact-truth pair
    * set — the harness that turns "which near-dup detector should this
    * corpus use" into a measured table (q233's single-detector report
    * widened to a family comparison). One row per detector:
    * (detector, n_true, n_pred, tp, precision, recall, f1), null
    * precision/recall when the respective denominator is 0, F1 by the
    * q233 formula from UNROUNDED components.
    *
    * Scale shape: per detector one (doc_a, doc_b)-keyed full-outer join
    * of two already-thresholded pair frames (≪ corpus) plus a one-row
    * aggregate; the k-detector union is k rows. The expensive parts are
    * the detectors themselves — each already bucketed/blocked by its
    * own operator.
    */
  def detectorEval(truth: DataFrame,
                   detectors: Seq[(String, DataFrame)]): DataFrame = {
    require(detectors.nonEmpty, "need at least one detector")
    val t = truth.select(col("doc_a"), col("doc_b")).withColumn("__t", lit(1))
    val counts = detectors.map { case (name, pred) =>
      t.join(pred.select(col("doc_a"), col("doc_b")).withColumn("__p", lit(1)),
          Seq("doc_a", "doc_b"), "full_outer")
        .agg(count(col("__t")).as("n_true"), count(col("__p")).as("n_pred"),
          sum(when(col("__t").isNotNull && col("__p").isNotNull, 1L)
            .otherwise(0L)).as("tp"))
        .select(lit(name).as("detector"), col("n_true"), col("n_pred"),
          col("tp"))
    }.reduce(_.union(_))
    val p = col("tp").cast("double") / col("n_pred").cast("double")
    val r = col("tp").cast("double") / col("n_true").cast("double")
    counts
      .withColumn("precision", when(col("n_pred") > 0, round(p, 6)))
      .withColumn("recall", when(col("n_true") > 0, round(r, 6)))
      .withColumn("f1", when(col("n_pred") > 0 && col("n_true") > 0,
        when(p + r > 0, round(lit(2.0) * p * r / (p + r), 6))
          .otherwise(lit(0.0))))
  }

  /** Keep-BEST-copy survivor selection — the production refinement of
    * the keep-lowest-id rule every dedup stage here defaults to: within
    * each duplicate cluster (a [[connectedComponents]] frame), the
    * survivor is the member with the HIGHEST `scoreCol` (the cleanest /
    * longest / best-quality copy; ties to the lowest id), and docs in
    * no cluster survive by definition. One row per input doc:
    * (idCol, cluster — null for singletons, score, survivor).
    *
    * Null-score contract: a member with a null `scoreCol` never wins a
    * cluster over a scored member (nulls rank below every real score —
    * without the coalesce below, Spark's struct ordering would sort the
    * null field FIRST and a null-scored doc would win its cluster); a
    * cluster whose members are ALL null-scored falls back to the
    * lowest-id rule. NaN scores are treated as UNSCORED, same as null:
    * a negated NaN is still NaN, which Spark's total ordering ranks
    * ABOVE +Infinity, so without the nanvl below a NaN-scored member
    * would rank below even null-scored ones — inverting the contract.
    *
    * Scale shape: one left join onto the cluster frame (∝ duplicate
    * docs, not the corpus), a map-side-combinable min(struct) argmax
    * per cluster, and a cluster-keyed join back — no window over the
    * corpus, no driver state.
    */
  def keepBest(scored: DataFrame, clusters: DataFrame,
               idCol: String = "doc_id",
               scoreCol: String = "score"): DataFrame = {
    val withC = scored
      .select(col(idCol), col(scoreCol).cast("double").as("__s"))
      .join(clusters.select(col("doc").as(idCol), col("cluster")),
        Seq(idCol), "left")
    val best = withC.filter(col("cluster").isNotNull)
      .groupBy(col("cluster"))
      .agg(min(struct(coalesce(nanvl(-col("__s"),
          lit(Double.PositiveInfinity)), lit(Double.PositiveInfinity))
        .as("n"), col(idCol).as("id"))).as("b"))
      .select(col("cluster"), col("b.id").as("__best"))
    withC.join(best, Seq("cluster"), "left")
      .select(col(idCol), col("cluster"),
        round(col("__s"), 6).as(scoreCol),
        (col("cluster").isNull || col(idCol) === col("__best"))
          .as("survivor"))
  }

  /** Preference pairs from duplicate clusters — the DPO/reward-model
    * data-prep step: within every near-dup cluster (near-identical
    * content, so a preference between members is about QUALITY, not
    * topic), `chosen` is the best-scored member and `rejected` the
    * worst, under ONE total order (score desc, id asc) — chosen =
    * its min(struct), rejected = its max(struct); ties break
    * deterministically. Unscored members (null/NaN) never pair —
    * filtered up front, documented contract (the [[keepBest]]
    * null-rank subtleties don't arise). CAVEAT that filter creates:
    * a cluster with exactly ONE scored member survives as a
    * degenerate row with `chosen_id == rejected_id` and margin 0
    * (n_members counts scored members only, so it reads 1 there) —
    * a DPO consumer must filter on `margin6 > 0` (or
    * `n_members >= 2`) before training; DedupSpec pins this
    * caller-visible shape.
    *
    * Output per cluster: `(cluster, n_members, chosen_id, rejected_id,
    * chosen_score6, rejected_score6, margin6)`; margin ≥ 0.
    *
    * Scale: one join onto the cluster frame (∝ duplicate docs), one
    * map-side-combinable min/max(struct) agg — no window, no driver
    * state.
    */
  def preferencePairs(scored: DataFrame, clusters: DataFrame,
                      idCol: String = "doc_id",
                      scoreCol: String = "score"): DataFrame = {
    val m = scored
      .select(col(idCol), col(scoreCol).cast("double").as("__s"))
      .filter(col("__s").isNotNull && !isnan(col("__s")))
      .join(clusters.select(col("doc").as(idCol), col("cluster")),
        Seq(idCol))
    m.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("__s")).as("n"), col(idCol).as("id"))).as("c"),
        max(struct((-col("__s")).as("n"), col(idCol).as("id"))).as("r"))
      .select(col("cluster"), col("n_members"),
        col("c.id").as("chosen_id"), col("r.id").as("rejected_id"),
        round(-col("c.n"), 6).as("chosen_score6"),
        round(-col("r.n"), 6).as("rejected_score6"),
        round(col("r.n") - col("c.n"), 6).as("margin6"))
  }
}
