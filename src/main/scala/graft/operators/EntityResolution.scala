package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / fuzzy matching: find pairs of records whose string
  * keys are within an edit-distance threshold WITHOUT an all-pairs
  * comparison — the dedup-adjacent primitive for linking near-identical
  * titles, names, or addresses across two feeds.
  *
  * Blocking-then-verify, the standard ER decomposition:
  *   1. normalize (lower + trim + truncate to `maxLen` so the verify
  *      cost is bounded per pair);
  *   2. BLOCK on the normalized prefix (`blockLen` chars) — an
  *      equi-join, so candidate generation is a hash shuffle on the
  *      block key, never a cross join;
  *   3. VERIFY candidates with `levenshtein` (codegen'd builtin,
  *      O(maxLen²) per pair, only inside blocks).
  *
  * 100 TB story: cost is Σ |block_L|·|block_R| over block keys — linear
  * in the corpus for bounded block sizes. Prefix blocking trades recall
  * for that bound (a typo inside the first `blockLen` chars escapes the
  * block; multi-pass blocking on different keys is the standard recall
  * fix and composes by unioning pair sets). The verify join carries only
  * (id, normalized key) — never the full record width.
  */
object EntityResolution {

  private def norm(c: Column, maxLen: Int): Column =
    substring(lower(trim(c)), 1, maxLen)

  /** Candidate pairs (id_a, id_b, dist) with dist <= maxDist, blocked on
    * the normalized `blockLen`-char prefix. Left/right may be the same
    * frame (self-linkage): pass `selfPairs = true` to emit each unordered
    * pair once (id_a < id_b) instead of both directions.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                idCol: String, nameCol: String,
                blockLen: Int = 12, maxLen: Int = 64, maxDist: Int = 8,
                selfPairs: Boolean = false): DataFrame = {
    require(blockLen >= 1 && blockLen <= maxLen,
      s"need 1 <= blockLen <= maxLen, got blockLen=$blockLen maxLen=$maxLen")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    def side(df: DataFrame, suffix: String) =
      df.select(col(idCol).as(s"id_$suffix"),
        norm(col(nameCol), maxLen).as(s"nm_$suffix"))
        .withColumn(s"blk_$suffix", substring(col(s"nm_$suffix"), 1, blockLen))
    val a = side(left, "a")
    val b = side(right, "b")
    // null-safe inequality: a null id on either side is still a real
    // candidate record — plain =!= would return NULL and silently drop
    // the pair from the linkage output
    val pairCond =
      if (selfPairs) col("id_a") < col("id_b")
      else !(col("id_a") <=> col("id_b"))
    a.join(b, col("blk_a") === col("blk_b"))
      .filter(pairCond)
      // cheap length pre-filter: |len(a)-len(b)| is a lower bound on the
      // edit distance, so the quadratic verify never runs on pairs it
      // cannot accept
      .filter(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Blocked fuzzy join scored with Jaro-Winkler instead of edit
    * distance — the record-linkage score of choice for short name keys
    * (normalized to [0,1]; prefix-weighted the way human-entered names
    * diverge). Verification uses graft's native codegen
    * [[graft.functions.StringSimilarity.JaroWinkler]] expression, so the
    * verify stage runs inside WholeStageCodegen.
    *
    * Pre-filter: Jaro-Winkler is bounded above by the byte-length ratio —
    * with `m <= min(l1,l2)` matches, `jaro <= (2 + min/max)/3` and the
    * Winkler boost is monotone, so `jw <= 0.4 + 0.6*(2+min/max)/3`. Pairs
    * whose lengths alone cap them below `minSim` are dropped BEFORE the
    * O(len²) matching loop (output-invariant: only provably-failing pairs
    * are pruned, so an oracle need not replicate the pre-filter).
    *
    * 100 TB story: identical shape to [[fuzzyJoin]] — candidate
    * generation is a hash equi-join on the block key, verify cost is
    * Σ |block_L|·|block_R| bounded by the length prune, and the join
    * carries only (id, ≤`maxLen`-byte normalized key).
    */
  def jaroWinklerJoin(left: DataFrame, right: DataFrame,
                      idCol: String, nameCol: String,
                      blockLen: Int = 12, maxLen: Int = 64,
                      minSim: Double = 0.9,
                      selfPairs: Boolean = false): DataFrame = {
    require(blockLen >= 1 && blockLen <= maxLen,
      s"need 1 <= blockLen <= maxLen, got blockLen=$blockLen maxLen=$maxLen")
    require(minSim >= 0.0 && minSim <= 1.0, s"minSim in [0,1], got $minSim")
    def side(df: DataFrame, suffix: String) =
      df.select(col(idCol).as(s"id_$suffix"),
        norm(col(nameCol), maxLen).as(s"nm_$suffix"))
        .withColumn(s"blk_$suffix", substring(col(s"nm_$suffix"), 1, blockLen))
    val a = side(left, "a")
    val b = side(right, "b")
    val pairCond =
      if (selfPairs) col("id_a") < col("id_b")
      else !(col("id_a") <=> col("id_b"))
    val lo = least(octet_length(col("nm_a")), octet_length(col("nm_b")))
      .cast("double")
    val hi = greatest(octet_length(col("nm_a")), octet_length(col("nm_b")))
      .cast("double")
    val jwUpperBound = lit(0.4) + lit(0.6) * (lit(2.0) + lo / hi) / lit(3.0)
    a.join(b, col("blk_a") === col("blk_b"))
      .filter(pairCond)
      // 1e-9 slack so double rounding at the boundary never drops a pair
      // whose true score equals minSim exactly
      .filter(jwUpperBound >= lit(minSim - 1e-9))
      .withColumn("jw",
        graft.functions.StringSimilarity.jaroWinklerCol(col("nm_a"), col("nm_b")))
      .filter(col("jw") >= lit(minSim))
      .select(col("id_a"), col("id_b"), col("jw"))
  }

  /** [[fuzzyJoin]] with full Damerau-Levenshtein verification
    * ([[graft.functions.StringSimilarity.DamerauLevenshtein]] — native
    * codegen, Lowrance-Wagner with transpositions): adjacent-character
    * swaps, the single most common human typo class, cost 1 edit instead
    * of levenshtein's 2, so a swap-heavy near-match survives a tight
    * `maxDist` that plain edit distance would reject. Same blocking,
    * same |len| pre-filter (|len(a)−len(b)| lower-bounds DL too), same
    * Σ |block_L|·|block_R| scale shape.
    */
  def damerauJoin(left: DataFrame, right: DataFrame,
                  idCol: String, nameCol: String,
                  blockLen: Int = 12, maxLen: Int = 64, maxDist: Int = 8,
                  selfPairs: Boolean = false): DataFrame = {
    require(blockLen >= 1 && blockLen <= maxLen,
      s"need 1 <= blockLen <= maxLen, got blockLen=$blockLen maxLen=$maxLen")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    def side(df: DataFrame, suffix: String) =
      df.select(col(idCol).as(s"id_$suffix"),
        norm(col(nameCol), maxLen).as(s"nm_$suffix"))
        .withColumn(s"blk_$suffix", substring(col(s"nm_$suffix"), 1, blockLen))
    val a = side(left, "a")
    val b = side(right, "b")
    val pairCond =
      if (selfPairs) col("id_a") < col("id_b")
      else !(col("id_a") <=> col("id_b"))
    a.join(b, col("blk_a") === col("blk_b"))
      .filter(pairCond)
      .filter(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
      .withColumn("dist",
        graft.functions.StringSimilarity.damerauLevenshteinCol(
          col("nm_a"), col("nm_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Leading-`n`-chars block key — [[fuzzyJoin]]'s default. A typo in
    * the first `n` chars escapes the block.
    */
  def prefixBlock(n: Int): Column => Column = nm => substring(nm, 1, n)

  /** Trailing-`n`-chars block key, built as prefix-of-reverse: both
    * Spark and standard SQL engines clamp `substr(s, 1, n)` identically
    * on short strings, where negative-position substring semantics
    * diverge. Catches the leading-chars typos prefix blocking misses.
    */
  def suffixBlock(n: Int): Column => Column =
    nm => substring(reverse(nm), 1, n)

  /** Space-delimited tokens, sorted and rejoined — blocks word
    * reorderings ("doe john" / "john doe") into the same bucket.
    */
  def sortedTokensBlock: Column => Column =
    nm => concat_ws(" ", array_sort(split(nm, " +")))

  /** Multi-pass blocking — the standard recall fix for single-key
    * blocking: run one candidate-generation pass per block key, union
    * the pair sets, dedup, then VERIFY each distinct pair exactly once.
    * A pair is found if ANY key blocks it together (e.g. a first-char
    * typo escapes [[prefixBlock]] but not [[suffixBlock]]).
    *
    * Scale shape: each pass is the same bounded equi-join as
    * [[fuzzyJoin]] (cost Σ over passes of Σ |block_L|·|block_R|); the
    * union dedups on (id_a, id_b) with one hash shuffle carrying only
    * ids + normalized names (≤ `maxLen` chars), and the O(maxLen²)
    * levenshtein runs once per DISTINCT candidate pair, however many
    * keys blocked it together.
    */
  def fuzzyJoinMulti(left: DataFrame, right: DataFrame,
                     idCol: String, nameCol: String,
                     blockKeys: Seq[Column => Column],
                     maxLen: Int = 64, maxDist: Int = 8,
                     selfPairs: Boolean = false): DataFrame = {
    require(blockKeys.nonEmpty, "fuzzyJoinMulti needs at least one block key")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val a = left.select(col(idCol).as("id_a"),
      norm(col(nameCol), maxLen).as("nm_a"))
    val b = right.select(col(idCol).as("id_b"),
      norm(col(nameCol), maxLen).as("nm_b"))
    val pairCond =
      if (selfPairs) col("id_a") < col("id_b")
      else !(col("id_a") <=> col("id_b"))
    val candidates = blockKeys.map { bk =>
      a.withColumn("__blk_a", bk(col("nm_a")))
        .join(b.withColumn("__blk_b", bk(col("nm_b"))),
          col("__blk_a") === col("__blk_b"))
        .filter(pairCond)
        // length pre-filter per pass: shrinks the union/dedup shuffle
        .filter(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
        .select(col("id_a"), col("nm_a"), col("id_b"), col("nm_b"))
    }.reduce(_ union _)
    candidates
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
