package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting — the
  * train/val/test assignment every training-data pipeline needs, with
  * three properties `rand()` cannot give:
  *  - stable under reruns, repartitioning and cluster size (a pure
  *    function of the row's id);
  *  - consistent across engines (md5 is bit-identical everywhere, and the
  *    threshold test compares hex PREFIXES lexicographically — no
  *    hex-to-int parsing, which SQL dialects disagree on);
  *  - exact joinability: the same id lands in the same split in every
  *    table that derives from it.
  *
  * An id's bucket is the first 4 hex chars of `md5(id)` (16 bits uniform);
  * split boundaries are hex-string thresholds, so `fraction` resolution
  * is 1/65536.
  */
object Sampling {

  /** Lowercase 4-hex-digit threshold for a fraction in [0, 1]. Fraction
    * 1.0 returns "g", which sorts above every hex string — capping at
    * "ffff" would silently exclude the bucket-"ffff" rows from a
    * fraction-1.0 sample or make an 80/20 split leak a phantom test set.
    */
  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    val n = math.round(fraction * 65536)
    if (n >= 65536) "g" else f"$n%04x"
  }

  /** Null ids hash to the top bucket ("ffff"): excluded from any
    * sample/split fraction below 1.0, included at exactly 1.0 — the same
    * behavior from [[hashSample]] and [[deterministicSplit]].
    */
  private def bucket(id: Column): Column =
    coalesce(substring(md5(id.cast("string").cast("binary")), 1, 4), lit("ffff"))

  /** Keep a deterministic `fraction` of rows by id. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(bucket(col(idCol)) < lit(hexThreshold(fraction)))

  /** Assign `split` ∈ {train, val, test} with the given fractions
    * (test = remainder). Emits the split column (name overridable via
    * `outCol` so composing operators can use a reserved name instead of
    * silently clobbering a user's existing `split` column); rows keep
    * their data.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
                         trainFraction: Double = 0.8,
                         valFraction: Double = 0.1,
                         outCol: String = "split"): DataFrame = {
    require(trainFraction + valFraction <= 1.0, "fractions exceed 1")
    val b = bucket(col(idCol))
    df.withColumn(outCol,
      when(b < lit(hexThreshold(trainFraction)), "train")
        .when(b < lit(hexThreshold(trainFraction + valFraction)), "val")
        .otherwise("test"))
  }

  /** Leakage-safe train/val/test assignment: the split is decided by the
    * near-dup CLUSTER representative, not the row id, so every member of
    * a duplicate cluster lands in the same split — the guard against
    * test-set contamination through near-duplicates that a per-document
    * [[deterministicSplit]] cannot give (a doc and its 95%-identical
    * twin would otherwise split independently). `clusters` is a
    * `(memberCol, repCol)` frame — [[Dedup.connectedComponents]] output
    * fits directly; rows absent from it represent themselves.
    *
    * Scale: one equi-join against the cluster frame (∝ clustered docs,
    * typically a small fraction of the corpus — AQE broadcasts it when
    * small, hash-joins otherwise), then the same per-row md5 bucketing
    * as every other split. Emits `split_key` (the representative the
    * hash ran on, for audit) and `split`.
    */
  def clusterAwareSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                        memberCol: String = "doc", repCol: String = "cluster",
                        trainFraction: Double = 0.8,
                        valFraction: Double = 0.1): DataFrame = {
    // min-reduce the member → representative map first: a malformed
    // clusters frame with duplicate member rows (raw pair output instead
    // of component output) would otherwise fan corpus rows out through
    // the join AND hand one doc two different splits — precisely the
    // leakage this operator exists to prevent. One extra map-side
    // combinable agg on an already-∝-clustered-docs frame.
    val c = clusters.groupBy(col(memberCol).as("__caw_m"))
      .agg(min(col(repCol)).as("__caw_rep"))
    deterministicSplit(
      df.join(c, col(idCol) === col("__caw_m"), "left")
        .withColumn("split_key", coalesce(col("__caw_rep"), col(idCol)))
        .drop("__caw_m", "__caw_rep"),
      "split_key", trainFraction, valFraction)
  }

  /** Deterministic negative sampling for contrastive training: each row
    * gets `k` pseudo-random OTHER rows (`sample_no` 1..k), uniform over
    * the corpus, never itself, and a pure function of (id set, id, j) —
    * rerun-, partitioning- and engine-stable where `rand()` is none of
    * those. Mechanics: rows take a dense 0-based position from the
    * distributed rank core; negative j sits at position
    * `(pos + 1 + (md5(id ‖ '#' ‖ j) mod (n−1))) mod n` — the offset
    * never ≡ 0 (mod n), so self-pairing is impossible by construction.
    *
    * Scale: one global range-rank (dense positions), a k-way row-local
    * explode, and ONE hash equi-join position→id; the only broadcast is
    * the one-row corpus count.
    *
    * Contract: `idCol` is an IDENTITY — the operator samples over the
    * DISTINCT id set (one output group of `k` negatives per distinct
    * id). The distinct is enforced here (one map-side-combinable agg)
    * rather than assumed: with duplicate id VALUES a positional
    * "never-self" guarantee would be vacuous (a negative could equal
    * the anchor id via its duplicate) and rank assignment among
    * duplicates would be partition-order-arbitrary, voiding the
    * documented rerun/engine determinism this operator exists for.
    */
  def negativeSamples(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ids = df.select(col(idCol)).distinct()
    val ranked = Ranking.rangeRank(ids, Nil, Seq(idCol), "__ns_rk")
      .withColumn("__pos", col("__ns_rk") - 1L).drop("__ns_rk")
    val n = ranked.agg(count(lit(1)).as("__n"))
    val hashed = ranked.crossJoin(broadcast(n))
      .filter(col("__n") > 1L) // a 1-row corpus has no valid negative
      .select(col(idCol), col("__pos"), col("__n"),
        explode(array((1 to k).map(lit): _*)).as("sample_no"))
      .withColumn("__off", lit(1L) + pmod(
        conv(substring(md5(concat(col(idCol).cast("string"), lit("#"),
          col("sample_no").cast("string")).cast("binary")), 1, 13), 16, 10)
          .cast("long"),
        col("__n") - 1L))
      .withColumn("__neg_pos", pmod(col("__pos") + col("__off"), col("__n")))
    val lookup = ranked.select(col("__pos").as("__lk_pos"),
      col(idCol).as("negative_id"))
    hashed.join(lookup, col("__neg_pos") === col("__lk_pos"))
      .select(col(idCol), col("sample_no").cast("long").as("sample_no"),
        col("negative_id"))
  }

  /** The oracle-side SQL for the same bucket (kept adjacent so the two
    * cannot drift), INCLUDING the null-id convention: a null id buckets
    * to 'ffff' on both sides — without the coalesce, `NULL < threshold`
    * is NULL and the oracle would drop null-id rows that [[bucket]]
    * keeps at fraction 1.0.
    */
  private[graft] def bucketSql(idCol: String): String =
    s"coalesce(substr(md5(CAST($idCol AS VARCHAR)), 1, 4), 'ffff')"

  /** Weighted dataset mixing: keep a DIFFERENT deterministic fraction of
    * rows per group — the "40% web, 30% code, 5% forums" mix step of
    * training-corpus assembly. Same md5-bucket mechanics as
    * [[hashSample]] (stable under reruns/repartitioning/engines, exactly
    * joinable), with the per-group threshold resolved by a literal CASE
    * chain — zero shuffle, zero joins, pure row-local filter; groups
    * absent from `fractions` use `defaultFraction`. Because the bucket
    * is a pure function of the id, RAISING a group's fraction later
    * yields a superset of the earlier sample (monotone, like
    * [[hashSample]]) — reproducible mix evolution.
    */
  def weightedMix(df: DataFrame, groupCol: String, idCol: String,
                  fractions: Map[String, Double],
                  defaultFraction: Double = 0.0): DataFrame = {
    val thresholds = fractions.toSeq.sortBy(_._1)
    val threshold = thresholds.foldRight(
      lit(hexThreshold(defaultFraction))) { case ((g, f), elseCol) =>
      when(col(groupCol) === g, lit(hexThreshold(f))).otherwise(elseCol)
    }
    df.filter(bucket(col(idCol)) < threshold)
  }

  /** Weighted round-robin interleave: a global consumption ORDER over
    * the corpus such that every prefix holds `weights(g)` rows of group
    * g per epoch — the ordered complement of [[weightedMix]] (which
    * subsets): a data loader reading rows in `mix_rank` order sees the
    * target mixture at every point of training, not just in aggregate.
    * Integer-exact: epoch = (src_rank − 1) DIV weight, so the schedule
    * is deterministic and engine-replayable with no float ordering. A
    * group exhausts (its source runs dry) by simply dropping out of
    * later epochs.
    *
    * Scale: two passes of the distributed range-rank core (per-group
    * rank, then the global (epoch, group, rank) order) — range sorts,
    * never a single-task `OVER ()` window. `tieCols` must totally order
    * rows within a group.
    */
  def weightedInterleave(df: DataFrame, groupCol: String,
                         tieCols: Seq[String], weights: Map[String, Long],
                         defaultWeight: Long = 1L): DataFrame = {
    require(defaultWeight >= 1L, s"defaultWeight must be >= 1, got $defaultWeight")
    require(weights.values.forall(_ >= 1L), "weights must be >= 1")
    val w = weights.toSeq.sortBy(_._1).foldRight(lit(defaultWeight)) {
      case ((g, wt), elseCol) => when(col(groupCol) === g, lit(wt)).otherwise(elseCol)
    }
    val ranked = Ranking.rangeRank(df, Seq(groupCol), tieCols, "src_rank")
      .withColumn("__w", w)
      .withColumn("epoch", expr("(src_rank - 1) DIV __w"))
      .drop("__w")
    Ranking.rangeRank(ranked, Nil,
      Seq("epoch", groupCol) ++ Seq("src_rank"), "mix_rank")
  }

  /** Keep the top `fraction` of each group by `scoreCol` (descending,
    * ties broken by `tieCol`) — "best 20% per source by quality score",
    * the percentile-threshold curation filter. Cutoff =
    * `ceil(fraction · group size)`, so every non-empty group keeps at
    * least one row. One shuffle on the group key; rank and count share
    * the same window sort.
    */
  def topFractionPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                          fraction: Double, tieCol: String): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.withColumn("__rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rank") <= ceil(lit(fraction) * col("__n")))
      .drop("__rank", "__n")
  }

  /** Per-group quota sampling: keep at most `quota` rows per `groupCol`
    * value — the "at most N documents per source/domain" cap every
    * training-data mix needs. Selection is deterministic and engine
    * portable: rows rank by (md5 of id, id) within their group, so the
    * kept set is stable under reruns, repartitioning, and engines, and
    * uniformly "random" in id. One shuffle on the group key; per-group
    * state in the window sort is the group's rows (spillable sort, no
    * aggregation buffer). A skew-heavy group costs its own sort only —
    * no cross-group interaction.
    */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
                  quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    df.withColumn("__rk", row_number().over(idOrderWindow(groupCol, idCol)))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** The shared engine-portable pseudo-random within-group order:
    * (md5 of the id's string bytes, then the id as tiebreak). ONE
    * definition — the oracle SQL mirrors this expression verbatim, so
    * [[quotaSample]] and [[stratifiedKFold]] must never drift apart.
    * Total only when ids are unique within the group: duplicate (or
    * repeated-null) ids tie completely and their relative order is
    * partition-dependent.
    */
  private def idOrderWindow(groupCol: String, idCol: String) =
    org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))

  /** Stratified k-fold assignment — cross-validation folds that are
    * EXACTLY balanced within every stratum (fold sizes differ by at most
    * one per stratum), unlike a plain `hash(id) % k`, whose per-stratum
    * balance is only statistical. Rows rank within their stratum by
    * (md5 of id, id) — the same engine-portable pseudo-random order as
    * [[quotaSample]] — and fold = (rank - 1) % k, so the assignment is
    * deterministic, stable under repartitioning, and uniformly shuffled
    * in id.
    *
    * One shuffle on the stratum key; the window sort is per-stratum and
    * spillable. For strata too large to sort (or when only statistical
    * balance is needed), `hash-mod on the id` is the O(1) fallback — the
    * md5 bucket from [[hashSample]] mod k gives that directly.
    *
    * Determinism requires `idCol` to be unique within each stratum:
    * duplicate ids tie on the whole sort key, so their fold assignment
    * (though still size-balanced) is partition-dependent.
    */
  def stratifiedKFold(df: DataFrame, strataCol: String, idCol: String,
                      k: Int, outCol: String = "fold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn(outCol,
      (row_number().over(idOrderWindow(strataCol, idCol)) - 1) % k)
  }

  /** Weighted sampling WITHOUT replacement, k per group — importance
    * sampling where a row's inclusion odds scale with its weight
    * (quality score, token count, recency), the step between uniform
    * [[quotaSample]] and deterministic [[topFractionPerGroup]]: high
    * weight raises the odds but never guarantees inclusion.
    *
    * Efraimidis–Spirakis exponential sort: key = −ln(u)/w with u a
    * uniform from the id's md5 (top 13 hex chars = 52 bits, exact in a
    * double; +1 keeps u in (0, 1] so ln never sees 0) — the k smallest
    * keys per group are exactly a weight-proportional draw without
    * replacement, and the sample is a pure function of (id, weight):
    * stable under reruns, partitioning, and engines.
    *
    * Scale: the per-group reduction is the bounded [[graft.functions
    * .TopKAgg]] partial aggregate — each map task pre-reduces to ≤ k
    * rows per group BEFORE the shuffle (k × partitions rows move, not
    * the corpus), the same shape the ANN queries use. Rows with null
    * ids or non-positive/null weights are dropped (they cannot draw).
    * Output: group_key, id, rank (1-based by key), sample_key (rounded
    * 6 dp — ln is transcendental; ranking uses the raw key; the name
    * group_key, not "group", because the gate's column-sorted SELECT
    * cannot quote reserved words). Join back on (group_key, id) for the
    * row's payload.
    */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")),
        1, 13), 16, 10).cast("double") + lit(1.0)) /
      lit(4503599627370496.0) // 2^52
    // TopKAgg keeps score DESC: score = ln(u)/w (≤ 0), so "largest
    // score" = "smallest −ln(u)/w" = the A-ES winners; ties break id asc
    val scored = df
      .filter(col(idCol).isNotNull && col(weightCol).isNotNull &&
        (col(weightCol).cast("double") > 0.0))
      .select(col(groupCol).as("group_key"), col(idCol).cast("long").as("id"),
        col(weightCol).cast("double").as("weight"),
        (log(u) / col(weightCol).cast("double")).as("__score"))
    scored.groupBy(col("group_key"))
      .agg(graft.functions.TopKAgg.topK(col("__score"), col("id"), k).as("nn"))
      .select(col("group_key"), posexplode(col("nn")).as(Seq("__p", "__e")))
      .select(col("group_key"), col("__e.id").as("id"),
        (col("__p") + 1).cast("long").as("rank"),
        // + 0.0 normalizes the (vanishing-probability) −0.0 at u = 1
        (round(-col("__e.score"), 6) + lit(0.0)).as("sample_key"))
  }

  /** Token-budget selection — "give me the best docs that fit N training
    * tokens": rank by (`scoreCol` ascending, `idCol` tiebreak — lower
    * score = better, e.g. LM surprisal), keep the greedy prefix whose
    * CUMULATIVE token count stays within `budgetTokens`. A doc is kept
    * while the budget is not yet exhausted BEFORE it (the classic greedy
    * fill — the boundary doc that overshoots is included, so the budget
    * is always reached when enough data exists). Adds `n_tokens` and the
    * pre-doc running total `tokens_before`.
    *
    * Scale: one global-order window — an unavoidable total order over the
    * SURVIVING score range. For 100 TB, pre-filter to a score band first
    * (the selection only ever keeps ~budget tokens, so a coarse
    * score-histogram cut makes the sorted set O(budget), not O(corpus)).
    */
  def tokenBudget(df: DataFrame, scoreCol: String, idCol: String,
                  budgetTokens: Long, textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("n_tokens",
        graft.functions.TextScan.wsTokenCount(col(textCol)).cast("long"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("tokens_before") < budgetTokens)
  }

  /** Temperature-flattened source sampling — the multilingual
    * pretraining mixing rule (p_s ∝ n_s^α, the mBERT/XLM-R exponential
    * smoothing): DOWNSAMPLE-ONLY rates
    * `rate_s = (n_min / n_s)^(1-α)`, so the smallest source keeps every
    * row and larger sources flatten toward it; α = 1 preserves natural
    * proportions, α → 0 flattens to near-uniform source sizes. The
    * kept-count of source s is then ∝ n_s^α up to hash noise — the
    * target law, achieved without upsampling (which a filter cannot do).
    *
    * Keep decision: `md5_uniform(id) <= rate_s` — rerun-, repartition-
    * and engine-stable. At α = 0.5 the rate is `sqrt(n_min/n_s)`: one
    * exact long-ratio division and one correctly-rounded IEEE sqrt, so
    * both engines compute the identical double and the comparison is
    * exactly replayable; other α route through `pow`, where JVM and C
    * libm may differ in the final ulp (fine in practice, not
    * oracle-grade — the gated query pins α = 0.5).
    *
    * Output: kept rows plus their source's `keep_rate` (rounded 6 dp
    * for display; the filter uses the unrounded double). Null ids or
    * groups are dropped.
    *
    * Scale: one group-cardinality counts aggregate + one-row min + a
    * hint-free rate join on the group key (AQE sizes it) + a row-local
    * filter — the corpus shuffles zero times.
    */
  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent output-sharding rule: `shard(id) = argmax_s
    * md5(id || '#' || s)`. Its defining property: growing N → N+1
    * shards moves ONLY the keys the new shard wins (≈ 1/(N+1) of
    * them), and every moved key moves TO the new shard — no
    * rebalancing storm, unlike `id % N` which remaps nearly
    * everything. Deterministic, rerun- and engine-stable.
    *
    * Row-local: the argmax folds over the N-element shard array inside
    * one expression (array_max over (hash, shard) structs — md5 hex
    * compares as unsigned 128-bit) — ZERO shuffle, no join, no
    * N×corpus row amplification. N is structurally small (output
    * shards), so the per-row loop is bounded.
    */
  def rendezvousShard(df: DataFrame, idCol: String,
                      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val idStr = col(idCol).cast("string")
    val best = array_max(transform(
      sequence(lit(0), lit(numShards - 1)),
      s => struct(
        md5(concat(idStr, lit("#"), s.cast("string")).cast("binary"))
          .as("h"),
        s.as("s"))))
    df.filter(col(idCol).isNotNull)
      .withColumn("shard", best.getField("s").cast("int"))
  }

  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
                     alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val base = df.filter(col(groupCol).isNotNull && col(idCol).isNotNull)
    val counts = base.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__mn"))
    val ratio = col("__mn").cast("double") / col("__n").cast("double")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, lit(1.0 - alpha))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col(groupCol), rate.as("__rate"))
    base.join(rates, Seq(groupCol))
      .filter(graft.functions.TextHashes.md5Uniform(
        col(idCol).cast("string")) <= col("__rate"))
      .withColumn("keep_rate", round(col("__rate"), 6))
      .drop("__rate")
  }
}
