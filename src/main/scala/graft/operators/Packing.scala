package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for training data: greedily pack documents into
  * sequences of at most `budget` tokens, per group (source / shard), in
  * deterministic id order — the "concat documents into fixed-token
  * training sequences" step between corpus curation and tokenizer output.
  *
  * Greedy-with-reset is inherently sequential, so it runs per GROUP:
  * one shuffle on the group key, then a single O(1)-state streaming pass
  * over each group's sorted docs (`flatMapSortedGroups` guarantees the
  * in-group order without a separate sort pass). Groups pack
  * independently — exactly how production packing shards (sequences never
  * span shards) — so a skewed group costs its own linear pass and nothing
  * else, and the result is a pure function of (group, id, tokens):
  * stable under partitioning, engines, and reruns.
  *
  * A document larger than `budget` gets a sequence of its own (callers
  * truncate with [[TextAnalysis.truncateTokensCol]] first if oversize
  * docs must not survive).
  */
object Packing {

  /** Assign `(group, id) → seq_no` (0-based per group): running token
    * total, reset when adding the next doc would exceed `budget`.
    * Output columns: group, id, n_tokens, seq_no.
    */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    tokenCountCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val in = df.select(
      col(groupCol).cast("string").as("group"),
      col(idCol).cast("long").as("id"),
      col(tokenCountCol).cast("long").as("n_tokens"))
    val outSchema = StructType(Seq(
      StructField("group", StringType), StructField("id", LongType),
      StructField("n_tokens", LongType), StructField("seq_no", LongType)))
    implicit val enc = Encoders.row(outSchema)
    in.groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapSortedGroups(col("id")) { (group: String, rows: Iterator[Row]) =>
        var seq = 0L
        var acc = 0L
        var first = true
        rows.map { r =>
          val n = r.getLong(2)
          if (!first && acc + n > budget) { seq += 1; acc = n }
          else { acc += n; first = false }
          Row(group, r.getLong(1), n, seq)
        }
      }
  }

  /** GPT-style concat-and-chunk packing — the OTHER packing mode real
    * trainers use ([[packSequences]] keeps documents atomic; this cuts
    * the corpus's token-id stream, in deterministic (doc, pos) order,
    * into EXACT `seqLen`-token training sequences that CROSS document
    * boundaries — zero padding waste; attention masking across the
    * boundary is the trainer's concern). Input is a
    * [[Bpe.encodeIds]]-shaped frame (idCol, posCol, tokCol).
    *
    * The global token index comes from the distributed rank core
    * ([[Ranking.rangeRank]] — range sort + per-partition offsets, NO
    * single-task `OVER ()` window), so the cut is a pure function of
    * the id frame at any scale. Output: one row per sequence —
    * (seq_no, n_tokens [= seqLen except the tail], n_docs spanned,
    * first_token, checksum = Σ token_id·(offset+1), an order-free
    * position-weighted integer that pins both content AND order).
    */
  /** Deterministic EPOCH SHUFFLE of packed training sequences — the
    * training loop's "new global order every epoch" step, as a pure
    * function of (epoch, seq_no): each sequence is keyed by
    * `md5(epoch || '#' || seq_no)`, the epoch's global order is the
    * rank of that key, and the sequence's data-parallel worker is the
    * rendezvous shard of the same epoch-salted id (so both the order
    * AND the shard map re-randomize per epoch, yet any engine, rerun,
    * or partitioning reproduces them bit-for-bit — no RNG state to
    * checkpoint). Input columns pass through; appended: `shard`,
    * `epoch_pos` (0-based global), `shard_pos` (0-based within shard,
    * consistent with the global order).
    *
    * Scale shape: the rendezvous argmax is row-local (zero shuffle)
    * and BOTH ranks come from ONE rank-core pass
    * ([[Ranking.rangeRankMulti]] — a single range exchange, no
    * single-task `OVER ()` window): sorted by (key, seq_no), the
    * global group and the shard groups are ranked in the same
    * per-partition sweep.
    */
  def epochShuffle(seqs: DataFrame, epoch: Int, numShards: Int,
                   seqNoCol: String = "seq_no"): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val keyed = Sampling.rendezvousShard(
        seqs.withColumn("__eid",
          concat(lit(s"$epoch#"), col(seqNoCol).cast("string"))),
        "__eid", numShards)
      .withColumn("__k", md5(col("__eid").cast("binary")))
    Ranking.rangeRankMulti(keyed, Seq("__k", seqNoCol),
        Seq(Nil, Seq("shard")), Seq("__g", "__s"))
      .withColumn("epoch_pos", (col("__g") - 1).cast("long"))
      .withColumn("shard_pos", (col("__s") - 1).cast("long"))
      .drop("__eid", "__k", "__g", "__s")
  }

  /** Multi-epoch training order with checkpoint RESUME — the data
    * loader's restart contract: the full training-run order is the
    * concatenation of each epoch's [[epochShuffle]] order (each epoch
    * reshuffles under its own md5 key — no two epochs repeat an
    * order), `step` numbers the whole run, and `resumeFrom` slices
    * away already-consumed steps WITHOUT recomputing or re-shuffling
    * anything — a crashed trainer resumes mid-epoch bit-identically.
    *
    * DATA-PARALLEL form (`numShards` > 1): real multi-node training
    * resumes PER SHARD — each data-parallel worker consumes its own
    * rendezvous shard's stream ([[epochShuffle]]'s epoch-salted shard
    * map) and counts its own steps, so `step` is the 0-based index
    * WITHIN the shard's run (concatenated epochs in shard order) and
    * `resumeFrom` slices every shard's stream at the same local step —
    * the synchronized-checkpoint restart a DDP trainer actually does.
    * With one shard this degenerates to the global order (shard = 0,
    * shard_pos = epoch_pos). Output:
    * `(step, epoch, seq_no, epoch_pos, shard, shard_pos)`.
    *
    * Scale: one rank-core pass per epoch (epoch count is a small
    * constant) plus one final rank-core pass over the union — no
    * single-task window; the resume slice is a filter, not a skip
    * loop.
    */
  def trainingOrder(seqs: DataFrame, epochs: Seq[Int],
                    resumeFrom: Long = 0L,
                    seqNoCol: String = "seq_no",
                    numShards: Int = 1): DataFrame = {
    require(epochs.nonEmpty && epochs.distinct.size == epochs.size,
      s"epochs must be non-empty and distinct, got $epochs")
    require(resumeFrom >= 0L, s"resumeFrom must be >= 0, got $resumeFrom")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val uni = epochs.sorted.map { e =>
      epochShuffle(seqs, e, numShards, seqNoCol)
        .select(col(seqNoCol), col("shard"), col("epoch_pos"),
          col("shard_pos"))
        .withColumn("epoch", lit(e.toLong))
    }.reduce(_ unionByName _)
    // per-shard step: rank within shard by (epoch, shard_pos) — one
    // rank-core pass; (epoch, shard_pos) is unique within a shard, the
    // trailing seqNo only pins cross-shard tie order inside the sort
    Ranking.rangeRankMulti(uni, Seq("epoch", "shard_pos", seqNoCol),
        Seq(Seq("shard")), Seq("__step"))
      .select((col("__step") - 1).cast("long").as("step"),
        col("epoch"), col(seqNoCol), col("epoch_pos"),
        col("shard").cast("long").as("shard"), col("shard_pos"))
      .filter(col("step") >= resumeFrom)
  }

  /** Data-parallel load audit of a [[trainingOrder]] stream: per
    * (epoch, shard), the step count and token mass each DDP worker
    * will consume, plus `load_ratio` = shard tokens / the epoch's mean
    * shard tokens — the "is any worker starved or overloaded by the
    * rendezvous shard map" readout a trainer checks before launching.
    * `seqs` is the packed-sequence frame the order was built from
    * (supplies `tokenCol` per `seqNoCol`).
    *
    * Scale shape: one seq-keyed equi-join (order rows ≈ epochs ×
    * sequences), then everything lives on the (epoch, shard) frame —
    * bounded by epochs × numShards, never the corpus. The mean divides
    * two exact integers in double, so ratios replay bit-identically.
    */
  def shardBalance(order: DataFrame, seqs: DataFrame,
                   seqNoCol: String = "seq_no",
                   tokenCol: String = "n_tokens"): DataFrame = {
    val g = order.select(col("epoch"), col("shard"), col(seqNoCol))
      .join(seqs.select(col(seqNoCol), col(tokenCol)), Seq(seqNoCol))
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_steps"),
        sum(col(tokenCol)).as("shard_tokens"))
    val m = g.groupBy(col("epoch"))
      .agg((sum(col("shard_tokens")).cast("double") /
        count(lit(1)).cast("double")).as("__mean"))
    g.join(m, Seq("epoch"))
      .select(col("epoch"), col("shard"), col("n_steps"),
        col("shard_tokens"),
        round(col("shard_tokens").cast("double") / col("__mean"), 6)
          .as("load_ratio"))
  }

  /** Curriculum ordering of training examples (Bengio et al. 2009, the
    * quality-annealed data schedules LLM trainers run): ascending-score
    * TIER schedule — equal-size tiers by the rank of `scoreCol`, low
    * tiers (easy / low-quality-first or however the caller keys the
    * score) trained first — with a deterministic md5 shuffle WITHIN
    * each tier, so the schedule is coarse-grained curriculum + fine-
    * grained decorrelation, reproducible from (epoch, id) alone.
    * Output: input columns + `tier` (0-based) + `curriculum_pos`
    * (0-based global training order).
    *
    * Scale shape: two rank-core passes (tier rank by score, final
    * order by (tier, key)) — each one range exchange, no single-task
    * window; the row count enters as a broadcast one-row aggregate.
    */
  def curriculumOrder(df: DataFrame, idCol: String, scoreCol: String,
                      tiers: Int, epoch: Int = 1): DataFrame = {
    require(tiers >= 1, s"tiers must be >= 1, got $tiers")
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val base = df.filter(col(idCol).isNotNull && col(scoreCol).isNotNull)
    val ranked = Ranking.rangeRank(base, Nil, Seq(scoreCol, idCol), "__r")
    val n = ranked.agg(count(lit(1)).as("__n"))
    val keyed = ranked.crossJoin(broadcast(n)) // one-row count aggregate
      .withColumn("tier",
        expr(s"CAST(((__r - 1) * $tiers) div __n AS INT)"))
      .withColumn("__k", md5(concat(lit(s"$epoch#"),
        col(idCol).cast("string")).cast("binary")))
    Ranking.rangeRank(keyed, Nil, Seq("tier", "__k", idCol), "__c")
      .withColumn("curriculum_pos", (col("__c") - 1).cast("long"))
      .drop("__r", "__n", "__k", "__c")
  }

  /** Per-sequence document-segment map for [[chunkTokenStream]]-packed
    * sequences — the block-diagonal attention-mask spec: packing
    * concatenates documents, so a trainer needs, per packed sequence,
    * where each document's span starts and how long it runs, both to
    * stop attention from crossing document boundaries and to key
    * per-document loss masks. One row per (sequence, document
    * segment): 0-based `seg_no` within the sequence, `start_offset`,
    * `seg_len`; a document crossing a sequence boundary contributes
    * one segment to EACH sequence it spans.
    *
    * Scale shape: the same single range exchange as the packer, one
    * (seq_no, doc) agg; the only window is partitioned by seq_no,
    * whose groups are seqLen-bounded (k-bounded by construction).
    */
  def sequenceBoundaries(ids: DataFrame, seqLen: Int,
                         idCol: String = "doc_id",
                         posCol: String = "pos"): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val ranked = Ranking.rangeRank(ids, Nil, Seq(idCol, posCol), "__idx")
    val segs = ranked
      .withColumn("seq_no", expr(s"(__idx - 1) div $seqLen").cast("long"))
      .withColumn("__off", pmod(col("__idx") - 1, lit(seqLen.toLong)))
      .groupBy(col("seq_no"), col(idCol))
      .agg(min(col("__off")).as("start_offset"),
        count(lit(1)).as("seg_len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("seq_no")).orderBy(col("start_offset"))
    segs
      .withColumn("seg_no", (row_number().over(w) - 1).cast("long"))
      .select(col("seq_no"), col("seg_no"), col(idCol),
        col("start_offset"), col("seg_len"))
  }

  /** Length-bucketed inference/eval batches: rank documents by token
    * count (rank core — never a one-task `OVER ()`), cut consecutive
    * ranks into `batchSize`-doc batches, and report each batch's
    * padding waste `n_docs·max_len − Σlen` — the dynamic-batching
    * readout every inference/eval harness sizes batches with (a batch
    * pads every member to its longest, so sorting by length first is
    * the classic waste killer). `byLength = false` ranks by the md5
    * ring instead — the arrival-order dataloader baseline the
    * comparison rollup measures savings against.
    *
    * Exact integer arithmetic throughout; ties (n, id) / (hash, id)
    * make the rank a total order, so batches are deterministic and
    * engine-replayable. One (id) count agg + one rank pass + one
    * batch agg — corpus-linear, no driver state.
    */
  def lengthBatches(ids: DataFrame, batchSize: Int,
                    byLength: Boolean = true,
                    idCol: String = "doc_id"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val lens = ids.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val ranked =
      if (byLength) Ranking.rangeRank(lens, Nil, Seq("n", idCol), "__r")
      else Ranking.rangeRank(
        lens.withColumn("__h",
          md5(col(idCol).cast("string").cast("binary"))),
        Nil, Seq("__h", idCol), "__r")
    ranked
      .withColumn("batch_no", expr(s"(__r - 1) div $batchSize").cast("long"))
      .groupBy(col("batch_no"))
      .agg(count(lit(1)).as("n_docs"), max(col("n")).as("max_len"),
        sum(col("n")).as("total_tokens"))
      .select(col("batch_no"), col("n_docs"), col("max_len"),
        col("total_tokens"),
        (col("n_docs") * col("max_len") - col("total_tokens"))
          .as("pad_waste"))
  }

  /** One-row comparison of [[lengthBatches]] waste, sorted vs the
    * md5-order baseline: `(n_batches, sorted_waste, shuffled_waste,
    * saved_frac)` — saved_frac = (shuffled − sorted) / shuffled-padded
    * volume, 6 dp exact integer ratio.
    */
  def batchWasteSaved(ids: DataFrame, batchSize: Int,
                      idCol: String = "doc_id"): DataFrame = {
    val s = lengthBatches(ids, batchSize, byLength = true, idCol)
      .agg(count(lit(1)).as("n_batches"),
        sum(col("pad_waste")).as("sorted_waste"))
    val r = lengthBatches(ids, batchSize, byLength = false, idCol)
      .agg(sum(col("pad_waste")).as("shuffled_waste"),
        sum(col("n_docs") * col("max_len")).as("__vol"))
    s.crossJoin(broadcast(r))
      .select(col("n_batches"), col("sorted_waste"), col("shuffled_waste"),
        round((col("shuffled_waste") - col("sorted_waste")).cast("double") /
          col("__vol").cast("double"), 6).as("saved_frac"))
  }

  def chunkTokenStream(ids: DataFrame, seqLen: Int,
                       idCol: String = "doc_id", posCol: String = "pos",
                       tokCol: String = "token_id"): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val ranked = Ranking.rangeRank(ids, Nil, Seq(idCol, posCol), "__idx")
    // exact INTEGER division/mod (div/pmod on longs) — a double floor
    // would round past 2^53 tokens
    ranked
      .withColumn("seq_no", expr(s"(__idx - 1) div $seqLen").cast("long"))
      .withColumn("offset", pmod(col("__idx") - 1, lit(seqLen.toLong)))
      .groupBy(col("seq_no"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col(idCol)).as("n_docs"),
        max(when(col("offset") === 0, col(tokCol))).as("first_token"),
        sum(col(tokCol) * (col("offset") + lit(1L))).cast("long")
          .as("checksum"))
  }

  /** SFT loss masking — the instruction-tuning data-prep step: given a
    * MARKED id stream (a word index `wpos` per token, the
    * [[UnigramLm.encodeIdsMarked]] contract) and a per-document prompt
    * length IN WORDS, adds `loss_mask` — 0 on prompt tokens (context
    * the model conditions on) and 1 on response tokens (the ones the
    * loss trains on). Word granularity is exact for word-boundary
    * subword tokenizers: no piece ever spans two words, so no token
    * straddles the mask boundary. One doc-keyed equi-join plus
    * row-local arithmetic — the id stream keeps its partitioning.
    */
  def promptMask(idsMarked: DataFrame, promptLens: DataFrame,
                 idCol: String = "doc_id"): DataFrame = {
    val outCols = idsMarked.columns.map(col) :+
      when(col("wpos") < col("n_prompt_words"), lit(0L))
        .otherwise(lit(1L)).as("loss_mask")
    idsMarked.join(promptLens.select(col(idCol), col("n_prompt_words")),
        Seq(idCol))
      .select(outCols: _*)
  }

  /** Chat-format audit for SFT/RLHF conversation data — the validation
    * every chat-template renderer assumes and [[promptMask]]'s masking
    * takes for granted: per conversation,
    *
    *   - `role_ok` — every role ∈ {system, user, assistant};
    *   - `system_ok` — system appears only as the opening turn;
    *   - `alternation_ok` — ignoring system turns, the first speaker is
    *     the user and no speaker repeats back-to-back;
    *   - `ends_ok` — the final turn is the assistant's (a trailing user
    *     turn trains on nothing; a trailing system is malformed);
    *   - `nonempty_ok` — no null/whitespace-only turn content;
    *   - `valid` — all of the above.
    *
    * Scale shape: ONE conversation-keyed aggregation collects each
    * conversation's turns into a sorted struct array (bounded by
    * conversation LENGTH — tens of turns, never the corpus), then every
    * flag is a row-local higher-order-function pass over that array —
    * codegen, no window, no second shuffle. Flags are plain boolean
    * algebra on deterministic arrays → engine-replayable.
    */
  def chatFormatAudit(turns: DataFrame, convCol: String = "conv_id",
                      ixCol: String = "turn_ix", roleCol: String = "role",
                      contentCol: String = "content"): DataFrame = {
    val arr = turns.groupBy(col(convCol))
      .agg(array_sort(collect_list(struct(
        col(ixCol).as("i"), col(roleCol).as("r"),
        (col(contentCol).isNull ||
          trim(col(contentCol)) === "").as("blank")))).as("ts"))
    val roles = "transform(ts, t -> t.r)"
    val nonSys = s"filter($roles, r -> r != 'system')"
    arr.select(col(convCol),
      size(col("ts")).cast("long").as("n_turns"),
      expr(s"forall($roles, r -> r IN ('system', 'user', 'assistant'))")
        .as("role_ok"),
      expr(s"!exists(slice($roles, 2, size(ts)), r -> r = 'system')")
        .as("system_ok"),
      expr(s"size($nonSys) > 0 AND element_at($nonSys, 1) = 'user' AND " +
        s"!exists(zip_with($nonSys, slice($nonSys, 2, size($nonSys)), " +
        "(a, b) -> a = b), x -> coalesce(x, false))").as("alternation_ok"),
      expr(s"element_at($roles, -1) = 'assistant'").as("ends_ok"),
      expr("!exists(ts, t -> t.blank)").as("nonempty_ok"))
      .withColumn("valid", col("role_ok") && col("system_ok") &&
        col("alternation_ok") && col("ends_ok") && col("nonempty_ok"))
  }
}
