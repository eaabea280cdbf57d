package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {

  private def pack(rows: Seq[(String, Long, Long)], budget: Long) = {
    import spark.implicits._
    Packing.packSequences(rows.toDF("src", "id", "n"), "src", "id", "n", budget)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
  }

  test("greedy packing resets when the budget would be exceeded") {
    // 3+4 fit in 10; +5 overflows -> seq 1; 9 overflows again -> seq 2
    val out = pack(Seq(("a", 1L, 3L), ("a", 2L, 4L), ("a", 3L, 5L), ("a", 4L, 9L)),
      budget = 10)
    assert(out == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("a", 4L) -> 2L))
  }

  test("groups pack independently and oversize docs get their own sequence") {
    val out = pack(Seq(("a", 1L, 99L), ("a", 2L, 1L), ("b", 5L, 2L), ("b", 6L, 2L)),
      budget = 10)
    // doc 1 oversize: alone in seq 0; doc 2 can't join it -> seq 1
    assert(out(("a", 1L)) == 0L && out(("a", 2L)) == 1L)
    assert(out(("b", 5L)) == 0L && out(("b", 6L)) == 0L)
  }

  test("packing is deterministic under repartitioning") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (s"s${i % 3}", i, 1L + i % 7))
      .toDF("src", "id", "n")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(d, "src", "id", "n", budget = 20)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(run(df) == run(df.repartition(13)))
  }

  test("every sequence except possibly a group's last is within budget and maximal") {
    import spark.implicits._
    val df = (0L until 200L).map(i => ("s", i, 1L + (i * 7) % 50)).toDF("src", "id", "n")
    val out = Packing.packSequences(df, "src", "id", "n", budget = 100)
      .orderBy("id").collect()
    val bySeq = out.groupBy(_.getLong(3)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val maxSeq = bySeq.keys.max
    // within budget always (no row here is oversize)
    assert(bySeq.values.forall(_ <= 100L))
    // maximality: adding the first doc of seq k+1 to seq k would overflow
    val firstOfNext = out.groupBy(_.getLong(3)).view
      .mapValues(_.minBy(_.getLong(1)).getLong(2)).toMap
    (0L until maxSeq).foreach { k =>
      assert(bySeq(k) + firstOfNext(k + 1) > 100L, s"seq $k not maximal")
    }
  }

  test("chunkTokenStream: hand-checked cuts across doc boundaries, " +
    "repartition-invariant") {
    import spark.implicits._
    // doc 1: tokens 10,11,12; doc 2: 20,21; doc 3: 30 — stream of 6,
    // seqLen 4 → seq 0 = [10,11,12,20] (2 docs), seq 1 = [21,30] (2 docs)
    val ids = Seq((1L, 0L, 10L), (1L, 1L, 11L), (1L, 2L, 12L),
      (2L, 0L, 20L), (2L, 1L, 21L), (3L, 0L, 30L))
      .toDF("doc_id", "pos", "token_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.chunkTokenStream(d, seqLen = 4).orderBy("seq_no").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val out = run(ids)
    assert(out == Seq(
      // checksum seq0: 10·1+11·2+12·3+20·4 = 148; seq1: 21·1+30·2 = 81
      (0L, 4L, 2L, 10L, 148L),
      (1L, 2L, 2L, 21L, 81L)), out)
    assert(run(ids.repartition(5)) == out,
      "global index must not depend on partitioning")
  }

  test("epochShuffle: epoch_pos is a permutation, shard_pos is dense per " +
    "shard and order-consistent, output is repartition-invariant") {
    import spark.implicits._
    val seqs = (0L until 100L).map(i => (i, i * 10)).toDF("seq_no", "payload")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.epochShuffle(d, epoch = 1, numShards = 4)
        .orderBy("seq_no").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4))).toSeq
    val out = run(seqs)
    // payload passes through untouched
    assert(out.forall { case (s, p, _, _, _) => p == s * 10 })
    // permutation: epoch positions are exactly 0..99
    assert(out.map(_._4).sorted == (0L until 100L), "not a permutation")
    // shard_pos dense 0..count-1 within each shard, and ordered exactly
    // as the global epoch order restricted to the shard
    out.groupBy(_._3).foreach { case (shard, rows) =>
      val byGlobal = rows.sortBy(_._4)
      assert(byGlobal.map(_._5) == (0L until rows.length.toLong),
        s"shard $shard positions not dense/order-consistent")
    }
    assert(run(seqs.repartition(7)) == out, "partitioning leaked in")
  }

  test("sequenceBoundaries: hand-checked segment map across doc and " +
    "sequence boundaries, tiling and repartition invariance") {
    import spark.implicits._
    // doc1: 6 tokens, doc2: 3, doc3: 1 — stream of 10, seqLen 4:
    //   seq0 = d1[0..3]; seq1 = d1[4..5] + d2[0..1]; seq2 = d2[2] + d3[0]
    val ids = (0L until 6L).map(p => (1L, p, 10L)) ++
      (0L until 3L).map(p => (2L, p, 20L)) ++ Seq((3L, 0L, 30L))
    val df = ids.toDF("doc_id", "pos", "token_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.sequenceBoundaries(d, seqLen = 4)
        .orderBy("seq_no", "seg_no").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val out = run(df)
    assert(out == Seq(
      (0L, 0L, 1L, 0L, 4L),
      (1L, 0L, 1L, 0L, 2L), (1L, 1L, 2L, 2L, 2L),
      (2L, 0L, 2L, 0L, 1L), (2L, 1L, 3L, 1L, 1L)), out)
    // segments tile each sequence contiguously: next start = start + len
    out.groupBy(_._1).values.foreach { segs =>
      segs.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._4 + a._5 == b._4, s"gap after $a")
        case _ => ()
      }
    }
    assert(out.map(_._5).sum == 10L, "segment lengths must cover the stream")
    assert(run(df.repartition(5)) == out, "partitioning leaked in")
  }

  test("curriculumOrder: equal ascending-score tiers scheduled in order, " +
    "md5-shuffled within, epoch-stable membership, repartition-invariant") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i * 37 % 100)).toDF("id", "score")
    def run(d: org.apache.spark.sql.DataFrame, epoch: Int = 1) =
      Packing.curriculumOrder(d, "id", "score", tiers = 4, epoch = epoch)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSeq
    val out = run(df)
    // equal tier sizes; tiers strictly ordered by score (scores distinct)
    val byTier = out.groupBy(_._3)
    assert(byTier.keySet == Set(0, 1, 2, 3) &&
      byTier.values.forall(_.size == 25))
    (0 to 2).foreach { t =>
      assert(byTier(t).map(_._2).max < byTier(t + 1).map(_._2).min,
        s"tier $t overlaps tier ${t + 1}")
    }
    // curriculum_pos is a permutation and tier blocks are contiguous:
    // all of tier t precedes all of tier t+1
    assert(out.map(_._4).sorted == (0L until 100L))
    (0 to 2).foreach { t =>
      assert(byTier(t).map(_._4).max < byTier(t + 1).map(_._4).min,
        s"tier $t not scheduled before tier ${t + 1}")
    }
    // within-tier order is shuffled (not id order): measured 25/25 of
    // tier 0's members sit at a different in-tier offset than id rank
    val t0 = byTier(0).sortBy(_._4).map(_._1)
    assert(t0 != t0.sorted, "within-tier order must not be id order")
    // epoch changes the within-tier order, never the membership
    val e2 = run(df, epoch = 2)
    assert(e2.map(x => x._1 -> x._3).toMap == out.map(x => x._1 -> x._3).toMap,
      "tier membership must be epoch-independent")
    assert(e2.map(_._4) != out.map(_._4), "epochs must reshuffle")
    assert(run(df.repartition(7)) == out, "partitioning leaked in")
  }

  test("epochShuffle: consecutive epochs decorrelate — the order and the " +
    "shard map both re-randomize, deterministically") {
    import spark.implicits._
    val seqs = (0L until 100L).toDF("seq_no")
    def run(epoch: Int) =
      Packing.epochShuffle(seqs, epoch, numShards = 4)
        .orderBy("seq_no").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val e1 = run(1)
    val e2 = run(2)
    assert(run(1) == e1, "epoch shuffle must be deterministic")
    // measured on this fixture: 98/100 sequences change global position,
    // 74/100 change shard — both far from the ~0 a stuck RNG would give
    // (74 ≈ the 3/4 an independent uniform 4-shard remap predicts)
    val posMoved = e1.zip(e2).count { case (a, b) => a._3 != b._3 }
    val shardMoved = e1.zip(e2).count { case (a, b) => a._2 != b._2 }
    assert(posMoved >= 90, s"only $posMoved/100 positions moved")
    assert(shardMoved >= 60, s"only $shardMoved/100 shards moved")
    // |pos1 - pos2| averages ~n/3 for independent uniform orders;
    // measured 35.7 here — assert the same magnitude, not mere inequality
    val meanAbs = e1.zip(e2).map { case (a, b) =>
      math.abs(a._3 - b._3) }.sum / 100.0
    assert(meanAbs > 20.0, s"mean |Δpos| $meanAbs — orders too correlated")
  }

  test("trainingOrder with shards: each shard's stream is the epoch " +
      "concatenation of its own shard_pos order, resume slices every " +
      "shard at the same LOCAL step, and the one-shard form is the " +
      "global order with shard 0") {
    import spark.implicits._
    val seqs = (0L until 40L).map(Tuple1(_)).toDF("seq_no")
    val full = Packing.trainingOrder(seqs, epochs = Seq(1, 2),
      numShards = 3).collect()
      .map(r => (r.getLong(4), r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))
    // shard map: both epochs' rows of a seq land on that epoch's
    // rendezvous shard; per shard, steps are 0..n-1 dense and ordered
    // by (epoch, shard_pos)
    val byShard = full.groupBy(_._1)
    assert(byShard.keySet.subsetOf(Set(0L, 1L, 2L)) && byShard.size == 3)
    byShard.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong).toSeq,
        "per-shard steps must be dense from 0")
      assert(sorted.map(r => (r._3, r._6)).toSeq ==
        sorted.map(r => (r._3, r._6)).sortBy(identity).toSeq,
        "per-shard step order must follow (epoch, shard_pos)")
    }
    // every (epoch, seq) appears exactly once across shards
    assert(full.map(r => (r._3, r._4)).distinct.length == 80)
    // resume: the same local step filter on every shard
    val resumed = Packing.trainingOrder(seqs, epochs = Seq(1, 2),
      resumeFrom = 4L, numShards = 3).collect()
      .map(r => (r.getLong(4), r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5))).toSet
    assert(resumed == full.filter(_._2 >= 4L).toSet,
      "sharded resume must be the full order minus each shard's first 4 steps")
    // one shard degenerates to the global order
    val one = Packing.trainingOrder(seqs, epochs = Seq(1, 2)).collect()
    assert(one.forall(r => r.getLong(4) == 0L &&
      r.getLong(5) == r.getLong(3)),
      "numShards = 1: shard 0, shard_pos == epoch_pos")
  }

  test("lengthBatches: hand-traced length-sorted batches and waste") {
    import spark.implicits._
    // doc lengths: 1, 2, 3, 5 (ids 1..4); batchSize 2 sorted by length:
    // batch 0 = {1, 2} (max 2, waste 1), batch 1 = {3, 5} (max 5, waste 2)
    val ids = Seq.tabulate(1)(_ => ()).flatMap { _ =>
      Seq((1L, 1), (2L, 2), (3L, 3), (4L, 5)).flatMap { case (d, n) =>
        (0 until n).map(p => (d, p.toLong, 7L))
      }
    }.toDF("doc_id", "pos", "token_id")
    val out = Packing.lengthBatches(ids, batchSize = 2).orderBy("batch_no")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 2L, 2L, 3L, 1L), (1L, 2L, 5L, 8L, 2L)))
    // partition invariance (the rank core's contract)
    val rep = Packing.lengthBatches(ids.repartition(5), batchSize = 2)
      .orderBy("batch_no").as[(Long, Long, Long, Long, Long)].collect()
    assert(rep.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Packing.lengthBatches(ids, batchSize = 0)
    }
  }

  test("batchWasteSaved: sorted batching never wastes more than the " +
      "md5 baseline; savings are an exact integer ratio") {
    import spark.implicits._
    // skewed lengths: sorted batching groups like with like
    val ids = (1L to 20L).flatMap { d =>
      val n = if (d % 4 == 0) 40 else 2
      (0 until n).map(p => (d, p.toLong, 1L))
    }.toDF("doc_id", "pos", "token_id")
    val r = Packing.batchWasteSaved(ids, batchSize = 5).collect().head
    val (nb, sw, hw, sf) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nb === 4L)
    assert(sw <= hw, "length-sorting can only reduce padding waste")
    assert(sf >= 0.0 && sf < 1.0)
    // perfect split on this fixture: the 5 long docs fill one batch
    assert(sw === 0L)
  }

  test("chatFormatAudit: each malformation trips exactly its flag") {
    import spark.implicits._
    val turns = Seq(
      // conv 1: well-formed with a system opener
      (1L, 0L, "system", "s"), (1L, 1L, "user", "u"),
      (1L, 2L, "assistant", "a"),
      // conv 2: user speaks twice in a row
      (2L, 0L, "user", "u"), (2L, 1L, "user", "u2"),
      (2L, 2L, "assistant", "a"),
      // conv 3: ends on the user
      (3L, 0L, "user", "u"), (3L, 1L, "assistant", "a"),
      (3L, 2L, "user", "u2"),
      // conv 4: whitespace-only assistant turn
      (4L, 0L, "user", "u"), (4L, 1L, "assistant", "  "),
      // conv 5: unknown role as the opener
      (5L, 0L, "tool", "t"), (5L, 1L, "assistant", "a"),
      // conv 6: system in the middle (otherwise fine)
      (6L, 0L, "user", "u"), (6L, 1L, "system", "s"),
      (6L, 2L, "assistant", "a")
    ).toDF("conv_id", "turn_ix", "role", "content")
    val out = Packing.chatFormatAudit(turns).orderBy("conv_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7))).toMap
    assert(out(1L) == ((3L, true, true, true, true, true, true)))
    assert(out(2L) == ((3L, true, true, false, true, true, false)))
    assert(out(3L) == ((3L, true, true, true, false, true, false)))
    assert(out(4L) == ((2L, true, true, true, true, false, false)))
    assert(out(5L) == ((2L, false, true, false, true, true, false)))
    assert(out(6L) == ((3L, true, false, true, true, true, false)))
  }

  test("chatFormatAudit edges: single-turn and all-system conversations") {
    import spark.implicits._
    val turns = Seq(
      (1L, 0L, "user", "hi"),              // lone user turn
      (2L, 0L, "assistant", "hello"),      // lone assistant turn
      (3L, 0L, "system", "s"), (3L, 1L, "system", "s2") // system only
    ).toDF("conv_id", "turn_ix", "role", "content")
    val out = Packing.chatFormatAudit(turns).orderBy("conv_id").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(3), r.getBoolean(7))).toMap
    // (alternation_ok, ends_ok, system_ok, valid)
    assert(out(1L) == ((true, false, true, false))) // user-only: no reply
    assert(out(2L) == ((false, true, true, false))) // first speaker not user
    // all-system: no non-system turn -> alternation false; second system
    // is mid-conversation -> system_ok false; ends on system
    assert(out(3L) == ((false, false, false, false)))
  }

  test("shardBalance: per-(epoch, shard) mass and ratio vs epoch mean") {
    import spark.implicits._
    val order = Seq(
      // epoch 1: shard 0 gets seqs 0,1; shard 1 gets seq 2
      (1L, 0L, 0L), (1L, 0L, 1L), (1L, 1L, 2L),
      // epoch 2: shard 0 gets seq 0; shard 1 gets seqs 1,2
      (2L, 0L, 0L), (2L, 1L, 1L), (2L, 1L, 2L)
    ).toDF("epoch", "shard", "seq_no")
    val seqs = Seq((0L, 100L), (1L, 50L), (2L, 30L))
      .toDF("seq_no", "n_tokens")
    val out = Packing.shardBalance(order, seqs)
      .orderBy("epoch", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // epoch 1: shard0 150, shard1 30; mean 90 → 1.666667 / 0.333333
    assert(out((1L, 0L)) == ((2L, 150L, 1.666667)))
    assert(out((1L, 1L)) == ((1L, 30L, 0.333333)))
    // epoch 2: shard0 100, shard1 80; mean 90
    assert(out((2L, 0L)) == ((1L, 100L, 1.111111)))
    assert(out((2L, 1L)) == ((2L, 80L, 0.888889)))
  }
}
