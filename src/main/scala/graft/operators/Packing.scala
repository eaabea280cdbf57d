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
}
