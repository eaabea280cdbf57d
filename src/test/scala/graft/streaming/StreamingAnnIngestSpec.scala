package graft.streaming

import graft.SparkSpecBase
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class AnnDoc(vec_id: Long, embedding: Seq[Float], label: Int)

class StreamingAnnIngestSpec extends SparkSpecBase {

  test("per micro-batch: probe sees everything indexed so far, then the " +
      "batch joins the index — a later batch's nearest hit can be an " +
      "EARLIER batch's vector; replayed batches do not corrupt the index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ann_ing").toString
    // seed: two clusters on the unit circle
    Similarity.writeIvfIndex(
      Seq((1L, Seq(1f, 0f), 0), (11L, Seq(0f, 1f), 1))
        .toDF("vec_id", "embedding", "label"),
      dir, portable = true)
    val got = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
    val input = MemoryStream[AnnDoc]
    val q = StreamingAnnIngest.start(
      input.toDF(), dir,
      (hits, batchId) => got(batchId) = hits
        .filter(org.apache.spark.sql.functions.col("rank") === 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      k = 2, nProbe = 2)
    try {
      input.addData(AnnDoc(2L, Seq(0.995f, 0.0998f), 0))
      q.processAllAvailable()
      // batch 0 probes the SEED only: nearest to vec 2 is seed vec 1
      assert(got(0L) == Map(2L -> 1L))
      input.addData(AnnDoc(3L, Seq(0.998f, 0.0599f), 0))
      q.processAllAvailable()
      // batch 1's vector 3 sits between seed 1 and batch-0's vector 2;
      // its nearest is vector 2 — indexed by the PREVIOUS micro-batch
      assert(got(1L) == Map(3L -> 2L))
      // replay-safety: re-deliver batch 1's data as a new batch — the
      // idempotent append must not duplicate vector 3 in the lists
      input.addData(AnnDoc(3L, Seq(0.998f, 0.0599f), 0))
      q.processAllAvailable()
      val lists = spark.read.parquet(s"$dir/lists")
      assert(lists.filter(
        org.apache.spark.sql.functions.col("neighbor_id") === 3L)
        .count() == 1L)
      assert(lists.count() == 4L) // 2 seed + vec 2 + vec 3
    } finally q.stop()
  }
}
