package graft.streaming

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class SndDoc(doc_id: Long, text: String)

class StreamingNearDupSpec extends SparkSpecBase {

  // near-dup pair: 8-token texts differing in the last token ->
  // trigram-shingle jaccard 5/7 ~ 0.71
  private val tA = "alpha beta gamma delta epsilon zeta eta theta"
  private val tB = "alpha beta gamma delta epsilon zeta eta iota"
  private val far1 = "one two three four five six seven eight"
  private val far2 = "red green blue cyan magenta yellow black white"

  test("each micro-batch dedups against the index AND grows it: a " +
      "batch-2 doc finds its batch-1 near-dup; pair sets match the " +
      "batch-computed truth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("snd").toString
    // seed corpus: one doc near-dup-close to a future arrival
    Dedup.writeMinhashIndex(Seq((10L, tA), (11L, far1)).toDF("doc_id", "text"),
      dir, "doc_id", "text")
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val input = MemoryStream[SndDoc]
    val query = StreamingNearDup.start(input.toDF(), dir,
      (pairs, batchId) => got(batchId) =
        pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      threshold = 0.5)
    try {
      // batch 0: one dup-of-seed + one novel doc (tracked for batch 1)
      input.addData(SndDoc(20L, tB), SndDoc(21L, far2))
      query.processAllAvailable()
      assert(got(0L) == Set((10L, 20L)))
      // batch 1: near-dup of the BATCH-0 doc — only findable if the
      // append actually grew the index — plus a dup of the seed
      input.addData(SndDoc(30L, tB), SndDoc(31L, far1))
      query.processAllAvailable()
      // 30 pairs with both the seed (10) and the batch-0 arrival (20,
      // identical text); 31 duplicates the seed's far doc (11)
      assert(got(1L) == Set((10L, 30L), (20L, 30L), (11L, 31L)))
    } finally query.stop()
    Dedup.releaseCaches()
  }
}
