package graft.operators

import graft.SparkSpecBase

/** Sliding-window chunking: window layout hand-checks (count, overlap,
  * tail), boundary cases, and the reconstruction property (stride
  * slices re-concatenate to the full token stream).
  */
class ChunkingSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def chunks(text: String, maxTokens: Int, overlap: Int) = {
    import spark.implicits._
    Chunking.slidingChunks(Seq((1L, text)).toDF("doc_id", "text"),
        maxTokens = maxTokens, overlap = overlap)
      .orderBy("chunk_id")
      .as[(Long, Long, Long, String)].collect()
  }

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("hand-checked layout: 10 tokens, max 8, overlap 2") {
    val out = chunks(words(10), 8, 2)
    assert(out.map(_._2) === Array(0L, 1L))
    assert(out(0)._4 === "w1 w2 w3 w4 w5 w6 w7 w8")
    assert(out(1)._4 === "w7 w8 w9 w10") // shares exactly 2 tokens
    assert(out.map(_._3) === Array(8L, 4L))
  }

  test("exact fit yields one chunk; one-over spills a tail") {
    assert(chunks(words(8), 8, 2).length === 1)
    val spill = chunks(words(9), 8, 2)
    assert(spill.length === 2)
    assert(spill(1)._4 === "w7 w8 w9")
  }

  test("zero overlap partitions the tokens exactly") {
    val out = chunks(words(10), 4, 0)
    assert(out.map(_._4) ===
      Array("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
  }

  test("short and empty documents") {
    assert(chunks(words(3), 8, 2).map(_._4) === Array("w1 w2 w3"))
    assert(chunks("", 8, 2).isEmpty)
    assert(chunks("   \n  ", 8, 2).isEmpty)
    // single token
    assert(chunks("only", 8, 2).map(_._4) === Array("only"))
  }

  test("house token convention: lowercased, whitespace-split") {
    val out = chunks("Hello   WORLD\nagain", 8, 2)
    assert(out.map(_._4) === Array("hello world again"))
  }

  test("every token covered, consecutive chunks share exactly overlap") {
    val out = chunks(words(23), 7, 3)
    val stride = 4
    out.zipWithIndex.foreach { case ((_, cid, n, txt), i) =>
      assert(cid === i.toLong)
      val toks = txt.split(" ")
      assert(toks.head === s"w${i * stride + 1}")
      assert(n === toks.length.toLong)
    }
    // reconstruction: dropping the first `overlap` tokens of every
    // chunk after the first re-yields the exact stream
    val stream = out.head._4.split(" ") ++
      out.tail.flatMap(_._4.split(" ").drop(3))
    assert(stream.toSeq === (1 to 23).map(i => s"w$i"))
    assert(out.last._4.endsWith("w23"))
  }

  test("parameter validation") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(df, maxTokens = 0, overlap = 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(df, maxTokens = 4, overlap = 4)
    }
  }
}
