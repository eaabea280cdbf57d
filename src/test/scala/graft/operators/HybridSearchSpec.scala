package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkSpecBase {

  import spark.implicits._

  test("RRF fuses two rankings with hand-computed scores") {
    // doc 1: rank 1 + rank 2 ; doc 2: rank 2 + rank 1 ; doc 3 lex-only
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((2L, 1L), (1L, 2L)).toDF("doc_id", "rank")
    val out = HybridSearch.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
      kRrf = 60, topK = 10).collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.get(1), r.get(2), r.getDouble(3), r.getLong(4))).toMap
    def rrf(rs: Seq[Long]) =
      BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1 and doc 2 tie exactly (1/61 + 1/62 both) -> id breaks the tie
    assert(byId(1L)._3 == rrf(Seq(1, 2)))
    assert(byId(2L)._3 == rrf(Seq(2, 1)))
    assert(byId(1L)._4 == 1L && byId(2L)._4 == 2L)
    // doc 3 appears with a null sem rank and single-list score
    assert(byId(3L)._2 == null)
    assert(byId(3L)._3 == rrf(Seq(3)))
    assert(byId(3L)._4 == 3L)
  }

  test("topK truncates after fusion; order is fused_rank") {
    val lex = (1L to 30L).map(i => (i, i)).toDF("doc_id", "rank")
    val sem = (1L to 30L).map(i => (100L - i, i)).toDF("doc_id", "rank")
    val out = HybridSearch.rrfFuse(Seq("lex" -> lex, "sem" -> sem), topK = 7)
      .collect()
    assert(out.length == 7)
    assert(out.map(_.getLong(4)).toSeq == (1L to 7L))
    // scores non-increasing in fused rank
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("three-way fusion and kRrf sensitivity") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val b = Seq((1L, 2L), (2L, 1L)).toDF("doc_id", "rank")
    val c = Seq((2L, 1L), (1L, 2L)).toDF("doc_id", "rank")
    val out = HybridSearch.rrfFuse(Seq("a" -> a, "b" -> b, "c" -> c),
      kRrf = 10, topK = 5).collect()
    // doc 2 wins: ranks (2,1,1) vs doc 1 (1,2,2)
    assert(out.head.getLong(0) == 2L)
    val expect2 = BigDecimal(1.0 / 12 + 1.0 / 11 + 1.0 / 11)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getAs[Double]("rrf_score") == expect2)
    intercept[IllegalArgumentException] {
      HybridSearch.rrfFuse(Seq("a" -> a))
    }
  }
}
