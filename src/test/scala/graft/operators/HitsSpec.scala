package graft.operators

import graft.SparkSpecBase

class HitsSpec extends SparkSpecBase {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("node").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("authority"),
        r.getAs[Double]("hub"))).toSeq

  test("chain graph: hand-computed fixpoint after one iteration") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    // araw = (0,1,1), norm √2 → auth = (0, 1/√2, 1/√2); hraw = (1/√2,
    // 1/√2, 0), norm 1 → hub — already the fixpoint, so 1 and 3
    // iterations agree
    val v = math.rint(1.0 / math.sqrt(2.0) * 1e6) / 1e6
    val expected = Seq((1L, 0.0, v), (2L, v, v), (3L, v, 0.0))
    assert(rows(Hits.run(e, "src", "dst", iterations = 1)) == expected)
    assert(rows(Hits.run(e, "src", "dst", iterations = 3)) == expected)
  }

  test("star graph: the shared sink is the sole authority, sources split " +
    "hub mass") {
    val e = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val v = math.rint(1.0 / math.sqrt(2.0) * 1e6) / 1e6
    assert(rows(Hits.run(e, "src", "dst", iterations = 2)) ==
      Seq((1L, 0.0, v), (2L, 0.0, v), (3L, 1.0, 0.0)))
  }

  test("dominant authority and hub ordering on an asymmetric bipartite " +
    "graph") {
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L))
      .toDF("src", "dst")
    val m = rows(Hits.run(e, "src", "dst", iterations = 3))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(10L)._1 > m(11L)._1) // in-degree-3 node out-ranks degree-1
    assert(m(3L)._2 > m(1L)._2)   // the two-target hub beats one-target
    assert(m(1L)._2 == m(2L)._2)  // symmetric hubs tie exactly
  }

  test("parallel duplicate edges collapse to one") {
    val e = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("src", "dst")
    val single = rows(Hits.run(Seq((1L, 2L)).toDF("src", "dst"),
      "src", "dst", iterations = 2))
    assert(rows(Hits.run(e, "src", "dst", iterations = 2)) == single)
  }

  test("null endpoints drop; fully-null edge list yields an empty frame") {
    val e = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("src", "dst")
    assert(rows(Hits.run(e, "src", "dst", iterations = 1))
      .map(_._1) == Seq(1L, 2L))
    val empty = Seq((Option.empty[Long], Option.empty[Long]))
      .toDF("src", "dst")
    assert(Hits.run(empty, "src", "dst", iterations = 1).count() == 0L)
  }

  test("invariant under repartitioning") {
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L), (11L, 1L))
      .toDF("src", "dst")
    assert(rows(Hits.run(e, "src", "dst", iterations = 3)) ==
      rows(Hits.run(e.repartition(7), "src", "dst", iterations = 3)))
  }
}
