package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AggStateSpec extends SparkSpecBase {

  test("state(A union B) equals merge(state(A), state(B)) bit-for-bit, " +
      "under any batch split") {
    import spark.implicits._
    val rows = (1L to 200L).map(i =>
      ("g" + (i % 3), i.toDouble / 7.0 + (i % 11)))
    val df = rows.toDF("g", "v")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("g").collect().map(_.toSeq).toSeq
    val direct = AggState.state(df, Seq("g"), "v")
    for (m <- Seq(2L, 3L, 5L)) {
      val parts = (0L until m).map(r =>
        AggState.state(df.filter(abs(hash(col("v"))) % m === r), Seq("g"), "v"))
      assert(key(AggState.merge(parts, Seq("g"))) == key(direct),
        s"merge of $m batches diverged from the one-shot state")
    }
  }

  test("finalizeStats: hand-computed mean/stddev/min/max; n=1 stddev null; " +
      "nulls dropped") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None: Option[Double]), ("b", Some(5.0))).toDF("g", "v")
    val out = AggState.finalizeStats(AggState.state(df, Seq("g"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 3L)
    assert(out("a").getDouble(2) == 2.0)
    assert(out("a").getDouble(3) == 1.0) // sample stddev of 1,2,3
    assert(out("a").getDouble(4) == 1.0 && out("a").getDouble(5) == 3.0)
    assert(out("b").getLong(1) == 1L)
    assert(out("b").isNullAt(3))
  }

  test("merge handles groups present in only some batches") {
    import spark.implicits._
    val a = AggState.state(Seq(("x", 1.0)).toDF("g", "v"), Seq("g"), "v")
    val b = AggState.state(Seq(("y", 2.0), ("y", 4.0)).toDF("g", "v"),
      Seq("g"), "v")
    val out = AggState.finalizeStats(AggState.merge(Seq(a, b), Seq("g")),
        Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 1L, "y" -> 2L))
  }
}
