package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ArraySetOpsSpec extends SparkSpecBase {

  import ArraySetOps.{countInSet, intersectCount}

  test("countInSet equals the filter-HOF formulation, multiplicity included") {
    import spark.implicits._
    val markers = Seq("the", "a", "of")
    val df = Seq(
      Seq("the", "cat", "the", "a"),
      Seq("x", "y"),
      Seq.empty[String],
      Seq("of")).toDF("toks")
    val out = df.select(
      countInSet(col("toks"), markers).as("native"),
      size(filter(col("toks"),
        t => markers.map(m => t === lit(m)).reduce(_ || _))).as("hof"))
      .collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)))
    assert(out.map(_.getInt(0)).toSeq == Seq(3, 0, 0, 1))
  }

  test("countInSet skips null tokens like the HOF") {
    import spark.implicits._
    val df = Seq(Seq[String]("the", null, "a")).toDF("toks")
    assert(df.select(countInSet(col("toks"), Seq("the", "a"))).head().getInt(0) == 2)
  }

  test("intersectCount equals size(array_intersect) including duplicates") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 1L, 2L), Seq(1L, 5L)),        // dup on probe side counts once
      (Seq(7L, 8L), Seq(7L, 7L, 9L)),        // dup on build side counts once
      (Seq.empty[Long], Seq(1L)),
      (Seq(5L), Seq.empty[Long])).toDF("a", "b")
    val out = df.select(
      intersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)),
      out.map(r => (r.getInt(0), r.getInt(1))).mkString(","))
  }

  test("sortedIntersectCount equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    // fuzz: random distinct long sets, sorted — the caller contract
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted
      (arr(), arr())
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(3L), Seq.empty[Long]))
    val out = rows.toDF("a", "b").select(
      ArraySetOps.sortedIntersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)),
      out.map(r => (r.getInt(0), r.getInt(1))).mkString(","))
  }

  test("both run inside WholeStageCodegen (no CodegenFallback)") {
    // build from range so the projection can't constant-fold away
    val df = spark.range(4).select(
      array(col("id").cast("string")).as("t"),
      array(col("id")).as("x"),
      array(col("id") + 1).as("y"))
    val q = df.select(countInSet(col("t"), Seq("2")).as("c"),
      intersectCount(col("x"), col("y")).as("i"))
    // `*(n)` prefixes mark WholeStageCodegen stages in the compact plan
    // string; the Project carrying both expressions must be starred
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(q.agg(sum("c"), sum("i")).head().getLong(0) == 1L)
  }
}
