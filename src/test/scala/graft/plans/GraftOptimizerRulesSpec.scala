package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GraftOptimizerRulesSpec extends SparkSpecBase {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteIntersectionSize
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteIntersectionSize)
  }

  test("size(array_intersect) over non-null long arrays is rewritten to IntersectCount") {
    // range-derived arrays (containsNull=false) so nothing constant-folds
    val df = spark.range(2).select(
      array(col("id"), col("id") + 1, col("id") + 2).as("a"),
      array(col("id") + 1, col("id") + 2, col("id") + 9).as("b"))
    withRule {
      val q = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("intersectcount"), optimized)
      assert(q.collect().map(_.getInt(0)).toSeq == Seq(2, 2))
    }
  }

  test("nullable-element arrays are NOT rewritten (null-matching semantics differ)") {
    import spark.implicits._
    val df = Seq((Seq[java.lang.Long](1L, null), Seq[java.lang.Long](null, 2L)))
      .toDF("a", "b")
    withRule {
      val q = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.toLowerCase.contains("intersectcount"), optimized)
      // array_intersect matches the shared null element
      assert(q.head().getInt(0) == 1)
    }
  }

  test("legacy sizeOfNull sessions are NOT rewritten (size(NULL) = -1 there)") {
    // The effective flag is legacy.sizeOfNull AND NOT ansi — replicate the
    // advisor's scenario: a non-ANSI session with the non-ANSI default.
    val key = "spark.sql.legacy.sizeOfNull"
    val ansiKey = "spark.sql.ansi.enabled"
    val saved = spark.conf.get(key)
    val savedAnsi = spark.conf.get(ansiKey)
    try {
      spark.conf.set(ansiKey, "false")
      spark.conf.set(key, "true")
      val df = spark.range(2).select(
        array(col("id"), col("id") + 1).as("a"),
        array(col("id") + 1, col("id") + 9).as("b"))
      withRule {
        val q = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
        val optimized = q.queryExecution.optimizedPlan.toString
        assert(!optimized.toLowerCase.contains("intersectcount"), optimized)
        assert(q.collect().map(_.getInt(0)).toSeq == Seq(1, 1))
      }
    } finally {
      spark.conf.set(key, saved)
      spark.conf.set(ansiKey, savedAnsi)
    }
  }
}
