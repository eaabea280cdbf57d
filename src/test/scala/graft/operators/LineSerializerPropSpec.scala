package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the serialization operator (SURVEY §5): null
  * handling, separator handling, round-trip. Uses raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge isn't on the offline
  * classpath); driver-side evaluation of the same Column expression — the
  * distributed path is covered by LineSerializerSpec / AppendFileSinkSpec.
  */
class LineSerializerPropSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType),
    StructField("c", LongType)))

  private val safeString: Gen[String] =
    Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def serialize(rows: Seq[Row], sep: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    LineSerializer.toLines(df, sep).collect().map(_.getString(0)).toSeq
  }

  test("line always has exactly n-1 separators for separator-free values") {
    val rows = (1L to 20L).map(i => Row(i, sample(safeString, i), i * 2))
    val lines = serialize(rows, "|")
    assert(lines.forall(_.count(_ == '|') == 2))
  }

  test("null anywhere renders as empty slot, preserving positions") {
    (0 to 2).foreach { nullPos =>
      val vals: Seq[Any] = Seq(7L, "x", 9L).zipWithIndex.map {
        case (v, i) => if (i == nullPos) null else v
      }
      val line = serialize(Seq(Row(vals: _*)), ",").head
      val parts = line.split(",", -1)
      assert(parts.length == 3)
      assert(parts(nullPos) == "")
    }
  }

  test("round-trip: split on separator recovers the rendered values") {
    (1L to 20L).foreach { seed =>
      val s = sample(safeString, seed)
      val n = sample(Gen.choose(0L, Long.MaxValue), seed)
      val line = serialize(Seq(Row(n, s, n - 1)), "\t").head
      val parts = line.split("\t", -1)
      assert(parts(0) == n.toString && parts(2) == (n - 1).toString)
      assert(parts(1) == s)
    }
  }
}
