package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class FingerprintSpec extends SparkSpecBase {
  import spark.implicits._

  private def table(rows: (Long, String, String)*) =
    rows.toDF("id", "part", "payload")

  test("checksum is invariant to row order and partitioning, and " +
      "additive over disjoint unions") {
    val a = table((1L, "p0", "x"), (2L, "p0", "y"), (3L, "p1", "z"))
    val shuffled = a.orderBy(col("payload")).repartition(7)
    val fpA = Fingerprint.datasetFingerprint(a, Seq("id", "payload")).collect()(0)
    val fpS = Fingerprint.datasetFingerprint(shuffled, Seq("id", "payload")).collect()(0)
    assert(fpA.getLong(0) == 3L && fpA == fpS)
    // additivity: fingerprint(A ∪ B) = elementwise sum
    val b = table((4L, "p1", "w"))
    val fpU = Fingerprint.datasetFingerprint(a.union(b), Seq("id", "payload")).collect()(0)
    val fpB = Fingerprint.datasetFingerprint(b, Seq("id", "payload")).collect()(0)
    assert(fpU.getLong(0) == 4L)
    assert(fpU.getDecimal(1) == fpA.getDecimal(1).add(fpB.getDecimal(1)))
  }

  test("null and empty-string fields hash differently; field boundaries " +
      "are unambiguous") {
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
    val withEmpty = Seq((1L, "")).toDF("id", "s")
    val h1 = withNull.select(Fingerprint.rowHashCol(Seq(col("id"), col("s")))).collect()(0)
    val h2 = withEmpty.select(Fingerprint.rowHashCol(Seq(col("id"), col("s")))).collect()(0)
    assert(h1 != h2)
    // ("ab","c") must not collide with ("a","bc")
    val p1 = Seq(("ab", "c")).toDF("a", "b")
      .select(Fingerprint.rowHashCol(Seq(col("a"), col("b")))).collect()(0)
    val p2 = Seq(("a", "bc")).toDF("a", "b")
      .select(Fingerprint.rowHashCol(Seq(col("a"), col("b")))).collect()(0)
    assert(p1 != p2)
  }

  test("diffFingerprints reports added/removed/changed, omits unchanged") {
    val v1 = table((1L, "keep", "a"), (2L, "mut", "b"), (3L, "gone", "c"))
    val v2 = table((1L, "keep", "a"), (2L, "mut", "CHANGED"), (4L, "new", "d"))
    val fp1 = Fingerprint.partitionFingerprints(v1, Seq("part"), Seq("id", "payload"))
    val fp2 = Fingerprint.partitionFingerprints(v2, Seq("part"), Seq("id", "payload"))
    val diff = Fingerprint.diffFingerprints(fp1, fp2, Seq("part"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(diff == Map("mut" -> "changed", "gone" -> "removed", "new" -> "added"))
  }
}
