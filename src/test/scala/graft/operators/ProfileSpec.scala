package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row

class ProfileSpec extends SparkSpecBase {

  import spark.implicits._

  private def sample = Seq(
    (Some(1L), Some("a"), Some(10.0)),
    (Some(2L), None, Some(20.0)),
    (Some(2L), Some("b"), None)).toDF("id", "name", "value")

  test("single-pass profile: counts, nulls, distincts, numeric stats") {
    val out = Profile.profile(sample, Seq("id", "name", "value"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.keySet == Set("id", "name", "value"))
    out.values.foreach(r => assert(r.getAs[Long]("n_rows") == 3L))

    val id = out("id")
    assert(id.getAs[Long]("n_nulls") == 0L)
    assert(id.getAs[Long]("n_distinct") == 2L)
    assert(id.getAs[Double]("min_num") == 1.0)
    assert(id.getAs[Double]("max_num") == 2.0)
    assert(id.getAs[Double]("mean_num") == 5.0 / 3)

    val name = out("name")
    assert(name.getAs[Long]("n_nulls") == 1L)
    assert(name.getAs[Long]("n_distinct") == 2L)
    assert(name.isNullAt(name.fieldIndex("min_num")), "non-numeric min is null")
    assert(name.isNullAt(name.fieldIndex("mean_num")))

    val value = out("value")
    assert(value.getAs[Long]("n_nulls") == 1L)
    assert(value.getAs[Long]("n_distinct") == 2L)
    assert(value.getAs[Double]("mean_num") == 15.0)
  }

  test("approx distinct variant keeps the schema and lands near exact") {
    val exact = Profile.profile(sample, Seq("id", "name", "value"))
    val approx = Profile.profile(sample, Seq("id", "name", "value"),
      approxDistinct = true)
    assert(approx.schema == exact.schema)
    val nd = approx.collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    // HLL++ at single-digit cardinality: allow slack but catch nonsense
    nd.values.foreach(v => assert(v >= 1L && v <= 4L, s"implausible distinct $v"))
  }

  test("unknown column is rejected up front") {
    intercept[IllegalArgumentException] {
      Profile.profile(sample, Seq("id", "nope"))
    }
  }
}
