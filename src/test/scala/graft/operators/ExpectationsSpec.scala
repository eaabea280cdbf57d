package graft.operators

import graft.SparkSpecBase

class ExpectationsSpec extends SparkSpecBase {

  import spark.implicits._
  import Expectations._

  private def df = Seq(
    (Some(1L), Some(5.0), Some("A"), "ok"),
    (Some(2L), Some(99.0), Some("A"), "ok"),     // range violation
    (None, Some(5.0), Some("Z"), "ok"),          // null + set violations
    (Some(2L), None, Some("A"), "bad value"),    // regex violation; null x passes range
    (Some(3L), Some(5.0), None, "ok"))           // null flag passes one_of
    .toDF("k", "x", "flag", "s")

  test("row-local rules count violations in one pass; nulls only violate not_null") {
    val out = Expectations.check(df, Seq(
        NotNull("k"), InRange("x", 0.0, 50.0), OneOf("flag", Seq("A", "B")),
        Matches("s", "^ok$")))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out("not_null(k)") == ((1L, false)))
    assert(out("in_range(x,0.0,50.0)") == ((1L, false)))
    assert(out("one_of(flag)") == ((1L, false)))
    assert(out("matches(s)") == ((1L, false)))
  }

  test("unique rule counts surplus rows; duplicate keys score their extras") {
    // k=2 appears twice -> 1 surplus row
    val out = Expectations.check(df, Seq(Unique(Seq("k"))))
      .head()
    assert(out.getLong(2) == 1L)
    assert(!out.getBoolean(3))
    // fully unique composite key passes
    val ok = Expectations.check(df, Seq(Unique(Seq("k", "x"))))
      .head()
    assert(ok.getLong(2) == 0L && ok.getBoolean(3))
  }

  test("rule order is preserved through rule_idx; empty frame passes everything") {
    val rules = Seq(Unique(Seq("k")), NotNull("k"), InRange("x", 0.0, 1.0))
    val out = Expectations.check(df.limit(0), rules)
      .orderBy("rule_idx").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("unique(k)", "not_null(k)", "in_range(x,0.0,1.0)"))
    assert(out.forall(_.getBoolean(3)))
    intercept[IllegalArgumentException] { Expectations.check(df, Nil) }
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(NotNull("k"), NotNull("k")))
    }
  }
}
