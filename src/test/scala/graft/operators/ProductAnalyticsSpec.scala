package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ProductAnalyticsSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("funnel: stages must occur strictly in order; out-of-order events don't count") {
    val ev = Seq(
      // user 1 completes in order: view@1, click@2, purchase@3
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2 clicked BEFORE viewing; the later click counts, the
      // purchase before that click does not
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
      (2L, "click", ts(4)),
      // user 3 never clicked
      (3L, "view", ts(1)), (3L, "purchase", ts(2)),
      // user 4 never viewed -> not in the funnel at all
      (4L, "click", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val out = ProductAnalytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("depth")).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    val summary = ProductAnalytics
      .funnelSummary(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(summary == Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("funnel: same-timestamp stage events do NOT chain (strictly after)") {
    val ev = Seq((1L, "view", ts(5)), (1L, "click", ts(5)))
      .toDF("user_id", "event_type", "ts")
    val out = ProductAnalytics.funnel(ev, Seq("view", "click")).head()
    assert(out.getAs[Long]("depth") == 1L)
  }

  test("weeklyRetention: cohorts keyed by first-activity week, exact integer buckets") {
    val act = Seq(
      (1L, 0L), (1L, 6L), (1L, 7L),   // cohort week 0; active weeks 0 and 1
      (2L, 7L), (2L, 21L),            // cohort week 1; active weeks_since 0 and 2
      (3L, 0L))                       // cohort week 0; only week 0
      .toDF("user_id", "day")
    val out = ProductAnalytics.weeklyRetention(act).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("lastTouchAttribution: latest preceding non-conversion wins; bare conversions attribute to null") {
    val ev = Seq(
      (1L, 1L, "view", ts(1)), (1L, 2L, "click", ts(2)),
      (1L, 3L, "purchase", ts(3)),               // attributed to click@2
      (1L, 4L, "purchase", ts(4)),               // still click@2 (purchases don't touch)
      (1L, 5L, "view", ts(5)), (1L, 6L, "purchase", ts(6)), // view@5
      (2L, 7L, "purchase", ts(1)))               // no preceding touch
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = ProductAnalytics.lastTouchAttribution(ev, "purchase")
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)), Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(out(3L) == ((Some("click"), Some(2L), Some(60000000L))))
    assert(out(4L) == ((Some("click"), Some(2L), Some(120000000L))))
    assert(out(6L) == ((Some("view"), Some(5L), Some(60000000L))))
    assert(out(7L) == ((None, None, None)))
  }

  test("transitions: counts and row-normalized probabilities; ties ordered by tiebreak") {
    val ev = Seq(
      (1L, 1L, "a", ts(1)), (1L, 2L, "b", ts(2)), (1L, 3L, "a", ts(3)),
      (1L, 4L, "b", ts(4)),
      (2L, 5L, "a", ts(1)), (2L, 6L, "a", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = ProductAnalytics.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // from a: ->b twice (u1), ->a once (u2) ; from b: ->a once
    assert(out(("a", "b")) == ((2L, 0.666667)))
    assert(out(("a", "a")) == ((1L, 0.333333)))
    assert(out(("b", "a")) == ((1L, 1.0)))
    // no cross-user transition: u1's last 'b' never chains to u2's 'a'
    assert(out.keySet == Set(("a", "b"), ("a", "a"), ("b", "a")))
  }

  test("timeWeightedAvg: readings weighted by how long they were current") {
    // user 1: value 1.0 held for 1 min, then 3.0 held for 3 min, then a
    // final reading (weight 0) -> twap = (1*1 + 3*3) / 4 = 2.5
    val ev = Seq(
      (1L, 1L, 1.0, ts(0)), (1L, 2L, 3.0, ts(1)), (1L, 3L, 99.0, ts(4)),
      // user 2: a single reading has no successor -> no span, dropped
      (2L, 4L, 5.0, ts(0)))
      .toDF("user_id", "event_id", "value", "ts")
    val out = ProductAnalytics.timeWeightedAvg(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getAs[Long]("n") == 2L)
    assert(r.getAs[Long]("span_us") == 4L * 60000000L)
    assert(r.getAs[Double]("twap") == 2.5)
  }

  test("timeWeightedAvg: null readings drop out; their span accrues to the predecessor") {
    val ev = Seq(
      (1L, 1L, Some(2.0), ts(0)), (1L, 2L, Option.empty[Double], ts(1)),
      (1L, 3L, Some(4.0), ts(2)), (1L, 4L, Some(0.0), ts(3)))
      .toDF("user_id", "event_id", "value", "ts")
    // null@1min removed BEFORE lead(): 2.0 holds 0->2min, 4.0 holds 2->3min
    val r = ProductAnalytics.timeWeightedAvg(ev).head()
    assert(r.getAs[Long]("span_us") == 3L * 60000000L)
    assert(r.getAs[Double]("twap") == 2.666667) // 8/3 rounded to 6 dp
  }

  test("funnel withinMicros: out-of-window stages never count, even if " +
      "later occurrences exist") {
    val T = Some(90L * 1000000L) // 90 s
    val ev = Seq(
      // in-window chain: view@1, click@2 (60 s later), purchase@3
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // click 9 min after view: outside 90 s, and no earlier click ->
      // stuck at depth 1 (the late click does not resurrect)
      (2L, "view", ts(1)), (2L, "click", ts(10)), (2L, "purchase", ts(11)),
      // click in window, purchase 28 min after click -> depth 2
      (3L, "view", ts(1)), (3L, "click", ts(2)), (3L, "purchase", ts(30)))
      .toDF("user_id", "event_type", "ts")
    val out = ProductAnalytics.funnel(ev, Seq("view", "click", "purchase"),
        withinMicros = T)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("depth")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("frequentSequences: distinct-user support, a looping single user " +
      "cannot promote a path") {
    val ev = Seq(
      (1L, "v", 1L), (1L, "c", 2L), (1L, "p", 3L), (1L, "v", 4L),
      (2L, "v", 1L), (2L, "c", 2L), (2L, "p", 3L),
      // user 3 walks x->y->z twice: 2 occurrences but only 1 user
      (3L, "x", 1L), (3L, "y", 2L), (3L, "z", 3L),
      (3L, "x", 4L), (3L, "y", 5L), (3L, "z", 6L))
      .map { case (u, e, m) => (u, e, ts(m), u * 100 + m) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = ProductAnalytics.frequentSequences(ev, minUsers = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n_users"), r.getAs[Long]("n_occurrences")))
    // only v->c->p is shared by two users; c->p->v (user 1) and the
    // user-3 loop fall under the distinct-user threshold
    assert(out.toSeq == Seq(("v", "c", "p", 2L, 2L)))
  }

  test("cumulativeUniques: new vs active vs cumulative, hand-computed") {
    import spark.implicits._
    // day 1: users a,b (both new). day 2: a again + c (one new).
    // day 3: a,b,c (none new). duplicate (a, day1) row must not double
    val act = Seq((1L, 1L), (2L, 1L), (1L, 1L),
      (1L, 2L), (3L, 2L),
      (1L, 3L), (2L, 3L), (3L, 3L)).toDF("user_id", "day")
    val out = ProductAnalytics.cumulativeUniques(act)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 2L), (2L, 2L, 1L, 3L),
      (3L, 3L, 0L, 3L)))
  }

  test("userFeatures: one-pass snapshot with hand-computed counts, " +
    "purchase value, recency and churn label") {
    import spark.implicits._
    val day = 86400000L // millis
    def ts(d: Long) = new java.sql.Timestamp(d * day)
    val df = Seq(
      ("u1", "click", 0.0, ts(100)), ("u1", "purchase", 9.5, ts(100)),
      ("u1", "purchase", 0.5, ts(110)), ("u1", "error", 0.0, ts(110)),
      ("u2", "view", 0.0, ts(90)))
      .toDF("user_id", "event_type", "value", "ts")
    val out = ProductAnalytics.userFeatures(df,
      Seq("click", "view", "purchase"), churnDays = 14L)
      .collect().map(r => r.getString(0) -> r).toMap
    val u1 = out("u1")
    assert(u1.getAs[Long]("n_events") == 4L)
    assert(u1.getAs[Long]("n_click") == 1L)
    assert(u1.getAs[Long]("n_purchase") == 2L)
    assert(u1.getAs[Long]("n_view") == 0L)
    assert(u1.getAs[Double]("purchase_value") == 10.0)
    assert(u1.getAs[Long]("first_day") == 100L)
    assert(u1.getAs[Long]("active_days") == 2L)
    assert(u1.getAs[Long]("recency_days") == 0L)
    assert(!u1.getAs[Boolean]("churned"))
    val u2 = out("u2")
    assert(u2.getAs[Double]("purchase_value") == 0.0)
    assert(u2.getAs[Long]("recency_days") == 20L)
    assert(u2.getAs[Boolean]("churned"))
  }

  test("decayedScore: exact half-life weights against the corpus-max " +
    "anchor; users independent; reruns stable") {
    import spark.implicits._
    val day = 86400000000L
    val anchor = 1700000000000000L
    def ts(aged: Long) = new java.sql.Timestamp((anchor - aged * day) / 1000L)
    val df = Seq(
      ("u1", ts(0)), ("u1", ts(7)), ("u1", ts(14)),
      ("u2", ts(0))).toDF("user_id", "ts")
    val out = ProductAnalytics.decayedScore(df, Seq("user_id"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_score"))).toMap
    // ages 0 / 7d / 14d at half-life 7 → weights 1, 0.5, 0.25
    assert(out("u1") == (3L, 1.75))
    assert(out("u2") == (1L, 1.0))
    val again = ProductAnalytics.decayedScore(df.repartition(5),
      Seq("user_id")).collect().map(r => r.getString(0) ->
        r.getAs[Double]("decayed_score")).toMap
    assert(again("u1") == 1.75)
  }
}
