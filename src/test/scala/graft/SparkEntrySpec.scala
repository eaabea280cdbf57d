package graft

/** Driver-contract invariants. */
class SparkEntrySpec extends SparkSpecBase {

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique and well-formed") {
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }
}
