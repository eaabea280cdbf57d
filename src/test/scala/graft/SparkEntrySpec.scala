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

  test("every query has oracle SQL — no rows-only entries") {
    // a query WITHOUT oracle SQL gets only the driver's weaker rows-only
    // check. Since round 8 the set is EMPTY: the former rows-only
    // production twins (q127/q128 fast-float ANN, q136 PCA pipeline)
    // now emit deterministic derived frames (integer agreement counts +
    // measured-margin threshold flags) with real oracle SQL. Adding a
    // rows-only query again requires a documented reason here.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"undocumented rows-only queries: $rowsOnly")
  }
}
