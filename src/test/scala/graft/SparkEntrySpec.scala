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

  test("rows-only queries are exactly the documented hash-seeded set") {
    // every query WITHOUT oracle SQL gets only the driver's weaker
    // rows-only check; adding one silently would erode the gate, so the
    // set is pinned here — extend it consciously, with a reason:
    //   q20: IVF probe set depends on VectorAvg float centroid averaging,
    //        which has no exact SQL mirror (spec gates all-cells == brute)
    //   q33: decode dims for non-image payloads use the documented fake
    // (q15/q19/q25/q40 graduated to oracles via the portable md5
    // hash/plane families — simhash votes, rolling polynomial, LSH planes)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q20_ann_ivf", "q33_multimodal_decode"),
      s"undocumented rows-only queries: $rowsOnly")
  }
}
