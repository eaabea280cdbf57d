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
    //   q15: simhash (xxhash64 has no DuckDB equivalent)
    //   q19/q40: hyperplane-LSH buckets (splitmix64-seeded)
    //   q20: IVF probe set depends on VectorAvg centroids
    //   q25: xxhash64 rolling fingerprint
    //   q33: decode dims for non-image payloads use the documented fake
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q15_simhash_neardups", "q19_ann_lsh",
      "q20_ann_ivf", "q25_fingerprint_rolling", "q33_multimodal_decode",
      "q40_cosine_neardups_lsh"), s"undocumented rows-only queries: $rowsOnly")
  }
}
