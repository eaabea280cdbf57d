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
    // rows-only check; adding one silently would erode the gate. Every
    // OPERATOR is oracle-checked (q15/q19/q25/q40 via portable md5
    // hash/plane families, q20 via exact decimal-sum centroids, q33 via
    // the md5-closed-form decode/embedding fakes). The only rows-only
    // entries are the PRODUCTION-PATH BENCH TWINS of q20/q40
    // (portable=false fast float paths — not engine-replayable BY
    // DESIGN; their oracle-gated twins stay green and their recall is
    // spec-asserted in SimilaritySpec). Extend only consciously, with a
    // reason recorded here.
    // q136 is the PCA production-path twin: double accumulators + a
    // driver eigendecomposition are not SQL-replayable; its decimal
    // covariance core is oracle-gated at q135.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q127_ann_ivf_fast", "q128_lsh_neardups_fast",
      "q136_pca_project"),
      s"undocumented rows-only queries: $rowsOnly")
  }
}
