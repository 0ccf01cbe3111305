package graft

/** Driver-contract smoke: `entry` returns rows, and every oracle key
  * names a real query (a dangling oracle would crash the driver's
  * compare; a query without an oracle is the declared [R] rows-only
  * path). */
class EntrySpec extends SparkSuite {

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a query; [R] set is the declared one") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without a query: $dangling")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // ann_ivf left this set in round 8 (integer-algebra quantizer
    // seed made it fully hash-gatable); bpe_train/bpe_apply/
    // pack_bestfit joined in round 13 (merge recursion / BFD bin
    // state have no cross-engine oracle — VerifyR properties)
    val declared = Set("graph_kcore",
      "q23_approx_percentiles", "q12_approx_distinct",
      "dedup_minhash_lsh", "dedup_simhash", "ann_lsh",
      "embed_cluster", "embed_pca", "stream_neardup",
      "bpe_train", "bpe_apply", "pack_bestfit")
    assert(rowsOnly == declared,
      s"undeclared rows-only queries: ${rowsOnly -- declared}; " +
        s"missing: ${declared -- rowsOnly}")
  }
}
