package graft

/** Registry integrity: `SparkEntry.queries` is built with `toMap`, so a
  * duplicate name across modules would silently drop a query (and its
  * oracle) from the driver's correctness gate.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique across modules") {
    val names = SparkEntry.modules.flatMap(_.all.map(_.name))
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle belongs to a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty)
  }

  test("oracle coverage: at most a small hash-seeded minority lacks oracles") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // every no-oracle query must be hash-seeded/approximate by design —
    // this list is the explicit allowlist. (Round 5 flipped minhash-LSH,
    // simhash, and the stratified sampler to real oracles: md5-replayable
    // hashing for the first two, a CLT count-bracket for the third.)
    val allowed = Set(
      "sim_ann_hyperplane", "sim_ann_multiprobe", "sim_ivf_probe",
      "agg_approx_count_distinct", "agg_hll_sketch_union",
      "agg_kll_quantiles",
      "agg_approx_percentile", "sample_bernoulli_seeded")
    assert((noOracle -- allowed).isEmpty,
      s"queries without oracle not on the allowlist: ${noOracle -- allowed}")
  }
}
