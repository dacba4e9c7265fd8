package graft

/** Machine check of the `no_oracle` allowlist's error envelopes: every
  * row Verify.approxBoundRows grades must sit inside its sketch's
  * published bound at sf0.01 — the same scale the driver's correctness
  * run uses, so a sketch drifting out of envelope fails `sbt test`
  * before it ships a bad `approx_bounds.json`. Data and seeds are
  * fixed, so these are deterministic assertions, not flaky tolerance
  * tests. */
class ApproxBoundsSpec extends SparkSpec {

  test("all allowlisted sketch queries stay inside their published bounds") {
    val rows = Verify.approxBoundRows(spark, "/root/testdata/sf0.01")
    // one row per graded metric, every allowlisted query represented
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet === Set(
      "agg_approx_count_distinct", "agg_hll_sketch_union",
      "agg_kll_quantiles", "agg_approx_percentile",
      "sample_bernoulli_seeded"))
    val out = rows.filter(!_._6)
    assert(out.isEmpty, out.map(r =>
      s"${r._1}/${r._2}=${r._3} outside [${r._4},${r._5}]").mkString("; "))
  }
}
