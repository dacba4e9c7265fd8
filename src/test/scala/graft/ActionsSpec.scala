package graft

import graft.operators.Actions

/** S14/S15/S16 driver-action endpoints. */
class ActionsSpec extends SparkSpec {

  private def region = Tables.load(spark, sf, "region")

  test("collectToDriver is bounded by the mandatory limit") {
    val rows = Actions.collectToDriver(
      Tables.load(spark, sf, "lineitem"), limit = 7)
    assert(rows.length == 7)
  }

  test("preview renders a show()-style table") {
    val out = Actions.preview(region, rows = 3)
    assert(out.contains("r_regionkey") && out.contains("+-"))
  }

  test("count matches table cardinality") {
    assert(Actions.count(region) == 5L)
  }
}
