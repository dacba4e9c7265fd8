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

  test("observeMetrics harvests audit metrics from the materializing pass") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sf, "lineitem")
    val got = Actions.observeMetrics(li, "audit",
      Seq(count(lit(1)).as("rows"),
        sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("discounted"))) {
      df => df.write.mode("overwrite").format("noop").save()
    }
    assert(got("rows") == li.count())
    val expectedDiscounted =
      li.filter(col("l_discount") > 0.05).count()
    assert(got("discounted") == expectedDiscounted)
  }
}
