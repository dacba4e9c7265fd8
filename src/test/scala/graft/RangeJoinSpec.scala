package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoin

/** The custom range-join operator (graft.plans.RangeJoin): semantics vs a
  * nested-loop reference on random interval data, half-open boundary
  * behavior, many-to-many multiplicity, and the plan shape of the
  * registered query (custom exec node, no nested loop, pruned scans).
  */
class RangeJoinSpec extends SparkSpec {

  test("boundary semantics: half-open [lo, hi), empty intervals dropped") {
    import spark.implicits._
    val pts = Seq((1L, 10L), (2L, 15L), (3L, 20L), (4L, 5L))
      .toDF("pid", "p")
    val ivs = Seq(
      (100L, 10L, 20L), // [10,20): catches p=10,15 but NOT 20
      (200L, 15L, 15L), // empty: never matches
      (300L, 21L, 30L) // no points inside
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi")
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L)))
  }

  test("NULL keys match nothing (SQL inner-join semantics)") {
    import spark.implicits._
    // a null point must not join the interval containing 0, and a null
    // bound must not degrade to a [lo,0) / [0,hi) interval
    val pts = Seq((1L, Some(0L)), (2L, None), (3L, Some(7L)))
      .toDF("pid", "p")
    val ivs = Seq(
      (100L, Some(-5L), Some(5L)), // contains 0
      (200L, None, Some(50L)),     // null lo: matches nothing
      (300L, Some(-50L), None)     // null hi: matches nothing
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi")
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L)), s"got $got")
  }

  test("matches a nested-loop reference on random many-to-many intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 3) {
      val pts = (1 to 400).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      val ivs = (1 to 150).map { i =>
        val lo = rnd.nextInt(1000).toLong
        (10000L + i, lo, lo + rnd.nextInt(80).toLong)
      }
      val pdf = pts.toDF("pid", "p")
      val idf = ivs.toDF("iid", "lo", "hi")
      val custom = RangeJoin.pointInInterval(pdf, idf, "p", "lo", "hi")
        .select("pid", "iid").as[(Long, Long)].collect().sorted
      val expected = (for {
        (pid, p) <- pts
        (iid, lo, hi) <- ivs
        if lo <= p && p < hi
      } yield (pid, iid)).sorted
      assert(custom.toSeq == expected,
        s"custom=${custom.length} expected=${expected.length}")
    }
  }

  test("registered query plans the custom exec, no nested loop, pruned scans") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("join_range_custom_op")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("RangeJoin"), s"custom exec node missing:\n$s")
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct"),
        "range join must not fall back to a nested loop")
      // the prune rule must cut the events scans to the referenced columns
      val scans = plan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.requiredSchema.fieldNames.toSet
      }
      assert(scans.nonEmpty)
      assert(!scans.exists(_.contains("props")),
        s"props must be pruned from every scan: $scans")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
