package graft

import org.apache.spark.sql.functions._

/** Corpus-statistics semantics: the Zipf-exponent fit must agree with a
  * driver-side OLS reference, and its plan must take the vocabulary head
  * through a bounded top-k — never a global single-partition window over
  * the full (data-sized) vocabulary.
  */
class TextStatsSpec extends SparkSpec {

  test("zipf alpha matches a driver-side OLS reference fit") {
    // reference: term frequencies → top-1000 by (f desc, term), ranks
    // 1..n, plain least-squares slope of ln f on ln r — no shared code
    // with the query.
    val freqs = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val top = freqs.sortBy { case (t, f) => (-f, t) }.take(1000)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val row = SparkEntry.queries("text_zipf_alpha")(spark, sf).collect()(0)
    assert(math.abs(row.getDouble(0) - (-slope)) < 1e-6,
      s"alpha ${row.getDouble(0)} vs reference ${-slope}")
    assert(row.getLong(1) == top.length.toLong)
    assert(row.getLong(2) == top.head._2)
  }

  test("zipf plan bounds the ranking frame with a top-k, not a global sort") {
    val plan = SparkEntry.queries("text_zipf_alpha")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocabulary head should come from a bounded top-k:\n${plan.take(1500)}")
  }
}
