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

  test("token entropy matches an exact per-doc reference and stays in bounds") {
    val rows = SparkEntry.queries("text_token_entropy")(spark, sf)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // exact reference: same integer-nano discipline, computed per doc on
    // the driver from the raw text
    val ref = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        val counts = toks.groupBy(identity).map(_._2.length.toLong)
        val n = toks.length.toLong
        val s = counts.map(c =>
          math.floor(c * math.log(c.toDouble) * 1e9).toLong).sum
        val h = math.floor(math.log(n.toDouble) * 1e9 - s.toDouble / n)
        r.getLong(0) -> (n, counts.size.toLong, h.toLong)
      }.toMap
    assert(rows.keySet == ref.keySet)
    rows.foreach { case (id, (n, d, e)) =>
      assert((n, d, e) == ref(id), s"doc $id: ($n,$d,$e) vs ${ref(id)}")
      // 0 <= H <= ln(distinct): uniform distribution is the maximum
      assert(e >= 0 && e <= math.ceil(math.log(d.toDouble) * 1e9).toLong,
        s"doc $id entropy $e outside [0, ln($d)]")
    }
    // the synthetic corpus is non-degenerate: entropies are not constant
    assert(rows.values.map(_._3).toSet.size > 1)
  }
}
