package graft

import org.apache.spark.sql.functions._

/** Exact driver-side replays of the retrieval-eval tier:
  * retrieval_ndcg_eval (NDCG/precision/recall/MRR at k against the
  * deterministic conjunctive-containment relevance) and
  * retrieval_rank_correlation (Kendall τ-a between the lexical and
  * vector top-100 legs). Both references recompute the metric from the
  * raw tables with the same integer-nano discipline, so any drift in
  * the distributed plan (rank order, gating, floor placement) fails
  * loudly rather than hash-mismatching at the driver.
  */
class RetrievalEvalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ndcg eval: metrics match an exact driver-side replay") {
    val got = run("retrieval_ndcg_eval").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got.keySet == Set(5L, 10L, 20L))

    val terms = Seq("spark", "window", "slow")
    val docsRows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val rel = docsRows.map { case (id, txt) =>
      val ts = txt.split(" ").toSet
      id -> terms.forall(ts.contains)
    }.toMap
    val rTot = rel.values.count(identity).toLong
    assert(rTot > 0, "census must find conjunctively-relevant docs")
    val ranked = docsRows.map { case (id, txt) =>
      id -> txt.split(" ").count(terms.contains).toLong
    }.filter(_._2 > 0)
      .sortBy { case (id, tf) => (-tf, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => (id, (i + 1).toLong) }
    def dcgTerm(rank: Long): Long =
      math.floor(1e9 / math.log(rank + 1.0)).toLong
    for (k <- Seq(5L, 10L, 20L)) {
      val top = ranked.filter(_._2 <= k)
      val hits = top.count { case (id, _) => rel(id) }.toLong
      val dcg = top.collect { case (id, r) if rel(id) => dcgTerm(r) }.sum
      val idcg = (1L to math.min(k, rTot)).map(dcgTerm).sum
      val minrank = top.collect { case (id, r) if rel(id) => r }
        .sorted.headOption
      val expect = (hits, hits * 1000000L / k, hits * 1000000L / rTot,
        dcg, idcg, if (idcg > 0) dcg * 1000000L / idcg else 0L,
        minrank.map(1000000L / _).getOrElse(0L))
      assert(got(k) == expect, s"k=$k: ${got(k)} vs $expect")
    }
    // binary NDCG with a perfect prefix is exactly 1: if every top-k
    // row is relevant, dcg == idcg
    val (h20, _, _, d20, i20, n20, _) = got(20L)
    if (h20 == 20L && rTot >= 20L) assert(d20 == i20 && n20 == 1000000L)
  }

  test("rank correlation: tau matches an exact pair count, tau in [-1,1]") {
    val row = run("retrieval_rank_correlation").collect()
    assert(row.length == 1)
    val (nCommon, nPairs, conc, disc, tau) =
      (row(0).getLong(0), row(0).getLong(1), row(0).getLong(2),
        row(0).getLong(3), row(0).getLong(4))
    assert(nPairs == nCommon * (nCommon - 1) / 2)
    assert(conc + disc == nPairs)
    assert(tau >= -1000000L && tau <= 1000000L)

    // exact replay: lexical top-100 by query-term tf, vector top-100 by
    // cosine against vec 0, τ-a over the common set
    val terms = Set("spark", "window", "slow")
    val lex = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").count(terms.contains).toLong)
      .filter(_._2 > 0)
      .sortBy { case (id, tf) => (-tf, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val embRows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val qv = embRows.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val vec = embRows.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(qv, v) }
      .sortBy { case (id, c) => (-c, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val common = lex.keySet.intersect(vec.keySet).toSeq.sorted
    assert(common.size.toLong == nCommon)
    var c = 0L; var d = 0L
    for {
      i <- common.indices
      j <- (i + 1) until common.size
    } {
      val (a, b) = (common(i), common(j))
      if ((lex(a) < lex(b)) == (vec(a) < vec(b))) c += 1 else d += 1
    }
    assert((c, d) == ((conc, disc)), s"pairs: ($c,$d) vs ($conc,$disc)")
    val expTau =
      if (nPairs == 0) 0L
      else if (c >= d) (c - d) * 1000000L / nPairs
      else -((d - c) * 1000000L / nPairs)
    assert(tau == expTau)
  }
}
