package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.Row

/** Cross-checks the engine-side N-round BPE trainer (posexplode + lead
  * pair counts, aggregate() merge lambda) against an independent
  * driver-side greedy reference (Sennrich et al. 2016 on the word-freq
  * dict) at N=10 — seven rounds past the oracled 3-round queries, so the
  * loop body, tie-break total order, and merge-apply scan semantics are
  * pinned beyond the unroll depth round 6 flagged.
  */
class BpeSpec extends SparkSpec {

  /** Greedy left-to-right non-overlapping merge of (pa,pb) in one word's
    * symbol sequence — the same scan the aggregate() lambda encodes (a
    * freshly merged tail cannot immediately re-merge). */
  private def applyMerge(syms: Vector[String], pa: String, pb: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
        out += (pa + pb); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer over a collected word-freq dict: each round counts
    * adjacent pairs weighted by word frequency, picks (cnt DESC, pa ASC,
    * pb ASC), applies the merge to every word. Symbols here are ASCII
    * a-z fragments, so Scala string order == Spark UTF8 binary order. */
  private def refTrain(dict0: Map[String, (Long, Vector[String])],
      rounds: Int): (Seq[(String, String, Long)],
                     Map[String, Vector[String]]) = {
    var dict = dict0.map { case (w, (f, syms)) => (w, f, syms) }.toVector
    val merges = (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      dict.foreach { case (_, f, syms) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val ((pa, pb), cnt) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      dict = dict.map { case (w, f, syms) =>
        (w, f, applyMerge(syms, pa, pb)) }
      (pa, pb, cnt)
    }
    (merges, dict.map { case (w, _, syms) => w -> syms }.toMap)
  }

  test("N=10 engine training matches the driver-side greedy reference") {
    val (dN, bests) = TextAnalysis.bpeTrain(spark, sf, rounds = 10)
    assert(bests.size == 10)
    // independent reference input: rebuild the word-freq dict directly
    val dict0 = Tables.load(spark, sf, "documents")
      .selectExpr("explode(split(lower(text), '[^a-z]+')) AS w")
      .where("length(w) >= 2")
      .groupBy("w").count()
      .collect()
      .map { r =>
        val w = r.getString(0)
        w -> (r.getLong(1), w.split("").toVector.filter(_.nonEmpty))
      }.toMap
    val (refMerges, refDict) = refTrain(dict0, rounds = 10)

    val gotMerges = bests.map { b =>
      val Row(pa: String, pb: String, cnt: Long) =
        b.select("pa", "pb", "cnt").head
      (pa, pb, cnt)
    }
    assert(gotMerges == refMerges,
      s"merge sequence diverged:\n engine=$gotMerges\n ref=$refMerges")

    val gotDict = dN.select("w", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(gotDict.keySet == refDict.keySet)
    val bad = gotDict.collect {
      case (w, syms) if refDict(w) != syms => (w, syms, refDict(w))
    }
    assert(bad.isEmpty, s"dict diverged on ${bad.take(5)}")
  }

  test("lineage truncation keeps the N=10 loop's plan depth bounded") {
    // rounds 8+ run on a truncated dict: its logical plan must not chain
    // back through all prior rounds' merge lambdas
    val (dN, _) = TextAnalysis.bpeTrain(spark, sf, rounds = 10)
    val planStr = dN.queryExecution.logical.toString
    val lambdaCount = "aggregate\\(".r.findAllIn(planStr).size
    assert(lambdaCount <= 4,
      s"expected ≤4 merge lambdas above the last truncation, " +
        s"got $lambdaCount — lineage not truncated")
  }
}
