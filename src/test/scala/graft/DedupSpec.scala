package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale-shape + semantics tests for the dedup family: the MinHash-LSH and
  * Jaccard candidate generation must be equi-joins (NO cartesian products —
  * an all-pairs plan "passes" at sf0.01 and dies at 100 TB), and the LSH
  * path's results must be a high-recall subset of the exact Jaccard pairs.
  */
class DedupSpec extends SparkSpec {

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertNoCartesian(df: DataFrame, name: String): Unit = {
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      s"$name plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$name plan contains BroadcastNestedLoopJoin")
  }

  test("exact/jaccard/minhash plans contain no cartesian product") {
    for (q <- Seq("dedup_exact", "dedup_exact_hash", "dedup_ngram_jaccard",
        "dedup_minhash_lsh", "dedup_embedding_cosine",
        "dedup_fuzzy_name_join", "dedup_substring_spans")) {
      assertNoCartesian(SparkEntry.queries(q)(spark, sf), q)
    }
  }

  test("substring spans match an independent reference implementation") {
    // reference: count every 8-token window across the corpus, mark
    // positions whose window repeats (anywhere, incl. within the same
    // doc), merge overlapping-or-adjacent marked windows into maximal
    // intervals — all in plain driver-side Scala, no shared code with
    // the query under test.
    val k = 8
    val toks = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .filter(_.nonEmpty).toIndexedSeq)
    val windowCount = scala.collection.mutable.Map.empty[String, Int]
    for ((_, ts) <- toks; p <- 0 to ts.length - k)
      windowCount.updateWith(ts.slice(p, p + k).mkString(" ")) {
        c => Some(c.getOrElse(0) + 1)
      }
    val expected = (for {
      (id, ts) <- toks.toSeq
      marked = (0 to ts.length - k).filter(p =>
        windowCount(ts.slice(p, p + k).mkString(" ")) > 1)
      if marked.nonEmpty
      span <- marked.tail.foldLeft(List((marked.head, marked.head))) {
        // merge when the next start is within k of the previous start
        case ((s0, e0) :: rest, p) if p - e0 <= k => (s0, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
    } yield (id, span._1 + 1L, span._2 + k.toLong,
      (span._2 + k - span._1).toLong)).toSet
    val got = SparkEntry.queries("dedup_substring_spans")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"spans diverge: extra=${got -- expected}, missing=${expected -- got}")
    assert(got.nonEmpty, "sf0.001 corpus plants duplicates; spans expected")
  }

  test("exact dedup groups identical texts under one keeper") {
    val res = SparkEntry.queries("dedup_exact")(spark, sf)
    val total = res.agg(sum("n")).collect()(0).getLong(0)
    val docs = Tables.load(spark, sf, "documents").count()
    assert(total == docs, "every document assigned to exactly one group")
    // keeper is the min doc_id of its group
    assert(res.filter(col("keeper").isNull).count() == 0)
  }

  test("minhash-LSH pairs are a subset of exact-jaccard pairs at the same threshold") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .select("id_a", "id_b")
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("id_a", "id_b")
    val nLsh = lsh.count()
    val missed = lsh.except(exact).count()
    assert(missed == 0,
      s"LSH produced $missed pairs not in the exact-jaccard set (post-verify step must make them exact)")
    // recall: LSH should recover most exact pairs (banding is probabilistic;
    // the verify step keeps precision exact, so recall is the only risk)
    val nExact = exact.count()
    if (nExact > 0) {
      val recall = nLsh.toDouble / nExact
      assert(recall >= 0.5, s"LSH recall $recall too low ($nLsh/$nExact)")
    }
  }

  test("minhash verify fires once per pair: output is duplicate-free without a distinct") {
    // the minimal-agreeing-band gate makes each surviving pair
    // structurally unique (the old plan needed a .distinct() shuffle to
    // collapse per-band repeats); a regression in the gate would
    // resurface here as duplicated (id_a, id_b) rows
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
    val n = lsh.count()
    val distinctPairs = lsh.select("id_a", "id_b").distinct().count()
    assert(n == distinctPairs,
      s"minhash emitted $n rows but only $distinctPairs distinct pairs")
    // and the gate only dedups — it must not LOSE pairs: every raw band
    // meeting above threshold corresponds to a surviving pair
    val gatedMeetings =
      operators.Dedup.minhashMeetings(spark, sf, gated = true)
    val rawMeetings = operators.Dedup.minhashMeetings(spark, sf)
    assert(gatedMeetings <= rawMeetings)
    assert(gatedMeetings >= n,
      s"gated meetings $gatedMeetings < surviving pairs $n — gate dropped" +
        " a first agreement")
    spark.catalog.clearCache()
  }

  test("embedding-cosine near-dup pairs are true high-cosine pairs") {
    val found = SparkEntry.queries("dedup_embedding_cosine")(spark, sf)
    // every reported pair really has cosine >= 0.95 (the verify step is
    // exact, so precision must be 1.0 by construction)
    assert(found.filter(col("cos_sim") < 0.95).count() == 0)
    // the planted canary duplicates guarantee a non-empty result — an
    // empty pair set would mean the LSH candidate stage lost them
    val n = found.count()
    assert(n > 0, "planted canary pairs must be recovered")
    // determinism across runs (hash-seeded bucketing, fixed seeds)
    val again = SparkEntry.queries("dedup_embedding_cosine")(spark, sf)
    assert(found.except(again).count() == 0 && again.except(found).count() == 0)
  }

  test("semantic-cell dedup: subset of the LSH pair set, recall bounded, " +
      "cross-cell misses are the only losses") {
    // Both detectors face the same planted corpus (embPlantedCorpus), so
    // the LSH detector's output — which equals the exact >=0.95 pair set
    // by its miss-bound design — is ground truth for the cell variant.
    val lsh = SparkEntry.queries("dedup_embedding_cosine")(spark, sf)
      .select("id_a", "id_b", "cos_sim")
    val cells = SparkEntry.queries("dedup_semantic_cells")(spark, sf)
      .select("id_a", "id_b", "cos_sim")
    // subset with IDENTICAL cosines: a cell pair absent from the exact
    // set would be a correctness bug, not a recall trade
    assert(cells.except(lsh).count() == 0,
      "semantic-cell pairs must be a subset of the exact pair set")
    val nLsh = lsh.count()
    val nCells = cells.count()
    // the documented trade: pairs split across cells are lost, but the
    // planted dups are tail-perturbed copies (cosine ~0.90-0.9999), so
    // most quantize into the same cell — pin the measured floor (39/48
    // at sf0.01) with margin, and require real loss visibility: if the
    // two sets are identical the canary stopped exercising the trade
    assert(nCells >= (nLsh * 0.7).toLong,
      s"cell recall collapsed: $nCells of $nLsh")
    // set algebra sanity: the miss set is exactly LSH minus cells — the
    // cell detector never invents a pair the exact set lacks, so the
    // counts must reconcile without overlap anomalies
    assert(lsh.except(cells).count() == nLsh - nCells)
  }

  test("two-stage composition is lossless: output equals the cells detector " +
      "row-for-row (the within-cell LSH stage never drops a true pair)") {
    // the SemDeDup production composition's correctness claim: within a
    // cell, the (8-bit, 24-table) LSH candidate stage has per-pair miss
    // ≤1e-6 at the 0.95-threshold angle, and the verify is exact — so
    // stage 2 must change COST only, never the pair set. A diff here
    // means someone shrank the table count (recall) or broke the
    // (cell, tbl, bucket) join key (precision).
    val cells = SparkEntry.queries("dedup_semantic_cells")(spark, sf)
      .select("cell", "id_a", "id_b", "cos_sim")
    val two = SparkEntry.queries("dedup_semantic_two_stage")(spark, sf)
      .select("cell", "id_a", "id_b", "cos_sim")
    assert(two.except(cells).count() == 0,
      "two-stage invented a pair the cells detector lacks (precision break)")
    assert(cells.except(two).count() == 0,
      "two-stage lost a within-cell pair (LSH recall break)")
    assert(cells.count() > 0, "vacuous: no within-cell pairs at this SF")
  }

  test("occupancy gate loses nothing: two-stage output is identical at " +
      "gate=0 (all cells LSH), gate=∞ (all cells direct), and a mid " +
      "value that splits the cells") {
    // the gate routes each cell to stage-2 LSH or the direct exact
    // join; both branches verify with the same exact cosine, so any
    // gate value must yield the SAME pair set — the production rule
    // (round-13 verdict task 1) is a pure cost decision
    val k = Dedup.semCellCount(
      Tables.footerRowCount(spark, s"$sf/embeddings.parquet") * 6 / 5)
    def pairs(gate: Long) =
      Dedup.semCellTwoStagePairs(spark, sf, k, gate = gate)
        .select("cell", "id_a", "id_b", "cos_sim")
    val allLsh = pairs(0L)
    val allDirect = pairs(Long.MaxValue)
    // a mid gate must ACTUALLY split — some cells route direct, some
    // LSH — or the heterogeneous-routing path goes untested; gate on
    // the midpoint of the real occupancy range (bounded collect: k
    // cells, k = 16 at the pinned SFs)
    val occs = Dedup.semCellAssign(spark, Dedup.embPlantedCorpus(spark, sf),
        Dedup.semCellCodebook(spark, sf, k))
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(occs.min < occs.max,
      "cells are uniformly occupied — the mid-gate split is vacuous")
    val mid = (occs.min + occs.max) / 2
    val split = pairs(mid)
    assert(allLsh.count() > 0, "vacuous: no pairs at this SF")
    assert(allLsh.except(allDirect).count() == 0 &&
      allDirect.except(allLsh).count() == 0,
      "gate=0 vs gate=∞ outputs diverge — a branch is wrong")
    assert(split.except(allDirect).count() == 0 &&
      allDirect.except(split).count() == 0,
      "mid-gate output diverges — per-cell routing loses pairs")
    spark.catalog.clearCache()
  }

  test("pHash near-dup finds the planted perturbed copies: a local " +
      "block-7 edit stays within Hamming<=3 for most media") {
    // the perceptual property under test: a small local edit (every
    // 64th byte rewritten) perturbs one block's intensity plus the
    // global mean, so the planted copy should usually stay within the
    // Hamming-<=3 verify — but mean-shift threshold crossings can push
    // borderline blocks over, so recall is a floor, not 1.0 (that
    // instability is inherent to block-mean hashing, not a bug)
    val out = SparkEntry.queries("multimodal_phash_near_dup")(spark, sf)
    val nDocs = Tables.load(spark, sf, "documents").count()
    val planted = out.filter(col("id_b") === col("id_a") + 10000000L).count()
    assert(nDocs > 0)
    assert(planted >= (nDocs * 0.5).toLong,
      s"planted pHash recall collapsed: $planted of $nDocs")
    // blocking-completeness spot check: the output must equal what an
    // unbanded Hamming join would produce — every pair here has
    // hamming <= 3, and the DuckDB oracle (all-pairs) pins the full
    // set; locally just assert no pair exceeds the verify bound
    assert(out.filter(col("hamming") > 3).count() == 0)
    spark.catalog.clearCache()
  }

  test("pHash occupancy gate: gate=0 (all sub-banded) / mid / infinity " +
      "(all direct) route to row-identical pair sets") {
    import graft.operators.Multimodal
    // the completeness claim under test: within a shared (si, sv)
    // bucket a qualifying pair has <=3 diffs in the complementary 48
    // bits, so 4x12-bit sub-slice re-blocking finds every pair the
    // direct in-bucket join finds — at ANY gate, including the
    // degenerate all-sub-banded and all-direct extremes
    def pairs(g: Long) = Multimodal.phashNearDupPairs(spark, sf, gate = g)
    val allSub = pairs(0L)
    val allDirect = pairs(Long.MaxValue)
    // heterogeneous occupancy so the mid-gate split is non-vacuous
    // (both branches live)
    val occs = Multimodal.phashRoutedBandFrame(spark, sf)
      .select("si", "sv", "occ").distinct()
      .agg(min(col("occ")), max(col("occ"))).head()
    val (omin, omax) = (occs.getLong(0), occs.getLong(1))
    assert(omin < omax,
      "band buckets are uniformly occupied — the mid-gate split is vacuous")
    val split = pairs((omin + omax) / 2)
    assert(allDirect.count() > 0, "vacuous: no pHash pairs at this SF")
    assert(allSub.except(allDirect).count() == 0 &&
      allDirect.except(allSub).count() == 0,
      "gate=0 vs gate=infinity outputs diverge — a branch is wrong")
    assert(split.except(allDirect).count() == 0 &&
      allDirect.except(split).count() == 0,
      "mid-gate output diverges — per-bucket routing loses pairs")
    spark.catalog.clearCache()
  }

  test("native trigram_shingles matches the HOF reference spelling exactly") {
    GraftExtensions.register(spark)
    val docs = Tables.load(spark, sf, "documents")
    val both = docs.select(
      call_function("trigram_shingles", split(col("text"), " ")).as("native"),
      Dedup.shinglesReference(col("text")).as("reference"))
    assert(both.filter(not(col("native") === col("reference"))).count() == 0,
      "native expression diverged from the HOF specification")
    // edge rows: empties, short docs, repeated separators
    import spark.implicits._
    val edge = Seq("", "one", "one two", "a  b   c", "x y z x y z")
      .toDF("text")
    val eq = edge.select(
      call_function("trigram_shingles", split(col("text"), " ")).as("n"),
      Dedup.shinglesReference(col("text")).as("r"))
    assert(eq.filter(not(col("n") === col("r"))).count() == 0)
  }

  test("connected components converge on a long chain (pointer jumping)") {
    import spark.implicits._
    // a 300-node path: plain min-propagation needs ~300 rounds; the
    // pointer-jumping version must finish within its 64-round cap
    val chain = (0L until 300L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("id_a", "id_b")
    val comp = Dedup.components(chain)
    assert(comp.count() == 300)
    assert(comp.filter(col("lbl") =!= 0L).count() == 0,
      "every chain member must resolve to component 0")
  }

  test("simhash is deterministic and near-identical docs collide closely") {
    val a = SparkEntry.queries("dedup_simhash")(spark, sf)
    val b = SparkEntry.queries("dedup_simhash")(spark, sf)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("simhash locality: small edits flip few bits, unrelated text flips many") {
    import spark.implicits._
    // synthetic corpus written as a temp documents table the registered
    // query shape can run over via the same expression pipeline
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i")
      .mkString(" ")
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val docs = Seq((0L, base), (1L, nearDup), (2L, unrelated))
      .toDF("doc_id", "text")
    val ex = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      // same md5-derived 32-bit token hash as the registered query
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val bitAggs = (0 until 32).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j"))
    val sim = (0 until 32)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sigs = ex.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), sim.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val near = hamming(sigs(0L), sigs(1L))
    val far = hamming(sigs(0L), sigs(2L))
    assert(near < far,
      s"near-dup distance $near not below unrelated distance $far")
    assert(near <= 8, s"1-token edit flipped $near of 32 bits")
  }

  test("incremental dedup: verdicts consistent, batch side complete, no cartesian") {
    val df = SparkEntry.queries("dedup_incremental_corpus")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val rows = df.collect()
    val batchSize = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 2 === 1).count()
    assert(rows.length == batchSize, "one verdict per incoming doc")
    rows.foreach { r =>
      val exact = r.getBoolean(1)
      val near = !r.isNullAt(2)
      val novel = r.getBoolean(3)
      assert(novel == (!exact && !near), s"inconsistent verdict: $r")
      if (near)
        assert(r.getLong(2) % 2 == 0, "near-dup partner must be existing side")
    }
  }

  test("winnowing guarantee: docs sharing a w+k-1-token run share a" +
      " fingerprint; density stays a fraction of the gram count") {
    import spark.implicits._
    // two documents with disjoint vocabularies except a planted 6-token
    // (= w+k-1) run in the middle — the Schleimer guarantee says at
    // least one selected fingerprint must coincide; a third document
    // with no overlap must share nothing
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"red green blue $shared cyan magenta yellow black white"),
      (2L, s"one two three four $shared five six seven eight nine ten"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed"))
      .toDF("doc_id", "text")
    val fps = graft.operators.TextAnalysis.winnowFingerprints(docs)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "planted shared 6-token run produced no shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint documents share a fingerprint (hash collision at n=3?)")
    // density: winnowing selects ~2/(w+1) of grams; allow a wide bracket
    // but pin that it is a strict subset, not all grams
    val doc1Grams = docs.filter($"doc_id" === 1L)
      .select(size(split($"text", " "))).head.getInt(0) - 2
    assert(fps(1L).size < doc1Grams,
      "winnowing selected every gram — no compression")
  }

  test("df cap keeps a viral posting key from exploding the pair join") {
    import spark.implicits._
    // 200 docs all sharing one viral key (boilerplate fingerprint) plus
    // one private key each: uncapped, the self-join would emit
    // 200·199/2 ≈ 20k candidate rows from the viral key alone —
    // quadratic in df. With the cap the viral key is dropped from the
    // index and the candidate stream stays linear.
    val viral = (1L to 200L).map(i => (i, 777L)) ++
      (1L to 200L).map(i => (i, 1000L + i))
    val post = viral.toDF("doc_id", "fp")
    val capped = Dedup.dfCapped(post, "fp", cap = 64)
    assert(capped.filter($"fp" === 777L).count() == 0,
      "viral key (df=200 > cap) survived the cap")
    assert(capped.count() == 200, "private keys (df=1) must all survive")
    val pairs = capped.as("a")
      .join(capped.as("b"),
        $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
    assert(pairs.count() == 0,
      "capped index still produced quadratic candidates")
    // a key at exactly the cap is kept — the cap is strict-greater
    val atCap = (1L to 64L).map(i => (i, 5L)).toDF("doc_id", "fp")
    assert(Dedup.dfCapped(atCap, "fp", cap = 64).count() == 64)
  }

  test("resolveRoots chases deep verdict chains to their forest root " +
      "in O(log depth) pointer-doubled rounds") {
    import spark.implicits._
    // forest: one 200-deep chain (200→199→…→1→0), one 3-node star
    // (1001,1002→1000), one singleton (5000). 200 deep would take 200
    // one-step rounds; pointer doubling must land well inside the
    // 64-round cap (⌈log2(200)⌉ = 8 jump rounds).
    val chain = (1L to 200L).map(i => (i, i - 1)) :+ (0L, 0L)
    val star = Seq((1001L, 1000L), (1002L, 1000L), (1000L, 1000L))
    val single = Seq((5000L, 5000L))
    val par = (chain ++ star ++ single).toSeq.toDF("m", "p")
    val roots = Dedup.resolveRoots(par).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots.size == 205)
    assert((0L to 200L).forall(roots(_) == 0L),
      "chain member did not resolve to the chain root")
    assert(Seq(1000L, 1001L, 1002L).forall(roots(_) == 1000L))
    assert(roots(5000L) == 5000L)
    // registered consumer sanity on the fixture corpus: every dropped
    // media's representative is a keeper, keepers map to themselves
    val keepers = SparkEntry.queries(
      "multimodal_phash_keepers_incremental")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val keeperIds = keepers.filter(_._3).map(_._1).toSet
    assert(keepers.exists(!_._3), "no media dropped — vacuous")
    assert(keepers.filter(!_._3).forall(k => keeperIds(k._2)),
      "a dropped media resolves to a non-keeper representative")
    assert(keepers.filter(_._3).forall(k => k._2 == k._1),
      "a keeper's representative is not itself")
  }
}
