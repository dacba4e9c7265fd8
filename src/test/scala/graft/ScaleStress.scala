package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× corpus stress for the dedup/similarity/text families — the
  * empirical leg of the 100 TB story (rounds 6-7 carryover). Builds a
  * `copies`× corpus from the sf0.1 documents/embeddings where each extra
  * copy is deliberately NOT a duplicate of the original (salt tokens
  * every 4th position break shingle/minhash/simhash similarity; a
  * per-copy circular rotation decorrelates embeddings), so the planted
  * duplicate RATE stays constant while volume scales — the regime where
  * a bucketed-candidate design must grow ~linearly and an all-pairs
  * design would grow quadratically. Times each family query on the base
  * and scaled dirs in one session (min of 2, Bench protocol) and writes
  * BENCH_scale10.json.
  *
  * Run: `sbt "Test/runMain graft.ScaleStress"` (env SPARK_GRAFT_CPUS,
  * args: [baseDir] [copies] [outJson]).
  */
object ScaleStress {

  /** Build the copies× corpus as ONE crossJoin with a copies range (a
    * 100-way unionByName built a 100-branch plan that took longer than
    * the queries it feeds). Copy 0 is the original.
    *
    * Text: salt every 2nd token with a copy+position token. The salted
    * stream has a salt in every 3 consecutive tokens, so NO original
    * 3-gram shingle survives — cross-copy shingle Jaccard is exactly 0
    * and every shingle/minhash/simhash/winnowing detector sees the
    * copies as unrelated (a period-4 salt left ~1/3 Jaccard and
    * produced 300× cross-copy pair inflation). Planted duplicate pairs
    * WITHIN a copy stay duplicates (same salts at same positions).
    *
    * Embeddings: per-(copy,dim) deterministic sign flips + a circular
    * rotation by copy%dim — norm-preserving. The sign bit mixes cp and
    * d MULTIPLICATIVELY (pmod(cp*(2d+1)*2654435761, 1000003) % 2): an
    * additive form like (cp*131 + d*37) % 2 depends only on cp's
    * parity, which made copies 64..99 EXACT duplicates of copies
    * 0..35 (same rotation, same signs) — the detector then correctly
    * reported ~6× the linear pair count. Two copies now share a sign
    * pattern only if equal mod 1000003. */
  def buildScaled(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int): Unit = {
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    val cps = spark.range(copies.toLong)
      .select(col("id").cast("int").as("cp"))
    def upToDate(path: String, expected: Long): Boolean =
      try spark.read.parquet(path).count() == expected
      catch { case _: Throwable => false }
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    if (!upToDate(s"$outDir/documents.parquet", docs.count() * copies))
      docs.crossJoin(cps)
        .withColumn("doc_id", col("doc_id") + col("cp") * lit(1000000L))
        .withColumn("text", when(col("cp") === 0, col("text")).otherwise(
          array_join(flatten(expr(
            """transform(split(text, ' '), (t, j) ->
                 CASE WHEN j % 2 = 1
                   THEN array(t, concat('slt', cp, 'x', j))
                   ELSE array(t) END)""")), " ")))
        .withColumn("n_chars", length(col("text")))
        .drop("cp")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val embBase = spark.read.parquet(s"$baseDir/embeddings.parquet")
    if (!upToDate(s"$outDir/embeddings.parquet",
        embBase.count() * copies)) embBase
      .crossJoin(cps)
      .withColumn("vec_id", col("vec_id") + col("cp") * lit(10000000L))
      .withColumn("embedding",
        when(col("cp") === 0, col("embedding")).otherwise(expr(
          """transform(
               concat(slice(embedding, pmod(cp, size(embedding)) + 1,
                            size(embedding) - pmod(cp, size(embedding))),
                      slice(embedding, 1, pmod(cp, size(embedding)))),
               (x, d) -> CASE WHEN
                   pmod(cp * (2 * d + 1) * 2654435761, 1000003) % 2 = 0
                 THEN x ELSE -x END)""")))
      .drop("cp")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // relational/streaming heavy families (round-9 mandate): scale
    // events / lineitem / orders with per-copy KEY SHIFTS — new users,
    // orders and part↔supplier subgraphs per copy, so session lengths,
    // per-key group sizes and graph degree stay constant while volume
    // scales: the regime where the range-slice / salted-agg /
    // degree-orientation designs must hold ~linear, and where a design
    // keyed on a constant-cardinality column (event_type has 5 values)
    // is forced to prove its slice parallelism. Timestamps are kept so
    // the same wall-clock range carries copies× the event RATE
    // (streaming state and quote-bucket sizes scale like a busier
    // system, not a longer-running one).
    def scaleTable(name: String, shift: (DataFrame, Column) => DataFrame,
        parts: Int): Unit = {
      val base = Tables.load(spark, baseDir, name)
      val target = s"$outDir/$name.parquet"
      if (!upToDate(target, base.count() * copies))
        shift(base.crossJoin(cps), col("cp"))
          .drop("cp")
          .repartition(parts)
          .write.mode("overwrite").parquet(target)
    }
    scaleTable("events", (df, cp) => df
      .withColumn("event_id", col("event_id") + cp * lit(1000000000L))
      .withColumn("user_id", col("user_id") + cp * lit(10000000L)),
      parts = 32)
    scaleTable("lineitem", (df, cp) => df
      .withColumn("l_orderkey", col("l_orderkey") + cp * lit(1000000000L))
      .withColumn("l_partkey", col("l_partkey") + cp * lit(1000000L))
      .withColumn("l_suppkey", col("l_suppkey") + cp * lit(1000000L)),
      parts = 64)
    scaleTable("orders", (df, cp) => df
      .withColumn("o_orderkey", col("o_orderkey") + cp * lit(1000000000L))
      .withColumn("o_custkey", col("o_custkey") + cp * lit(10000000L)),
      parts = 32)
    // remaining tables pass through unscaled so incidental reads resolve
    for (t <- Tables.names
        if !Seq("documents", "embeddings", "events", "lineitem",
          "orders").contains(t)) {
      val src = Paths.get(s"$baseDir/$t.parquet")
      val dst = out.resolve(s"$t.parquet")
      if (!Files.exists(dst)) Files.copy(src, dst)
    }
  }

  /** Canary corpora are rewrites that deliberately preserve row counts
    * and ids, so a bare count()==n reuse check cannot distinguish a
    * current canary from a stale one written by an older generator
    * recipe (or from a plain unclustered copy) — the probe would then
    * silently measure the wrong corpus (round-10 ADVICE). Each builder
    * therefore stamps a marker file keyed on its parameters and a
    * generator version (bump [[CanaryVersion]] whenever a recipe
    * changes), and reuse requires count AND marker to match. */
  private val CanaryVersion = 1
  private def markerBody(kind: String, k: Long): String =
    s"""{"kind":"$kind","k":$k,"version":$CanaryVersion}"""
  private def markerOk(dir: String, kind: String, k: Long): Boolean =
    try Files.readString(
      Paths.get(s"$dir/_graft_canary_$kind.json")) == markerBody(kind, k)
    catch { case _: Throwable => false }
  private def writeMarker(dir: String, kind: String, k: Long): Unit = {
    Files.writeString(Paths.get(s"$dir/_graft_canary_$kind.json"),
      markerBody(kind, k))
    ()
  }

  /** Dense-cluster canary variant of the scaled embeddings (round-8
    * verdict item 5): ~1% of vectors are replaced by members of k
    * clusters (~1000 members each) centered on distinct base vectors,
    * each member a tiny deterministic diagonal perturbation of its
    * center (pairwise in-cluster cosine ≈ 0.9999, so every in-cluster
    * pair is a true near-dup). This is the risk axis the round-8
    * sign-flip generator bug accidentally probed: candidate occurrences
    * are quadratic in CLUSTER size no matter how many hash bits the
    * adaptive LSH uses — the design survives only because the verify
    * rides inside the bucket join instead of shuffling pairs. Only
    * embeddings is written; the probe reads nothing else. */
  def buildClustered(spark: SparkSession, scaledDir: String,
      outDir: String): Long = {
    Files.createDirectories(Paths.get(outDir))
    val emb = spark.read.parquet(s"$scaledDir/embeddings.parquet")
    val n = emb.count()
    val k = math.max(1L, n / 100 / 1000)
    val target = s"$outDir/embeddings.parquet"
    val exists = markerOk(outDir, "emb-clustered", k) && {
      try spark.read.parquet(target).count() == n
      catch { case _: Throwable => false }
    }
    if (!exists) {
      val centers = emb.filter(col("vec_id") >= 0 && col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("center"))
      emb
        .withColumn("cid",
          when(pmod(col("vec_id"), lit(100)) === 17,
            pmod(floor(col("vec_id") / 100), lit(k)).cast("long"))
            .otherwise(lit(-1L)))
        .join(broadcast(centers), Seq("cid"), "left")
        .withColumn("embedding",
          when(col("cid") >= 0, expr(
            """cast(transform(center, (x, d) ->
                 x * cast(1.0 + 0.001 * pmod(vec_id + d, 7) as float))
               as array<float>)"""))
            .otherwise(col("embedding")))
        .drop("cid", "center")
        .repartition(8)
        .write.mode("overwrite").parquet(target)
      writeMarker(outDir, "emb-clustered", k)
    }
    k
  }

  /** Dense-cluster canary for the TEXT detectors (round-9 verdict item
    * 4 — the embedding canary's sibling): ~1% of the scaled docs are
    * replaced by members of k 1000-member near-identical clusters, each
    * member its cluster center's text plus three member-unique tail
    * tokens (pairwise trigram Jaccard ≈ 0.9, far above both detectors'
    * 0.2 threshold). The axes being measured: MinHash band meetings are
    * quadratic in CLUSTER size (all members land in one bucket per
    * band) — the gate must collapse the ×bands multiplicity to one
    * verify per pair; the n-gram df cap (every cluster-shared gram's df
    * ≈ 1000 ≫ 64) must go measurably BLIND to the cluster (postings
    * dropped), the recall trade the cap deliberately makes. Only
    * documents is written; doc count and ids are unchanged. */
  def buildTextClustered(spark: SparkSession, scaledDir: String,
      outDir: String): Long = {
    Files.createDirectories(Paths.get(outDir))
    val docs = spark.read.parquet(s"$scaledDir/documents.parquet")
    val n = docs.count()
    val k = math.max(1L, n / 100 / 1000)
    val target = s"$outDir/documents.parquet"
    val exists = markerOk(outDir, "text-clustered", k) && {
      try spark.read.parquet(target).count() == n
      catch { case _: Throwable => false }
    }
    if (!exists) {
      val centers = docs.filter(col("doc_id") >= 0 && col("doc_id") < k)
        .select(col("doc_id").as("cid"), col("text").as("center"))
      docs
        .withColumn("cid",
          when(pmod(col("doc_id"), lit(100)) === 17,
            pmod(floor(col("doc_id") / 100), lit(k)).cast("long"))
            .otherwise(lit(-1L)))
        .join(broadcast(centers), Seq("cid"), "left")
        .withColumn("text",
          when(col("cid") >= 0,
            concat(col("center"), lit(" mv"), col("doc_id"), lit("a mv"),
              col("doc_id"), lit("b mv"), col("doc_id"), lit("c")))
            .otherwise(col("text")))
        .withColumn("n_chars", length(col("text")))
        .drop("cid", "center")
        .repartition(32)
        .write.mode("overwrite").parquet(target)
      writeMarker(outDir, "text-clustered", k)
    }
    k
  }

  /** Zipf-skew canary corpus (round-10 verdict item 5): the salted
    * relational ops were only ever validated on sf0.1's near-uniform
    * key distributions, so their salting constants (S=16) had no
    * empirical skew case. This variant rewrites the SCALED events and
    * lineitem so the exact keys those queries shuffle on follow
    * Zipf(s=1.1) over the key's existing domain: each row draws a
    * uniform u from a deterministic xxhash64 of its unique id and maps
    * it through the Zipf CDF over the K distinct key values (K=5 event
    * types → hottest ≈46% of rows; K=3 return flags → hottest ≈57%).
    * Row counts, ids and all other columns are unchanged. */
  def buildZipf(spark: SparkSession, scaledDir: String,
      outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    def zipfAssign(df: DataFrame, table: String, key: String, u: Column,
        parts: Int): Unit = {
      val n = df.count()
      val target = s"$outDir/$table.parquet"
      if (!(markerOk(outDir, s"zipf-$key", n) && {
        try spark.read.parquet(target).count() == n
        catch { case _: Throwable => false }
      })) {
        val values = df.select(key).distinct().collect()
          .map(_.getString(0)).sorted.toSeq
        val h = values.indices.map(k => math.pow(k + 1.0, -1.1)).sum
        val cum = values.indices
          .map(k => math.pow(k + 1.0, -1.1) / h).scanLeft(0.0)(_ + _)
        // CASE over the K cumulative breakpoints (K ≤ 5): rank r wins
        // when cum(r) <= u < cum(r+1)
        val assigned = values.zipWithIndex.tail.foldLeft(
          when(u < cum(1), values.head)) { case (acc, (v, r)) =>
            acc.when(u < cum(r + 1), v)
        }.otherwise(values.last)
        df.withColumn(key, assigned)
          .repartition(parts)
          .write.mode("overwrite").parquet(target)
        writeMarker(outDir, s"zipf-$key", n)
      }
    }
    zipfAssign(spark.read.parquet(s"$scaledDir/events.parquet"),
      "events", "event_type",
      pmod(xxhash64(col("event_id")), lit(1000000L)) / 1e6,
      parts = 32)
    zipfAssign(spark.read.parquet(s"$scaledDir/lineitem.parquet"),
      "lineitem", "l_returnflag",
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
        lit(1000000L)) / 1e6,
      parts = 64)
  }

  /** The stressed families: every candidate-generating dedup/sim/text
    * query whose input is the documents or embeddings table. */
  val Stressed: Seq[String] = Seq(
    "dedup_exact", "dedup_exact_hash", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
    "dedup_semantic_cells",
    "dedup_cluster_keepers", "dedup_winnowing_join",
    "dedup_incremental_corpus",
    "sim_ann_hyperplane", "sim_ann_multiprobe", "sim_ivf_probe",
    "sim_pq_adc", "sim_bruteforce_topk",
    "text_winnowing_fingerprints", "text_heavy_hitters",
    "text_bpe_encode", "curate_unigram_logprob", "curate_dsir_resample",
    "curate_ccnet_ppl_buckets",
    // round-11 late additions: α-temperature resampling (two corpus
    // passes + broadcast rate table), dictionary topic tagging
    // (explode + broadcast join + doc-keyed argmax agg), per-doc token
    // entropy (explode + two doc-keyed hash aggs) — all three are
    // corpus-explode or scan shapes whose cost must stay linear in N
    "curate_temperature_mixture", "curate_taxonomy_tags",
    "text_token_entropy", "retrieval_ndcg_eval",
    "retrieval_rank_correlation",
    // Gopher rule battery (one explode + one doc-keyed agg) and
    // SoftDedup reweighting (fingerprint census join + shingle-df
    // per-doc stats — per-doc statistics, never a pair join)
    "curate_gopher_rules", "curate_softdedup_weights",
    // retrieval/ranking tier (round-10 verdict item 3 — the last
    // LLM-pipeline family arguing from plan shape only): tf-idf + BM25
    // scoring over the scaled docs and the RRF fusion of both rankers
    "text_tfidf_top_terms", "text_bm25_retrieval",
    "retrieval_hybrid_rrf",
    // round-12: incremental DSIR — the per-checkpoint corpus-scoring
    // replication (constant 3×) and the state-merge joins must stay
    // linear in N like the batch resampler
    "curate_dsir_incremental",
    // round-12: ingest-time minhash verdicts — the LSH pair set plus
    // two id-keyed arr joins and a doc-keyed min_by hash agg; must
    // track dedup_minhash_lsh's ratio (the joins it adds are linear)
    "dedup_minhash_incremental",
    // round-13: ingest-time IVF verdicts (the within-cell pair set
    // directed by arrival key — must track dedup_semantic_cells) and
    // the SemDeDup production composition (cell × LSH-bucket join —
    // its candidate stream is bounded by BOTH partitions, so the row
    // measures what the second stage buys at dense-cell scale)
    "sim_ivf_incremental", "dedup_semantic_two_stage",
    // round-14: perceptual-hash media near-dup — a 4-band 16-bit-slice
    // equi-join whose bucket occupancy is ~4N/65536 on balanced
    // fingerprints; the ratio must stay near-linear in N
    "multimodal_phash_near_dup",
    // round-15: the media tier's ingest-time verdicts (pair set +
    // id-keyed arr joins + doc-keyed min_by — must track the near_dup
    // row like the minhash pair) and the N-adaptive hyperplane ANN
    // (bits/tables grow with N to hold per-query candidates ~constant
    // — the row must be strongly sub-linear vs the fixed-bucket
    // sim_ann_hyperplane baseline above)
    "multimodal_phash_incremental", "sim_ann_adaptive",
    // round-16: the media and text tiers' incremental keepers —
    // verdict-forest root resolution (pointer doubling over (m, p)
    // rows only); each must track its verdict query's ratio plus
    // O(log depth) loop rounds
    "multimodal_phash_keepers_incremental",
    "dedup_minhash_keepers_incremental")

  /** The shuffle-dominant join/window/time-series/graph/ML/streaming/agg
    * queries (round-9 mandate — these families previously had only
    * plan-shape arguments above sf0.1). Inputs come from the scaled
    * events/lineitem/orders. */
  val StressedHeavy: Seq[String] = Seq(
    "join_asof_event_quotes", "ts_zscore_outliers",
    "window_sessionize_by_gap", "graph_pagerank_3iter",
    "graph_triangle_count", "ml_forest_bagged", "ml_pca_power_iter",
    "stream_join_left_outer", "agg_salted_two_phase",
    // snapshot/storage family (round-10 mandate — the one family that
    // previously argued from plan shape only above sf0.1): manifest
    // commit + bucket rewrite, changelog latest-wins, SCD2 interval
    // build, and the 64-file compaction rewrite, all over the scaled
    // orders/events
    "snapshot_merge_into", "cdc_apply_changelog",
    "scd2_dimension_build", "compact_small_files",
    // round-11 analytics/quality additions over the scaled
    // events/orders: last-touch attribution (two IGNORE NULLS carries
    // over one user partitioning) and MAD outliers (two grouped exact
    // medians over per-customer aggregates)
    "analytics_attribution_last_touch", "quality_mad_outliers",
    // round-16 additions: URL canonicalization dedup (per-row expression
    // pipeline + one hash agg keyed on the canonical string — dup mass
    // scales with the corpus, group count with DISTINCT pages) and the
    // Benford leading-digit audit (single-column scan, 9-key agg)
    "curate_url_canonicalize", "quality_benford")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val outJson = args.lift(2).getOrElse("/root/repo/BENCH_scale10.json")
    val scaledDir = s"${Tables.scratchRoot}/scale$copies"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // spill counters (constrained-heap smoke mandate: a memory-bounded
    // run must show WHERE pressure lands, not just survive) — same
    // cheap task-end listener Bench.scala uses; re-registered on every
    // session rebuild since listeners die with their context
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    def mkSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.extensions", classOf[GraftExtensions].getName)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) {
              spillMem.addAndGet(m.memoryBytesSpilled)
              spillDisk.addAndGet(m.diskBytesSpilled)
            }
          }
        })
      s
    }
    var spark = mkSession()
    // one query's executor OOM can take the whole SparkContext down in
    // local mode (observed: graph_triangle_count at 100× killed the
    // remaining 6 families with "stopped SparkContext") — rebuild
    // between queries so each family's verdict is its own.
    // The rebuild must WAIT for the dying context to finish stopping:
    // SparkContext.stop() flips isStopped at entry but clears the
    // process-wide activeContext only at exit, so a getOrCreate issued
    // mid-stop hands back the same dying context wrapped in a fresh
    // SparkSession and every later query reads "Cannot call methods on
    // a stopped SparkContext" (observed: the 8 GB smoke's winnowing OOM
    // cascaded into the two graph rows exactly this way).
    def ensureAlive(): Unit = if (spark.sparkContext.isStopped) {
      println("[scale] SparkContext died — rebuilding session")
      val deadline = System.nanoTime() + 300L * 1000000000L
      var rebuilt = false
      while (!rebuilt && System.nanoTime() < deadline) {
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        spark = mkSession()
        rebuilt = !spark.sparkContext.isStopped
        if (!rebuilt) Thread.sleep(2000)
      }
      if (!rebuilt) sys.error("SparkContext rebuild failed for 5 minutes")
    }
    // Production partitioning model: a copies× corpus on a real cluster
    // runs with ~copies× the shuffle tasks (partition count follows
    // data, per-task memory stays constant — the harness's fixed 32
    // instead grew per-task state linearly and OOM'd the graph family
    // at 100×). AQE's initialPartitionNum scales the starting width for
    // the scaled dir and coalesces small stages back down, so base-dir
    // timings keep their exact round-8 config.
    // cap 256: partitions must track DATA, not copies×cpus unboundedly —
    // an uncapped 100×32=1024 initial width made every map task write
    // 1024 tiny blocks for a ~2 GB corpus and tripled the shuffle-heavy
    // ngram join (178 s vs 58 s at 32); 256 keeps per-task state small
    // (≈8 MB compressed input each) without drowning in block overhead
    val scaledParts = math.min(256, cpus.toInt * copies)
    def partitionsFor(dir: String): Unit =
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        if (dir == baseDir) cpus.toInt else scaledParts)

    println(s"[scale] building ${copies}x corpus under $scaledDir")
    buildScaled(spark, baseDir, scaledDir, copies)

    def loadavg(): Seq[Double] =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }
    // the corpus build above loads the box, and BASELINE.md's
    // adjudication protocol makes timings non-comparable when
    // load_before is near nproc — which is exactly how the round-8
    // artifacts ended up non-adjudicable (their own build load was
    // still decaying). Let the 1-min loadavg settle before the timed
    // section, bounded at 5 minutes.
    val settleDeadline = System.nanoTime() + 300L * 1000000000L
    while (loadavg().head > 4.0 && System.nanoTime() < settleDeadline) {
      println(f"[scale] waiting for box to settle (load=${loadavg().head}%.1f)")
      Thread.sleep(15000)
    }
    val loadBefore = loadavg()

    // variance-aware sampling (round-10 verdict item 4): min-of-2 was
    // too few for rows whose same-code spread reaches ±50%
    // (dedup_embedding_cosine 57-150 s across six runs; a real 2× plan
    // regression there would be indistinguishable from noise). If the
    // first two samples disagree by >30%, take two more (min-of-≥4) so
    // the committed ratio carries its own error bar; every sample plus
    // the spread lands in the artifact either way.
    def timedSamples(name: String, dir: String)
        : (Double, Long, Seq[Double], Double) = {
      partitionsFor(dir)
      var rows = -1L
      val spill0 = spillMem.get() + spillDisk.get()
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        df.write.mode("overwrite").format("noop").save()
        rows = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        math.round(dt * 1000) / 1000.0
      }
      var times = Seq(once(), once())
      if (times.max / times.min > 1.3)
        times = times ++ Seq(once(), once())
      val spillMb = math.round(
        (spillMem.get() + spillDisk.get() - spill0) / 1e6 * 10) / 10.0
      (times.min, rows, times, spillMb)
    }
    def timed(name: String, dir: String): (Double, Long) = {
      val (t, r, _, _) = timedSamples(name, dir); (t, r)
    }
    // warmup: absorb codegen/reader first-touch on an untimed pass
    try { SparkEntry.queries("dedup_exact")(spark, baseDir)
      .write.mode("overwrite").format("noop").save() }
    catch { case _: Throwable => }

    // SPARK_GRAFT_STRESS_ONLY=a,b restricts the list (dev iteration on
    // one family without re-timing the whole suite)
    val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_STRESS_PROBES=off skips all wedge/canary probes;
    // =zipf runs ONLY the Zipf-skew canary (targeted re-measurement
    // after a salting change, without paying the emb/text canaries);
    // =semcell runs ONLY the semantic-cell recall/cost canary;
    // =twostage runs ONLY the two-stage composition regime canary
    val probeMode =
      sys.env.getOrElse("SPARK_GRAFT_STRESS_PROBES", "all")
    val probesOn = probeMode == "all"
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // deliberately-disabled probes are NOT errors: they land in a
    // separate `skipped` map so an artifact whose claim is "zero
    // errors" never carries RuntimeExceptions as its way of saying
    // "not measured" (round-11 verdict, missing #4)
    val skipped = scala.collection.mutable.LinkedHashMap[String, String]()
    case class ProbeSkipped(reason: String)
      extends RuntimeException(reason)
    val rowsOut = new StringBuilder
    var first = true
    for (name <- (Stressed ++ StressedHeavy)
        if only.forall(_.contains(name))) {
      val entry =
        try {
          ensureAlive()
          val (t1, r1, s1, sp1) = timedSamples(name, baseDir)
          val (tN, rN, sN, spN) = timedSamples(name, scaledDir)
          val ratio = math.round(tN / t1 * 100) / 100.0
          val spread = math.round((sN.max - sN.min) / sN.min * 100) / 100.0
          // warm spread: the first sample pays the query's own codegen +
          // first-touch (the shared warmup only warms dedup_exact), so
          // the all-samples spread conflates a constant JIT cost with
          // run-to-run noise. Spread over samples 2..n is the
          // noise-only error bar the ≤0.3 variance target grades
          // (round-11 verdict task 1; SCALE.md round-12).
          val warm = if (sN.size > 1) sN.tail else sN
          val spreadWarm =
            math.round((warm.max - warm.min) / warm.min * 100) / 100.0
          println(f"[scale] $name%-28s base=$t1%7.3fs ${copies}x=$tN%7.3fs " +
            f"ratio=$ratio%6.2f spread=$spread%5.2f  " +
            f"rows $r1%8d -> $rN%9d  spill ${sp1}%.1f/${spN}%.1f MB")
          s""""$name":{"t_base":$t1,"t_scaled":$tN,"ratio":$ratio,""" +
            s""""rows_base":$r1,"rows_scaled":$rN,""" +
            s""""samples_base":[${s1.mkString(",")}],""" +
            s""""samples_scaled":[${sN.mkString(",")}],""" +
            s""""spread_scaled":$spread,"spread_warm":$spreadWarm,""" +
            s""""spill_mb_base":$sp1,"spill_mb_scaled":$spN}"""
        } catch { case e: Throwable =>
          errors(name) = e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] $name ERROR ${errors(name)}")
          s""""$name":{"error":true}"""
        }
      rowsOut.append(if (first) entry else "," + entry); first = false
    }
    // dense-cluster canary (round-8 verdict item 5): candidate
    // occurrences — bucket-join rows BEFORE the cosine filter — for the
    // plain scaled corpus vs the clustered one, plus the clustered
    // query end-to-end. The bound being documented: occurrences ≈
    // (linear background) + (Σ per-cluster C(m,2)) × tables — quadratic
    // in CLUSTER size by the nature of the output, but never amplified
    // into a pair shuffle because the verify rides inside the join.
    val candJson =
      try {
        if (!probesOn) throw ProbeSkipped("probes off")
        ensureAlive()
        val clusteredDir = s"$scaledDir-clustered"
        val k = buildClustered(spark, scaledDir, clusteredDir)
        def occ(d: String): Long = {
          partitionsFor(d)
          val c = graft.operators.Dedup.embCandidateOccurrences(spark, d)
          spark.catalog.clearCache(); c
        }
        val (occBase, occScaled, occClu) =
          (occ(baseDir), occ(scaledDir), occ(clusteredDir))
        val (tClu, rClu) = timed("dedup_embedding_cosine", clusteredDir)
        println(s"[scale] emb candidates: base=$occBase scaled=$occScaled " +
          s"clustered=$occClu (k=$k); clustered query ${tClu}s, $rClu pairs")
        s""","emb_candidates":{"base":$occBase,"scaled":$occScaled,""" +
          s""""clustered":$occClu,"clusters":$k,""" +
          s""""clustered_query_sec":$tClu,"clustered_pairs":$rClu}"""
      } catch {
        case ProbeSkipped(r) =>
          skipped("emb_candidates") = r
          println(s"[scale] emb_candidates skipped: $r")
          ""
        case e: Throwable =>
          errors("emb_candidates") = e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] emb_candidates ERROR ${errors("emb_candidates")}")
          ""
      }
    // semantic-cell recall/cost canary (round-11 verdict, next-round
    // #4): on the SAME planted-cluster embedding corpus the LSH canary
    // uses, pin the cell detector's pair recall against the LSH
    // detector's pair set (ground truth — it equals the exact >=0.95
    // pair set by its miss-bound design) and sweep the cell count k:
    // k is the knob that trades within-cell quadratic cost against
    // cross-cell blindness, so the artifact records the whole curve
    // (pairs found, matched, wall-clock) at k/2, k, 2k around the
    // N-adaptive operating point. The LSH pair set is dumped to
    // parquet once so each k-step joins against a scan, not a
    // recomputation, and clearCache between steps keeps the
    // vector-carrying persists from stacking.
    val semCellJson =
      try {
        if (probeMode != "all" && probeMode != "semcell")
          throw ProbeSkipped("probes off")
        ensureAlive()
        val clusteredDir = s"$scaledDir-clustered"
        buildClustered(spark, scaledDir, clusteredDir)
        partitionsFor(clusteredDir)
        val lshPath = s"$clusteredDir-lshpairs.parquet"
        SparkEntry.queries("dedup_embedding_cosine")(spark, clusteredDir)
          .select("id_a", "id_b")
          .write.mode("overwrite").parquet(lshPath)
        spark.catalog.clearCache()
        val lsh = spark.read.parquet(lshPath)
        val nLsh = lsh.count()
        val kAdapt = operators.Dedup.semCellCount(
          Tables.footerRowCount(spark,
            s"$clusteredDir/embeddings.parquet") * 6 / 5)
        val cellRows = for (k <- Seq(kAdapt / 2, kAdapt, kAdapt * 2)) yield {
          val t0 = System.nanoTime()
          val sem = operators.Dedup.semCellPairs(spark, clusteredDir, k)
            .select("id_a", "id_b")
          val nSem = sem.count()
          val sec = math.round((System.nanoTime() - t0) / 1e9 * 1000) / 1000.0
          val matched = sem.join(lsh, Seq("id_a", "id_b")).count()
          spark.catalog.clearCache()
          println(f"[scale] semcell canary k=$k pairs=$nSem " +
            f"matched=$matched/$nLsh " +
            f"recall=${matched.toDouble / nLsh}%.3f ${sec}s")
          s"""{"k":$k,"pairs":$nSem,"matched":$matched,"sec":$sec}"""
        }
        s""","semcell_canary":{"lsh_pairs":$nLsh,""" +
          s""""k_adaptive":$kAdapt,"cells":[${cellRows.mkString(",")}]}"""
      } catch {
        case ProbeSkipped(r) =>
          skipped("semcell_canary") = r
          println(s"[scale] semcell_canary skipped: $r")
          ""
        case e: Throwable =>
          errors("semcell_canary") = e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] semcell_canary ERROR ${errors("semcell_canary")}")
          ""
      }
    // two-stage composition canary (round-13 — the regime boundary,
    // measured on both sides): dedup_semantic_two_stage costs ~3× cells
    // alone at the ADAPTIVE k (occupancy ≈150: the N×tables bucket
    // frame dominates while the within-cell quadratic it removes is
    // small), so where does the second stage PAY? In heterogeneous
    // dense cells — a quantizer too coarse for its corpus. Sweep k at
    // the adaptive point and at k/16 (occupancy ≈2400) on the PLAIN
    // scaled corpus, timing cells-only vs two-stage: cells-only pays
    // Σ occ²/2 cosine meetings, the within-cell LSH caps meetings at
    // bucket granularity. Pair COUNTS must stay equal at every k — the
    // lossless-candidate-stage claim, verified here off the pinned
    // dirs too (per-pair miss ≤1e-6 is k- and N-independent).
    val twoStageJson =
      try {
        if (probeMode != "all" && probeMode != "twostage")
          throw ProbeSkipped("probes off")
        ensureAlive()
        partitionsFor(scaledDir)
        val kAdapt = operators.Dedup.semCellCount(
          Tables.footerRowCount(spark,
            s"$scaledDir/embeddings.parquet") * 6 / 5)
        val rows = for (k <- Seq(kAdapt, math.max(1L, kAdapt / 16))) yield {
          def run(body: (SparkSession, String, Long) =>
              org.apache.spark.sql.DataFrame): (Double, Long) = {
            ensureAlive()
            val t0 = System.nanoTime()
            val n = body(spark, scaledDir, k).count()
            val sec = math.round((System.nanoTime() - t0) / 1e9 * 1000) / 1000.0
            spark.catalog.clearCache()
            (sec, n)
          }
          val (tCells, nCells) = run(operators.Dedup.semCellPairs)
          // gated = the registered query (occupancy gate at its default);
          // ungated = gate 0 (every cell LSH-buckets — round 13's
          // unconditional composition, kept measured so the gate's win
          // stays a number, not a memory)
          val (tTwo, nTwo) =
            run((a, b, c) => operators.Dedup.semCellTwoStagePairs(a, b, c))
          val (tUngated, nUngated) =
            run((a, b, c) =>
              operators.Dedup.semCellTwoStagePairs(a, b, c, gate = 0L))
          println(f"[scale] twostage canary k=$k occ=${6L * Tables
            .footerRowCount(spark, s"$scaledDir/embeddings.parquet") / 5 / k} " +
            f"cells=${tCells}s/$nCells pairs " +
            f"gated=${tTwo}s/$nTwo ungated=${tUngated}s/$nUngated")
          s"""{"k":$k,"cells_sec":$tCells,"cells_pairs":$nCells,""" +
            s""""twostage_sec":$tTwo,"twostage_pairs":$nTwo,""" +
            s""""twostage_ungated_sec":$tUngated,""" +
            s""""twostage_ungated_pairs":$nUngated}"""
        }
        s""","twostage_canary":{"k_adaptive":$kAdapt,""" +
          s""""rows":[${rows.mkString(",")}]}"""
      } catch {
        case ProbeSkipped(r) =>
          skipped("twostage_canary") = r
          println(s"[scale] twostage_canary skipped: $r")
          ""
        case e: Throwable =>
          errors("twostage_canary") =
            e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] twostage_canary ERROR ${errors("twostage_canary")}")
          ""
      }
    // bimodal two-stage canary (round-14 verdict task 6): the 10× gate
    // sweep was the only run where BOTH branches were live — at 100×
    // every swept quantizer was all-direct or all-LSH, so the per-cell
    // routing's mixed regime had no at-scale measurement. Build a
    // corpus with a bimodal cell distribution: ids ≥ k (so the natural
    // codebook is untouched) with id % 4 == 0 are collapsed onto the
    // first 8 centroid directions with CONTINUOUS per-dim jitter
    // (factors 1 + u·0.75, u ≈ uniform[-1,1] from a per-(id,dim) hash):
    // members stay nearest their template centroid (cos ≈ 0.92 vs
    // ~0.5 elsewhere) but sit robustly BELOW the 0.95 verify against
    // each other (mutual cos ≈ 0.85) — heavy dense-cell JOIN work,
    // output linear (the planted canaries are the verified pairs).
    // Continuous jitter matters: a first cut used 13 residue-class
    // factor patterns and the structured family resonated with the
    // deterministic hyperplanes — 64k of 44.6M near-threshold pairs
    // missed the LSH envelope (pair sets diverged). Cells 0-7 then
    // carry thousands of vectors each (dense at the 512 gate) while
    // the rest keep ~N/(2k) ≈ 75 (sparse): one run, both branches
    // live. Verdicts: pair sets identical at gate=default/0/∞, and
    // the gated wall-time must land at or below the pure regimes.
    val bimodalJson =
      try {
        if (probeMode != "all" && probeMode != "bimodal")
          throw ProbeSkipped("probes off")
        ensureAlive()
        partitionsFor(scaledDir)
        val bdir = s"${Tables.scratchRoot}/bimodal$copies"
        val src = spark.read.parquet(s"$scaledDir/embeddings.parquet")
        val nSrc = src.count()
        val k = operators.Dedup.semCellCount(nSrc * 6 / 5)
        val cents = src.filter(col("vec_id") < 8)
          .select(pmod(col("vec_id"), lit(8L)).as("cid"),
            col("embedding").cast("array<double>").as("cvec"))
        src
          .withColumn("cid",
            when(col("vec_id") >= k && pmod(col("vec_id"), lit(4L)) === 0,
              pmod(floor(col("vec_id") / 4), lit(8L)).cast("long"))
              .otherwise(lit(-1L)))
          .join(broadcast(cents), Seq("cid"), "left")
          .select(col("vec_id"), col("label"),
            when(col("cid") < 0, col("embedding")).otherwise(
              // the jitter hash MUST mix id and dim multiplicatively
              // (the buildScaled sign-flip lesson): an additive
              // vec_id·A + d·B form makes every member's factor
              // sequence a shifted copy of one mod-p ramp — pairs then
              // sit at cosine ≈ 1 and the dense cells turn
              // output-quadratic (measured: 26M pairs where the
              // design predicts ~10⁴)
              expr("""cast(transform(cvec, (x, d) ->
                        x * (1.0 + (pmod(pmod((vec_id + 13) * (2 * d + 1),
                                              1000003) * 2654435761,
                                         1000003) / 1000003.0 - 0.5) * 1.5))
                      as array<float>)""")).as("embedding"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$bdir/embeddings.parquet")
        val gate = operators.Dedup.TwoStageOccupancyGate
        val occs = operators.Dedup.semCellAssign(spark,
          operators.Dedup.embPlantedCorpus(spark, bdir),
          operators.Dedup.semCellCodebook(spark, bdir, k))
          .groupBy("cell").agg(count(lit(1)).as("occ")).persist()
        val denseCells = occs.filter(col("occ") > gate).count()
        val sparseCells = occs.filter(col("occ") <= gate).count()
        val occMax = occs.agg(max("occ")).head.getLong(0)
        occs.unpersist()
        spark.catalog.clearCache()
        require(denseCells > 0 && sparseCells > 0,
          s"bimodal corpus is not bimodal at gate $gate: " +
            s"$denseCells dense / $sparseCells sparse")
        def run(g: Long): (Double, Long) = {
          ensureAlive()
          val t0 = System.nanoTime()
          val n = operators.Dedup.semCellTwoStagePairs(spark, bdir, k,
            gate = g).count()
          val sec =
            math.round((System.nanoTime() - t0) / 1e9 * 1000) / 1000.0
          spark.catalog.clearCache()
          (sec, n)
        }
        val (tGated, nGated) = run(gate)
        val (tAllLsh, nAllLsh) = run(0L)
        val (tAllDirect, nAllDirect) = run(Long.MaxValue)
        require(nGated == nAllLsh && nGated == nAllDirect,
          s"bimodal pair sets diverge across gates: " +
            s"$nGated/$nAllLsh/$nAllDirect")
        println(f"[scale] bimodal canary k=$k dense=$denseCells " +
          f"sparse=$sparseCells occMax=$occMax " +
          f"gated=${tGated}s allLsh=${tAllLsh}s allDirect=${tAllDirect}s " +
          f"pairs=$nGated")
        s""","bimodal_canary":{"k":$k,"gate":$gate,""" +
          s""""dense_cells":$denseCells,"sparse_cells":$sparseCells,""" +
          s""""occ_max":$occMax,"pairs":$nGated,""" +
          s""""gated_sec":$tGated,"all_lsh_sec":$tAllLsh,""" +
          s""""all_direct_sec":$tAllDirect}"""
      } catch {
        case ProbeSkipped(r) =>
          skipped("bimodal_canary") = r
          println(s"[scale] bimodal_canary skipped: $r")
          ""
        case e: Throwable =>
          errors("bimodal_canary") =
            e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] bimodal_canary ERROR ${errors("bimodal_canary")}")
          ""
      }
    // pHash gate canary (round-15, the sub-banding scale demo): sweep
    // gate ∈ {default = mixed routing, 0 = all sub-banded, ∞ = all
    // direct (the pre-r15 plan, copies ≤ 10 only)} on the natural
    // scaled corpus; pair sets must be identical, and the artifact
    // records the occupancy the routing actually faces.
    val phashGateJson =
      try {
        if (probeMode != "all" && probeMode != "phashgate")
          throw ProbeSkipped("probes off")
        ensureAlive()
        partitionsFor(scaledDir)
        // the NATURAL scaled corpus already carries the dense regime:
        // the sf0.1 documents hold near-identical fingerprint families
        // whose largest (si, sv) bucket reaches occupancy 5617 at 10×
        // — far past the gate — next to a ~38k-bucket sparse tail, so
        // one sweep measures mixed routing, not a synthetic corpus (a
        // first-cut collapsed-template corpus produced near-identical
        // fingerprints ACROSS families — quadratic output, probe
        // unusable). gate=∞ is the pre-r15 single-join plan; its arm
        // is quadratic in the densest bucket, so it only runs at
        // copies ≤ 10 (at 100× it would be the hours-long degenerate
        // the gate exists to remove — the 10× run pins the pair-set
        // equality that makes the two plans interchangeable).
        val gate = operators.Multimodal.PhashBandOccupancyGate
        val bOccs = operators.Multimodal
          .phashRoutedBandFrame(spark, scaledDir)
          .select("si", "sv", "occ").distinct().persist()
        val denseB = bOccs.filter(col("occ") > gate).count()
        val sparseB = bOccs.filter(col("occ") <= gate).count()
        val occMax = bOccs.agg(max("occ")).head.getLong(0)
        bOccs.unpersist()
        spark.catalog.clearCache()
        require(denseB > 0 && sparseB > 0,
          s"scaled corpus not mixed at gate $gate: " +
            s"$denseB dense / $sparseB sparse buckets")
        def run(g: Long): (Double, Long) = {
          ensureAlive()
          val t0 = System.nanoTime()
          val n = operators.Multimodal.phashNearDupPairs(spark, scaledDir,
            gate = g).count()
          val sec =
            math.round((System.nanoTime() - t0) / 1e9 * 1000) / 1000.0
          spark.catalog.clearCache()
          (sec, n)
        }
        val (tGated, nGated) = run(gate)
        val (tAllSub, nAllSub) = run(0L)
        require(nGated == nAllSub,
          s"pHash pair sets diverge: gated $nGated != all-sub $nAllSub")
        val directJson =
          if (copies <= 10) {
            val (tAllDirect, nAllDirect) = run(Long.MaxValue)
            require(nGated == nAllDirect,
              s"pHash pair sets diverge: gated $nGated != " +
                s"all-direct $nAllDirect")
            s""","all_direct_sec":$tAllDirect"""
          } else ""
        println(f"[scale] phash gate canary dense=$denseB " +
          f"sparse=$sparseB occMax=$occMax " +
          f"gated=${tGated}s allSub=${tAllSub}s$directJson pairs=$nGated")
        s""","phash_gate_canary":{"gate":$gate,""" +
          s""""dense_buckets":$denseB,"sparse_buckets":$sparseB,""" +
          s""""occ_max":$occMax,"pairs":$nGated,""" +
          s""""gated_sec":$tGated,"all_sub_sec":$tAllSub$directJson}"""
      } catch {
        case ProbeSkipped(r) =>
          skipped("phash_gate_canary") = r
          println(s"[scale] phash_gate_canary skipped: $r")
          ""
        case e: Throwable =>
          errors("phash_gate_canary") =
            e.toString.takeWhile(_ != '\n').take(200)
          println(
            s"[scale] phash_gate_canary ERROR ${errors("phash_gate_canary")}")
          ""
      }
    // triangle wedge probe (round-9 verdict item 3): measure the wedge
    // and closed-wedge counts behind graph_triangle_count's scale ratio,
    // so "growth is join width bounded by degree orientation" is a
    // number in the artifact, not prose. Expected shape: edges grow
    // ~copies× (per-copy disjoint subgraphs), wedges ~copies× too
    // (degree distribution per copy unchanged), and ratio_time ≈
    // wedges_scaled/wedges_base within constant factors.
    val wedgeJson =
      try {
        if (!probesOn) throw ProbeSkipped("probes off")
        ensureAlive()
        partitionsFor(baseDir)
        val (wb, cb) = operators.Analytics.triangleWedgeStats(spark, baseDir)
        partitionsFor(scaledDir)
        val (ws, cs) = operators.Analytics.triangleWedgeStats(spark, scaledDir)
        println(s"[scale] triangle wedges: base=$wb closed=$cb " +
          s"scaled=$ws closed=$cs")
        s""","triangle_wedges":{"wedges_base":$wb,"closed_base":$cb,""" +
          s""""wedges_scaled":$ws,"closed_scaled":$cs}"""
      } catch {
        case ProbeSkipped(r) =>
          skipped("triangle_wedges") = r
          println(s"[scale] triangle_wedges skipped: $r")
          ""
        case e: Throwable =>
          errors("triangle_wedges") = e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] triangle_wedges ERROR ${errors("triangle_wedges")}")
          ""
      }
    // text-detector dense-cluster canary (round-9 verdict item 4): band
    // meetings raw vs first-band-gated for MinHash, posting meetings for
    // the df-capped n-gram join, on the plain scaled corpus vs the
    // clustered one; plus both clustered queries end-to-end. The claims
    // under measurement: gated/pairs ≈ 1 (one verify per true pair even
    // when every member of a 1000-doc cluster shares every band), and
    // ngram meetings clustered ≈ ngram meetings scaled (the cap DROPS
    // cluster-saturated grams — detector blind to the cluster, linear
    // cost held).
    val textCanaryJson =
      try {
        if (!probesOn) throw ProbeSkipped("probes off")
        ensureAlive()
        val tcDir = s"$scaledDir-textclustered"
        val k = buildTextClustered(spark, scaledDir, tcDir)
        def mh(d: String, gated: Boolean): Long = {
          partitionsFor(if (d == baseDir) baseDir else scaledDir)
          val c = operators.Dedup.minhashMeetings(spark, d, gated = gated)
          spark.catalog.clearCache(); c
        }
        def ng(d: String): Long = {
          partitionsFor(if (d == baseDir) baseDir else scaledDir)
          val c = operators.Dedup.ngramMeetings(spark, d)
          spark.catalog.clearCache(); c
        }
        val mScaled = mh(scaledDir, gated = false)
        val mClu = mh(tcDir, gated = false)
        val mCluGated = mh(tcDir, gated = true)
        val ngScaled = ng(scaledDir)
        val ngClu = ng(tcDir)
        val (tMh, pairsMh) = timed("dedup_minhash_lsh", tcDir)
        val (tNg, pairsNg) = timed("dedup_ngram_jaccard", tcDir)
        println(s"[scale] text canary (k=$k): minhash meetings " +
          s"scaled=$mScaled clustered=$mClu gated=$mCluGated " +
          s"pairs=$pairsMh (${tMh}s); ngram meetings scaled=$ngScaled " +
          s"clustered=$ngClu pairs=$pairsNg (${tNg}s)")
        s""","text_canary":{"clusters":$k,""" +
          s""""minhash_meetings_scaled":$mScaled,""" +
          s""""minhash_meetings_clustered":$mClu,""" +
          s""""minhash_meetings_clustered_gated":$mCluGated,""" +
          s""""minhash_clustered_pairs":$pairsMh,""" +
          s""""minhash_clustered_sec":$tMh,""" +
          s""""ngram_meetings_scaled":$ngScaled,""" +
          s""""ngram_meetings_clustered":$ngClu,""" +
          s""""ngram_clustered_pairs":$pairsNg,""" +
          s""""ngram_clustered_sec":$tNg}"""
      } catch {
        case ProbeSkipped(r) =>
          skipped("text_canary") = r
          println(s"[scale] text_canary skipped: $r")
          ""
        case e: Throwable =>
          errors("text_canary") = e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] text_canary ERROR ${errors("text_canary")}")
          ""
      }
    // Zipf-skew canary (round-10 verdict item 5): join_skew_salted_dim
    // and agg_salted_two_phase were only ever measured on near-uniform
    // keys. On the Zipf(1.1) corpus, record the per-task row
    // distribution their shuffles would see at P=cpus — keyed exactly
    // as each query keys its shuffle, pre-salt (raw key) vs post-salt
    // (key, salt), salt formula mirroring the query bodies — plus both
    // queries end-to-end. The claim under measurement: pre-salt the
    // hottest task carries the hottest key's full ~46%/57% row share,
    // post-salt the largest task lands within ~2× of the median
    // non-empty task.
    val zipfJson =
      try {
        if (probeMode != "all" && probeMode != "zipf")
          throw ProbeSkipped("probes off")
        ensureAlive()
        val zDir = s"$scaledDir-zipf"
        buildZipf(spark, scaledDir, zDir)
        val p = cpus.toInt
        def dist(df: DataFrame, keys: Seq[Column]): (Long, Long, Int) = {
          val counts = df
            .groupBy(pmod(hash(keys: _*), lit(p)).as("pt"))
            .agg(count(lit(1)).as("n"))
            .collect().map(_.getLong(1)).sorted
          (counts.last, counts(counts.length / 2), counts.length)
        }
        def side(table: String, key: String, saltOf: Column,
            query: String): String = {
          partitionsFor(zDir)
          val df = spark.read.parquet(s"$zDir/$table.parquet")
            .withColumn("__salt", saltOf)
          val total = df.count()
          val top = df.groupBy(key).count()
            .agg(max("count")).collect()(0).getLong(0)
          val (maxPre, medPre, nePre) = dist(df, Seq(col(key)))
          val (maxPost, medPost, nePost) =
            dist(df, Seq(col(key), col("__salt")))
          val (tQ, rQ) = timed(query, zDir)
          println(f"[scale] zipf $query: top_share=${top.toDouble / total}%.3f " +
            f"pre max/med=$maxPre/$medPre (ne=$nePre) " +
            f"post max/med=$maxPost/$medPost (ne=$nePost) " +
            f"query ${tQ}s $rQ rows")
          s""""$query":{"rows":$total,""" +
            s""""top_key_share":${math.round(top.toDouble / total * 1000) / 1000.0},""" +
            s""""task_max_pre":$maxPre,"task_median_pre":$medPre,""" +
            s""""tasks_nonempty_pre":$nePre,""" +
            s""""task_max_post":$maxPost,"task_median_post":$medPost,""" +
            s""""tasks_nonempty_post":$nePost,""" +
            s""""query_sec":$tQ,"query_rows":$rQ}"""
        }
        val joinSide = side("events", "event_type",
          pmod(hash(col("event_id")), lit(16)), "join_skew_salted_dim")
        // salt widths mirror the query bodies (join S=16, agg S=64 —
        // widened by this canary's own round-11 finding)
        val aggSide = side("lineitem", "l_returnflag",
          pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(64)),
          "agg_salted_two_phase")
        s""","zipf_canary":{"zipf_s":1.1,"tasks_p":$p,""" +
          s"""$joinSide,$aggSide}"""
      } catch {
        case ProbeSkipped(r) =>
          skipped("zipf_canary") = r
          println(s"[scale] zipf_canary skipped: $r")
          ""
        case e: Throwable =>
          errors("zipf_canary") = e.toString.takeWhile(_ != '\n').take(200)
          println(s"[scale] zipf_canary ERROR ${errors("zipf_canary")}")
          ""
      }
    val loadAfter = loadavg()
    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") +
        "\""
    }.mkString("{", ",", "}")
    val skipJson = skipped.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") +
        "\""
    }.mkString("{", ",", "}")
    val json =
      s"""{"base":"$baseDir","copies":$copies,""" +
      s""""queries":{${rowsOut.result()}},"errors":$errJson,""" +
      s""""skipped":$skipJson$candJson$semCellJson$twoStageJson""" +
      s"""$bimodalJson$phashGateJson""" +
      s"""$wedgeJson$textCanaryJson$zipfJson,""" +
      s""""load_before":${arr(loadBefore)},"load_after":${arr(loadAfter)},""" +
      s""""nproc":${Runtime.getRuntime.availableProcessors},""" +
      s""""heap_gb":${Runtime.getRuntime.maxMemory / (1L << 30)},""" +
      s""""scaled_partitions":$scaledParts}"""
    Files.writeString(Paths.get(outJson), json + "\n")
    println(s"[scale] wrote $outJson")
    spark.stop()
  }
}
