package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule, Tables}
import graft.Tables.LineageOps

/** Document deduplication for large-scale training-data pipelines: exact
  * (hash groupBy), exact-by-digest, n-gram Jaccard via an inverted-index
  * join, MinHash+LSH banding, and SimHash — all over the `documents` table.
  *
  * 100 TB stance: NO all-pairs/cartesian anywhere. Exact dedup is a single
  * shuffle on the group key; Jaccard candidates come from an equi-join on
  * shared shingles (inverted index); MinHash candidates from an equi-join
  * on (band, band-hash). DedupSpec asserts the physical plans contain no
  * CartesianProduct / BroadcastNestedLoopJoin.
  *
  * The generalized dedup intent in the reference is dropDuplicates() /
  * seen-ID skipping (realestate_pipeline.py:149, app/bronze.py:50-63).
  */
object Dedup extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Non-empty whitespace tokens — the native SpaceTokens expression
    * (round-17): one native pass, no per-element interpreted lambda, and
    * the subtree canonicalizes so twin pipelines share exchanges. */
  private def tokens(c: Column): Column = call_function("space_tokens", c)

  /** Distinct word-trigram shingles from a token array. Trigrams (not
    * bigrams): the standard shingle width for near-dup detection — and the
    * selectivity lever that keeps the inverted-index join sub-quadratic
    * when the vocabulary is small (bigram posting lists over a narrow
    * vocabulary collide on nearly every document pair).
    */
  /** Reference HOF spelling of trigram shingling — kept as the semantic
    * specification the native TrigramShingles expression is tested
    * against (DedupSpec). */
  private[graft] def shinglesReference(text: Column): Column =
    shingles(tokens(text))

  private def shingles(ts: Column): Column = {
    val n = greatest(size(ts) - 2, lit(0))
    array_distinct(zip_with(
      zip_with(slice(ts, lit(1), n), slice(ts, lit(2), n),
        (a, b) => concat(a, lit(" "), b)),
      slice(ts, lit(3), n),
      (ab, c) => concat(ab, lit(" "), c)))
  }

  /** doc_id + distinct trigram-shingle set (docs with ≥1 shingle).
    * Shingling runs through the native TrigramShingles expression (one
    * eval per row) — identical semantics to `shingles(tokens(text))`
    * (asserted in DedupSpec) but without per-element interpreted-lambda
    * dispatch, which dominated the Jaccard-family queries' runtime. */
  /** `requireNonEmpty = false` skips the size(sh) > 0 guard: consumers
    * that immediately explode(sh) drop empty arrays for free, and the
    * explicit filter is worse than useless there — Catalyst pushes it
    * into the scan as a predicate, re-evaluating the whole
    * trigram_shingles chain a second time per row (measured ~20% of the
    * jaccard scan stage). Keep the guard only where an empty array would
    * reach an aggregate (minhash signatures). */
  private def docShingles(s: SparkSession, dir: String,
      requireNonEmpty: Boolean = true): DataFrame =
    docShinglesOf(s, t(s, dir, "documents"), requireNonEmpty)

  /** Same shingling over an arbitrary (doc_id, text) frame — the unit the
    * incremental minhash index ingests per micro-batch. */
  private[graft] def docShinglesOf(s: SparkSession, docs: DataFrame,
      requireNonEmpty: Boolean = true): DataFrame = {
    graft.GraftExtensions.register(s)
    val base = docs
      .select(col("doc_id"),
        call_function("trigram_shingles", split(col("text"), " ")).as("sh"))
    if (requireNonEmpty) base.filter(size(col("sh")) > 0) else base
  }

  /** DuckDB fragment converting the first `n` hex chars of md5 expression
    * `m` to a BIGINT — the cross-engine replayable hash primitive (Spark
    * side: `conv(substring(md5(x), 1, n), 16, 10)`). Positional digit
    * arithmetic because DuckDB has no baseN conv(). */
  private def duckHexToLong(m: String, n: Int): String =
    (1 to n).map { k =>
      val coef = math.pow(16, (n - k).toDouble).toLong
      s"(strpos('0123456789abcdef', substr($m, $k, 1)) - 1) * $coef"
    }.mkString("(", " + ", ")")

  /** DuckDB fragment: (doc_id, sh LIST<VARCHAR>) distinct trigrams. */
  private val docShinglesSql = """
    SELECT doc_id, list_distinct(tgs) AS sh FROM (
      SELECT doc_id,
             list_transform(range(1, len(ts) - 1),
                            i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]) AS tgs
      FROM (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ts
            FROM documents))
    WHERE len(tgs) > 0"""

  /** Posting-list document-frequency cap shared by the inverted-index
    * pair joins (trigram jaccard here, winnowing in TextAnalysis). */
  private[graft] val DfCap = 64

  /** DuckDB CTE chain replaying the full MinHash-LSH pipeline (16-perm
    * pinned config) through the verified pair set `pairs(id_a, id_b,
    * jaccard)` — shared by dedup_minhash_lsh and the incremental-index
    * verdicts, which append their own CTEs after it. Every hash is
    * md5-derived so the chain is engine-exact (see dedup_minhash_lsh's
    * registration comment). */
  private lazy val minhashPairsCtesSql = s"""
        WITH docs AS ($docShinglesSql),
        ex AS (SELECT doc_id, unnest(sh) AS sg FROM docs),
        hh AS (SELECT DISTINCT doc_id,
                      ${duckHexToLong("md5(sg)", 12)} % 1000003 AS h
               FROM ex),
        perms AS (SELECT unnest(range(0, 16)) AS i),
        sigs AS (
          SELECT doc_id, i,
                 min((h * (2*i + 1) + 7*i + 13) % 998244353) AS v
          FROM hh CROSS JOIN perms
          GROUP BY doc_id, i),
        bands AS (
          SELECT doc_id, i // 4 AS band_id,
                 md5(string_agg(v::VARCHAR, ',' ORDER BY i)) AS bkey
          FROM sigs GROUP BY doc_id, (i // 4)),
        cand AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM bands x JOIN bands y
            ON x.band_id = y.band_id AND x.bkey = y.bkey
           AND x.doc_id < y.doc_id),
        sizes AS (SELECT doc_id, count(*) AS sz FROM hh GROUP BY doc_id),
        inter AS (
          SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
          FROM cand c
          JOIN hh a ON a.doc_id = c.id_a
          JOIN hh b ON b.doc_id = c.id_b AND b.h = a.h
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b,
                 round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6)
                   AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2)"""

  /** N-adaptive MinHash-LSH sizing → (perms, bands, rowsPerBand).
    *
    * Pinned (16, 4, 4) for n ≤ [[MinhashPinnedN]] — the config every
    * DuckDB-oracled run bit-replays (documents: sf0.01 = 500 docs,
    * sf0.1 = 5000). Above it, rows-per-band grow with log N — a
    * background (non-duplicate) bucket collision needs r simultaneous
    * minhash matches, so its rate falls exponentially in r and bucket
    * occupancy stays ~flat as N grows; with CONSTANT banding, occupancy
    * grows linearly in N and in-bucket candidate pairs quadratically —
    * measured as the worst family ratio (43× at 100× data) in the
    * round-8 scale stress. The band count b = ceil((1/s*)^r) then holds
    * the LSH candidate threshold s* = b^(-1/r) at the pinned 4×4 value
    * (4^(-1/4) ≈ 0.707), so recall at the Jaccard verify threshold does
    * not drift with N. r is capped at 8 (128 perms): signature cost is
    * perms × shingles per doc. PropertySpec pins the monotonicity,
    * threshold-stability, and pinned-branch identity of this formula. */
  private[graft] val MinhashPinnedN = 8192L
  private[graft] def minhashConfig(n: Long): (Int, Int, Int) =
    if (n <= MinhashPinnedN) (16, 4, 4)
    else {
      val r = math.min(8, 4 + math.ceil(
        math.log(n.toDouble / MinhashPinnedN) / math.log(2.0) / 2.0).toInt)
      val b = math.ceil(math.pow(2.0, r / 2.0)).toInt
      (r * b, b, r)
    }

  /** The MinHash band frame (doc_id, hs, band_id, bkey) shared by
    * dedup_minhash_lsh and the ScaleStress band-occupancy probe.
    *
    * VERIFY INSIDE THE BAND JOIN (the dedup_embedding_cosine pattern):
    * the shingle-hash set rides the band frame (N × bands rows —
    * bounded, linear in N) and the exact-Jaccard filter sits directly
    * in the join projection, so candidate PAIRS are never materialized
    * to a shuffle — they stream through the codegen'd join stage, and
    * with the minimal-agreeing-band gate each true pair survives
    * EXACTLY ONCE (no downstream distinct at all).
    * The previous id-only candidate set + two re-attach joins
    * shuffled the full pair set plus two shingle arrays per pair:
    * quadratic traffic in bucket occupancy, measured as the worst
    * family ratio (43×) in the round-8 100× stress.
    *
    * Jaccard is computed over the SORTED DISTINCT shingle-HASH sets
    * (sort_array(array_distinct(hs))), not the shingle strings, and the
    * verify evaluates ONE zero-allocation merge scan per meeting
    * (sorted_intersect_size; |A∪B| from the size identity). Measured on
    * the 100× corpus (MinhashProbe, 500k docs, 58.5M meetings, max
    * bucket occupancy 100): string-array verify 562 s → long-set hash
    * verify 99 s → sorted merge-scan verify 23.8 s, identical pair
    * output at every step. Identical-by-construction in the DuckDB
    * oracle (same md5-mod hashes on both sides); vs string Jaccard the
    * value differs only on mod-1000003 collisions (~|A||B|/1e6 ≈ 1e-2
    * expected false intersections per candidate pair at 100-shingle
    * docs).
    *
    * The frame is persisted (the signature pipeline feeds both sides of
    * the band self-join, and Spark only reuses *shuffle* exchanges);
    * callers release via clearCache. */
  private[graft] def minhashBandFrame(s: SparkSession, dir: String)
      : DataFrame = {
    // N-adaptive banding, sized from the parquet footer (no Spark job
    // at plan-construction); pinned 16-perm/4×4 below MinhashPinnedN so
    // every oracled run bit-replays in DuckDB.
    val (perms, bands, rows) = minhashConfig(
      Tables.footerRowCount(s, s"$dir/documents.parquet"))
    minhashBandFrameOf(s, t(s, dir, "documents"), perms, bands, rows)
  }

  /** [[minhashBandFrame]] over an arbitrary (doc_id, text) frame at an
    * EXPLICIT (perms, bands, rows) config — the per-micro-batch unit of
    * the incremental index: the banding config must come from the whole
    * corpus (not the batch) so every batch's band keys live in the same
    * key space as the persisted postings they join against. */
  private[graft] def minhashBandFrameOf(s: SparkSession, docs: DataFrame,
      perms: Int, bands: Int, rows: Int): DataFrame = {
    import graft.functions.VectorExprs
    // sort_array: invisible to Jaccard (set semantics) and to the
    // signature (min over a set), but it lets the verify compute
    // |A∩B| by a zero-allocation merge scan (sorted_intersect_size)
    // instead of array_intersect's per-meeting hash set + materialized
    // result array — the verify was the 100× hot spot (MinhashProbe:
    // 58.5M meetings, verify ≈ 80% of wall-clock).
    val sh = docShinglesOf(s, docs)
      .select(col("doc_id"),
        // coalesce(…, 0): never fires (shingles are non-null strings by
        // construction) but it makes the lambda PROVABLY non-nullable,
        // so `hs` types as array<bigint not null> — which the strict
        // sorted_intersect_size type check (null slots would getLong
        // garbage) requires at analysis time
        sort_array(array_distinct(transform(col("sh"), x =>
          coalesce(
            conv(substring(md5(x), 1, 12), 16, 10).cast("long") % 1000003L,
            lit(0L)))))
          .as("hs"))
      .withColumn("sig", VectorExprs.minhashSig(s, col("hs"), perms))
      .persist()
    // `pre` = the band keys of all EARLIER bands (slice of length
    // band_id): a true pair's bands agree in up to `bands` places, and
    // without it the Jaccard merge scan ran once per agreeing band
    // (round-9 residual: ≤ b× verify multiplicity). A meeting now
    // verifies only in its MINIMAL agreeing band — the `pre` arrays of
    // the two sides disagree everywhere — making each surviving pair
    // structurally unique (no dedup shuffle needed downstream). Cost:
    // avg (b−1)/2 extra 32-char keys per band row, repaid at the first
    // multi-band duplicate; the prefix comparison is O(band_id) string
    // equality per meeting vs O(|hs|) merge scan per skipped verify.
    sh.select(
      col("doc_id"), col("hs"),
      // md5 of the comma-joined slice, NOT Spark's murmur3 hash():
      // engine-neutral band keys are what make the whole LSH
      // pipeline oracle-replayable
      transform(sequence(lit(0), lit(bands - 1)), b =>
        md5(concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, lit(rows)),
            _.cast("string"))))).as("bkeys"))
      .select(col("doc_id"), col("hs"),
        posexplode(col("bkeys")).as(Seq("band_id", "bkey")),
        col("bkeys"))
      .select(col("doc_id"), col("hs"), col("band_id"), col("bkey"),
        // 64-bit hashes of the earlier keys, not the 32-char keys
        // themselves: ~4× lighter through the persisted frame and the
        // band shuffle, and the gate compares longs. Accepted loss
        // mode, quantified: a spurious hash collision in an earlier
        // slot makes the gate believe an earlier band agreed, so the
        // meeting is suppressed at its REAL first agreeing band — and
        // since the colliding band's true keys differ, the pair never
        // meets there either: the pair is DROPPED, not mis-banded
        // (unlike the old per-band .distinct() plan, which had no such
        // mode). Expected losses = meetings × avg(band_id) × 2⁻⁶⁴ —
        // at the 100× canary's 86.9M meetings × ≤8 slots that is
        // ~4·10⁻¹¹ expected lost pairs per run, the same exposure
        // class as the xxhash64 posting keys the n-gram index already
        // accepts. If zero-loss were required, gate on the 32-char
        // bkey slices themselves (~4× wider shuffle rows on the
        // hottest join — not worth 2⁻⁶⁴ here).
        transform(slice(col("bkeys"), lit(1), col("band_id")), xxhash64(_))
          .as("pre"))
  }

  /** Meeting is in its minimal agreeing band ⟺ every earlier band-key
    * pair disagrees. MUST stay a codegen'd primitive: the first cut
    * used `exists(zip_with(...))`, and a single interpreted
    * higher-order lambda in the join condition dropped the ENTIRE band
    * join out of whole-stage codegen — measured 8× on the band join
    * end-to-end, swamping the multiplicity it saved. */
  private[graft] def firstAgreeingBand(s: SparkSession): Column =
    !graft.functions.VectorExprs.positionalAnyEqual(
      s, col("x.pre"), col("y.pre"))

  /** Exact Jaccard of a band-join meeting aliased `x`/`y` — ONE
    * zero-allocation merge scan per meeting; |A∪B| from the size
    * identity (same arithmetic as the oracle's sizes CTE). */
  private[graft] def meetingJaccard(s: SparkSession): Column = {
    val inter = graft.functions.VectorExprs.sortedIntersectSize(
      s, col("x.hs"), col("y.hs"))
    inter.cast("double") / (size(col("x.hs")) + size(col("y.hs")) - inter)
  }

  /** Gated, verified near-dup pairs (id_a < id_b, jaccard ≥ 0.2) over
    * the whole corpus — the shared core of dedup_minhash_lsh and the
    * incremental-index verdicts. Unordered; callers sort. The band
    * frame is persisted by construction; callers release via
    * clearCache. */
  private[graft] def minhashPairs(s: SparkSession, dir: String)
      : DataFrame = {
    val bandFrame = minhashBandFrame(s, dir)
    // no broadcast hint: the band table is per-doc (unbounded at
    // scale) — the equi-join shuffles on (band_id, bkey) and AQE
    // broadcasts by itself when the input is actually small.
    val jac = meetingJaccard(s)
    bandFrame.as("x")
      .join(bandFrame.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      // minimal-agreeing-band gate FIRST (cheap prefix compare),
      // Jaccard merge scan only on the one surviving meeting per
      // pair — which also makes pairs structurally unique, so the
      // old post-verify .distinct() shuffle is gone entirely.
      .filter(firstAgreeingBand(s) && jac >= 0.2)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        round(jac, 6).as("jaccard"))
  }

  /** Batch-decomposed ingest-time verdict frame (doc, near_dup_of) for
    * the text corpus — the arrival-order (akey = batch·2⁴⁰ + id,
    * batch = id % 3) min_by aggregate over the gated MinHash pair set,
    * shared by dedup_minhash_incremental (emits it per doc) and
    * dedup_minhash_keepers_incremental (chases it to roots). */
  private[graft] def minhashArrivalVerdicts(s: SparkSession, dir: String)
      : DataFrame = {
    val pairs = minhashPairs(s, dir)
    val arr = t(s, dir, "documents").select(col("doc_id"),
      (pmod(col("doc_id"), lit(3L)) * lit(1099511627776L) +
        col("doc_id")).as("akey"))
    val dirn = pairs
      .join(arr.select(col("doc_id").as("id_a"),
        col("akey").as("akey_a")), "id_a")
      .join(arr.select(col("doc_id").as("id_b"),
        col("akey").as("akey_b")), "id_b")
      .select(
        when(col("akey_a") < col("akey_b"), col("id_b"))
          .otherwise(col("id_a")).as("doc"),
        when(col("akey_a") < col("akey_b"), col("id_a"))
          .otherwise(col("id_b")).as("blocker"),
        least(col("akey_a"), col("akey_b")).as("bakey"))
    dirn.groupBy("doc")
      .agg(min_by(col("blocker"), col("bakey")).as("near_dup_of"))
  }

  /** Rewrite a manifest-committed state root to a bounded file count —
    * the ingest indexes' maintenance step (round-13 verdict task 4):
    * each micro-batch appends one file set, so under real continuous
    * ingest a postings root becomes the small-files problem the batch
    * `compact_small_files` operator exists to fix. Round-15 (r14
    * verdict task 4 + ADVICE): the commit moved from delete+rename —
    * atomic on local FS only, and crash-lossy between the rm and the
    * rename — onto [[StateManifest.replace]]'s manifest-pointer swap
    * (data first, manifest last), which is the snapshot family's
    * protocol and holds on S3A semantics too. */
  private[graft] def compactStateDir(s: SparkSession, path: String,
      nFiles: Int): Unit =
    StateManifest.read(s, path).foreach { df =>
      StateManifest.replace(s, path, df, "compact", nFiles)
    }

  /** Fold a verdict-contribution log to its retained minimum — at most
    * one row per doc, the (blocker, bakey) of the winning (lowest-akey)
    * contribution. min_by is associative, so folding mid-stream can
    * never change a final verdict; contributions that already lost are
    * the rows the fold drops. Round-15 (r14 verdict task 7): an
    * optional retention TTL additionally drops the verdicts of docs
    * whose own ingest batch (`dseq`, stamped at append) has aged out of
    * the last `retainBatches` batches — the policy bound that keeps
    * unbounded-corpus verdict state finite (the snapshot family's
    * vacuum-retention stance); verdicts inside the retained window are
    * untouched because a doc's contributions all arrive in its own
    * batch (StreamsSpec pins both halves). Commits via the same
    * manifest swap as [[compactStateDir]]. */
  private[graft] def retainContribs(s: SparkSession, path: String,
      nFiles: Int, retainBatches: Int = 0, curSeq: Long = -1L): Unit =
    StateManifest.read(s, path).foreach { df =>
      val folded = df.groupBy("doc")
        .agg(min_by(col("blocker"), col("bakey")).as("blocker"),
          min(col("bakey")).as("bakey"), min(col("dseq")).as("dseq"))
      val kept =
        if (retainBatches > 0 && curSeq >= 0)
          folded.filter(col("dseq") > curSeq - retainBatches)
        else folded
      StateManifest.replace(s, path, kept, "retain", nFiles)
    }

  /** The REAL online form of dedup_minhash_incremental (spec driver —
    * StreamsSpec pins its parity with the registered batch-decomposed
    * query): a file-source micro-batch stream over 3 file drops
    * (doc_id % 3), foreachBatch maintaining a persisted band-postings
    * index in parquet. Per batch: band-frame the arrivals (corpus-wide
    * banding config — batch keys must live in the index's key space),
    * meet them against index ∪ batch on (band_id, bkey), gate to the
    * minimal agreeing band, Jaccard-verify, DIRECT each discovered pair
    * by arrival key (seq · 2⁴⁰ + doc_id, where seq is the micro-batch
    * sequence number PERSISTED on every postings row — round-13 verdict
    * task 3: the direction derives from state, never from the id), and
    * append the directed verdict contributions and the batch's
    * postings. Each unordered pair is discovered exactly once — in the
    * batch where its later-PROCESSED member arrives — and every verdict
    * is final at ingest (a doc's contributions all arrive in its own
    * batch): append-mode semantics, nothing revised. Maintenance:
    * every `compactEvery` batches the postings dir is rewritten to a
    * bounded file count and the contribution log is folded to its
    * retained minimum (≤1 row/doc) — min_by associativity makes both
    * verdict-invariant (StreamsSpec pins it). `hashSplit` builds the
    * file drops by xxhash64(doc_id) % 3 instead of doc_id % 3, so specs
    * can prove nothing leans on batch membership being derivable from
    * the id. Returns (verdict frame, micro-batch count). */
  private[graft] def minhashIndexIngest(s: SparkSession, dir: String,
      stateRoot: String, scrambleOrder: Boolean = false,
      hashSplit: Boolean = false, compactEvery: Int = 2,
      compactFiles: Int = 1, retainBatches: Int = 0): (DataFrame, Int) = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val (perms, bands, rows) = minhashConfig(
      Tables.footerRowCount(s, s"$dir/documents.parquet"))
    def splitKey(c: Column): Column =
      if (hashSplit) pmod(xxhash64(c), lit(3L)) else pmod(c, lit(3L))
    for (b <- 0 to 2)
      docs.filter(splitKey(col("doc_id")) === b)
        .coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/in/b$b")
    // scrambleOrder: force the file source to process b2, b0, b1 (the
    // source orders by modification time) — the adversarial case for
    // the state-derived direction: the persisted seq then reflects the
    // scrambled processing order, and the verdict table must equal the
    // batch-global recomputation from that SAME persisted state
    if (scrambleOrder) {
      val now = System.currentTimeMillis()
      for ((b, i) <- Seq(2 -> 0, 0 -> 1, 1 -> 2)) {
        val d = new java.io.File(s"$stateRoot/in/b$b")
        d.listFiles().foreach(_.setLastModified(now - 300000L + i * 60000L))
      }
    }
    val postDir = s"$stateRoot/postings"
    val contribDir = s"$stateRoot/verdicts"
    def akey(seq: Column, d: Column): Column =
      seq * lit(1099511627776L) + d
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stateRoot/in/*")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val frame = minhashBandFrameOf(s, batch, perms, bands, rows)
          .withColumn("seq", lit(batchId)).persist()
        val idx = StateManifest.read(s, postDir).getOrElse(frame.limit(0))
        // the parquet roundtrip (and the union with it) drops the
        // arrays' containsNull=false, which the strict codegen
        // primitives (sorted_intersect_size, positional_any_equal)
        // require at analysis time — the coalesce never fires but
        // makes the lambda provably non-nullable again
        val un = idx.withColumn("in_index", lit(true))
          .unionByName(frame.withColumn("in_index", lit(false)))
          .select(col("doc_id"),
            transform(col("hs"), x => coalesce(x, lit(0L))).as("hs"),
            col("band_id"), col("bkey"),
            transform(col("pre"), x => coalesce(x, lit(0L))).as("pre"),
            col("seq"), col("in_index"))
        val jac = meetingJaccard(s)
        // new-vs-index meetings in either id order (the index doc is
        // always the x side, seen once); new-vs-new once via id order.
        // Direction: each side's akey uses ITS OWN seq — the index
        // side's comes from the persisted postings row
        val contribs = frame.as("y")
          .join(un.as("x"),
            col("x.band_id") === col("y.band_id") &&
              col("x.bkey") === col("y.bkey") &&
              (col("x.in_index") || col("x.doc_id") < col("y.doc_id")))
          .filter(firstAgreeingBand(s) && jac >= 0.2)
          .select(col("x.doc_id").as("xa"), col("y.doc_id").as("ya"),
            akey(col("x.seq"), col("x.doc_id")).as("ka"),
            akey(col("y.seq"), col("y.doc_id")).as("kb"))
          .select(
            when(col("ka") < col("kb"), col("ya"))
              .otherwise(col("xa")).as("doc"),
            when(col("ka") < col("kb"), col("xa"))
              .otherwise(col("ya")).as("blocker"),
            least(col("ka"), col("kb")).as("bakey"),
            // the doc's OWN ingest batch — the retention TTL's clock
            lit(batchId).as("dseq"))
        // manifest commits (round-15): data files first, manifest
        // last; the batch tag makes a foreachBatch replay after any
        // crash point a no-op instead of a double-append
        StateManifest.append(s, contribDir, contribs, s"b$batchId")
        StateManifest.append(s, postDir, frame, s"b$batchId")
        frame.unpersist()
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          // compactFiles defaults to 1 at this fixture scale; a
          // production deployment sizes it to state volume (files ~
          // bytes / maxPartitionBytes), which stays bounded either way
          compactStateDir(s, postDir, nFiles = compactFiles)
          retainContribs(s, contribDir, nFiles = compactFiles,
            retainBatches = retainBatches, curSeq = batchId)
          // tag-horizon prune (r15 verdict task 4): every batch below
          // the one executing is streaming-checkpoint-committed, so its
          // tag can never be replayed — drop it from the manifest
          StateManifest.pruneBatchTagsBelow(postDir, batchId)
          StateManifest.pruneBatchTagsBelow(contribDir, batchId)
        }
        nBatches.incrementAndGet()
        ()
      }
      .option("checkpointLocation", s"$stateRoot/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val contrib = StateManifest.read(s, contribDir).getOrElse(
      s.range(0).select(col("id").as("doc"), col("id").as("blocker"),
        col("id").as("bakey")))
    val v = contrib.groupBy("doc")
      .agg(min_by(col("blocker"), col("bakey")).as("near_dup_of"))
    // the batch column comes from the persisted postings state, not
    // from any arithmetic on the id (distinct: the band postings carry
    // one row per (doc, band))
    val out = StateManifest.read(s, postDir).get
      .select(col("doc_id"), col("seq").as("batch")).distinct()
      .join(v, col("doc_id") === col("doc"), "left")
      .select(col("doc_id"), col("batch"), col("near_dup_of"),
        col("near_dup_of").isNull.as("is_novel"))
      .orderBy("doc_id")
    (out, nBatches.get)
  }

  /** The REAL online form of sim_ivf_incremental (spec driver —
    * StreamsSpec pins its parity with the registered batch-decomposed
    * query): a file-source micro-batch stream over 3 drops of the
    * planted corpus (vec_id % 3), foreachBatch maintaining a persisted
    * IVF postings index — (vec_id, cell, vec) inverted lists — in
    * parquet. Per batch: cell-assign the arrivals under the FROZEN
    * quantizer (one broadcast codebook row, built once outside the
    * stream — the production shape: IVF quantizers are trained offline
    * and never drift under ingest), meet them against index ∪ batch on
    * the cell id, exact-cosine-verify (≥ 0.95), DIRECT each discovered
    * pair by arrival key (seq · 2⁴⁰ + vec_id, where seq is the
    * micro-batch sequence number PERSISTED on every postings row —
    * round-13 verdict task 3: the direction derives from state, never
    * from the id), append the directed verdict contributions and the
    * batch's postings. Each unordered pair is discovered exactly once —
    * in the batch where its later-PROCESSED member arrives — and every
    * verdict is final at ingest (a vector's contributions all arrive in
    * its own batch): append-mode semantics, nothing revised.
    * Maintenance: every `compactEvery` batches the postings dir is
    * rewritten to a bounded file count and the contribution log is
    * folded to its retained minimum (≤1 row/doc) — min_by associativity
    * makes both verdict-invariant (StreamsSpec pins it). `hashSplit`
    * builds the drops by xxhash64(vec_id) % 3 so specs can prove
    * nothing leans on batch membership being derivable from the id.
    * Returns (verdict frame, micro-batch count). */
  private[graft] def ivfIndexIngest(s: SparkSession, dir: String,
      stateRoot: String, scrambleOrder: Boolean = false,
      hashSplit: Boolean = false, compactEvery: Int = 2,
      compactFiles: Int = 1, retainBatches: Int = 0): (DataFrame, Int) = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.functions.VectorExprs
    val corpus = embPlantedCorpus(s, dir)
    val k = semCellCount(
      Tables.footerRowCount(s, s"$dir/embeddings.parquet") * 6 / 5)
    val cb = semCellCodebook(s, dir, k)
    def splitKey(c: Column): Column =
      if (hashSplit) pmod(xxhash64(c), lit(3L)) else pmod(c, lit(3L))
    for (b <- 0 to 2)
      corpus.filter(splitKey(col("vec_id")) === b)
        .coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/in/b$b")
    // scrambleOrder: force the file source to process b2, b0, b1 (the
    // source orders by modification time) — the adversarial case for
    // the state-derived direction: the persisted seq then reflects the
    // scrambled processing order, and the verdict table must equal the
    // batch-global recomputation from that SAME persisted state
    if (scrambleOrder) {
      val now = System.currentTimeMillis()
      for ((b, i) <- Seq(2 -> 0, 0 -> 1, 1 -> 2)) {
        val d = new java.io.File(s"$stateRoot/in/b$b")
        d.listFiles().foreach(_.setLastModified(now - 300000L + i * 60000L))
      }
    }
    val postDir = s"$stateRoot/postings"
    val contribDir = s"$stateRoot/verdicts"
    def akey(seq: Column, v: Column): Column =
      seq * lit(1099511627776L) + v
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = s.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stateRoot/in/*")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val frame = semCellAssign(s, batch, cb)
          .withColumn("seq", lit(batchId)).persist()
        val idx = StateManifest.read(s, postDir).getOrElse(frame.limit(0))
        val un = idx.withColumn("in_index", lit(true))
          .unionByName(frame.withColumn("in_index", lit(false)))
        val cos = VectorExprs.cosine(s, col("x.vec"), col("y.vec"))
        // new-vs-index meetings in either id order (the index vector is
        // always the x side, seen once); new-vs-new once via id order.
        // Direction: each side's akey uses ITS OWN seq — the index
        // side's comes from the persisted postings row
        val contribs = frame.as("y")
          .join(un.as("x"),
            col("x.cell") === col("y.cell") &&
              (col("x.in_index") || col("x.vec_id") < col("y.vec_id")))
          .filter(round(cos, 6) >= 0.95)
          .select(col("x.vec_id").as("xa"), col("y.vec_id").as("ya"),
            akey(col("x.seq"), col("x.vec_id")).as("ka"),
            akey(col("y.seq"), col("y.vec_id")).as("kb"))
          .select(
            when(col("ka") < col("kb"), col("ya"))
              .otherwise(col("xa")).as("doc"),
            when(col("ka") < col("kb"), col("xa"))
              .otherwise(col("ya")).as("blocker"),
            least(col("ka"), col("kb")).as("bakey"),
            // the doc's OWN ingest batch — the retention TTL's clock
            lit(batchId).as("dseq"))
        // manifest commits (round-15): data files first, manifest
        // last; the batch tag makes a foreachBatch replay after any
        // crash point a no-op instead of a double-append
        StateManifest.append(s, contribDir, contribs, s"b$batchId")
        StateManifest.append(s, postDir, frame, s"b$batchId")
        frame.unpersist()
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          // compactFiles defaults to 1 at this fixture scale; a
          // production deployment sizes it to state volume (files ~
          // bytes / maxPartitionBytes), which stays bounded either way
          compactStateDir(s, postDir, nFiles = compactFiles)
          retainContribs(s, contribDir, nFiles = compactFiles,
            retainBatches = retainBatches, curSeq = batchId)
          // tag-horizon prune (r15 verdict task 4): every batch below
          // the one executing is streaming-checkpoint-committed, so its
          // tag can never be replayed — drop it from the manifest
          StateManifest.pruneBatchTagsBelow(postDir, batchId)
          StateManifest.pruneBatchTagsBelow(contribDir, batchId)
        }
        nBatches.incrementAndGet()
        ()
      }
      .option("checkpointLocation", s"$stateRoot/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val contrib = StateManifest.read(s, contribDir).getOrElse(
      s.range(0).select(col("id").as("doc"), col("id").as("blocker"),
        col("id").as("bakey")))
    val v = contrib.groupBy("doc")
      .agg(min_by(col("blocker"), col("bakey")).as("near_dup_of"))
    // the batch column comes from the persisted postings state, not
    // from any arithmetic on the id
    val out = StateManifest.read(s, postDir).get
      .select(col("vec_id"), col("seq").as("batch"))
      .join(v, col("vec_id") === col("doc"), "left")
      .select(col("vec_id"), col("batch"), col("near_dup_of"),
        col("near_dup_of").isNull.as("is_novel"))
      .orderBy("vec_id")
    (out, nBatches.get)
  }

  /** Band-join meeting count (join rows BEFORE the Jaccard filter) —
    * the quantity adaptive banding must hold ~linear in N. Column
    * pruning drops `hs` from both sides here, so this also times the
    * THIN band join (no verify payload) against the full query. */
  private[graft] def minhashMeetings(s: SparkSession, dir: String,
      gated: Boolean = false): Long = {
    val bf = minhashBandFrame(s, dir)
    val met = bf.as("x")
      .join(bf.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
    // gated = the meetings that actually reach the Jaccard merge scan
    // after the minimal-agreeing-band filter — the probe's measure of
    // verify multiplicity (raw/gated ≈ avg agreeing bands per pair).
    (if (gated) met.filter(firstAgreeingBand(s)) else met).count()
  }

  /** N-adaptive hyperplane-LSH sizing for embedding dedup → (bits,
    * tables). Pinned (8, 24) for n ≤ 8192 — exact-match proven against
    * the all-pairs oracle at sf0.01 AND sf0.1 (the jump at the cutoff
    * is deliberate: the pinned branch must stay bit-identical for
    * oracled runs). Above: bits targets ~8 vectors/bucket; the table
    * count holds the analytic per-pair miss probability at the
    * 0.95-threshold angle (q = 1 − θ/π ≈ 0.8989 per sign bit) to
    * ≤ 1e-6: T = ln(1e-6) / ln(1 − q^bits). PropertySpec pins the
    * miss-bound and occupancy-target math over a wide n range. */
  private[graft] def embLshConfig(n: Long): (Int, Int) = {
    val bits =
      if (n <= 8192) 8
      else math.ceil(math.log(n / 8.0) / math.log(2)).toInt
    val tables =
      if (bits == 8) 24
      else math.ceil(13.816 /
        -math.log1p(-math.pow(0.8989, bits))).toInt
    (bits, tables)
  }

  /** The planted-canary embedding corpus and its LSH bucket frame
    * (vec_id, vec, tbl, bucket) — shared by dedup_embedding_cosine and
    * the ScaleStress candidate-occurrence probe. The corpus is
    * persisted; callers release via clearCache. */
  /** N-adaptive cell count for the semantic-cell dedup. Pinned 16 for
    * n ≤ [[SemCellsPinnedN]] — the config every DuckDB-oracled run
    * bit-replays (embeddings × 6/5 planted: sf0.01 = 600, sf0.1 =
    * 2400). Above it, cells grow linearly with N to hold expected cell
    * occupancy ≈ 150 (the base-dir value): with a CONSTANT cell count
    * the within-cell pair stream grows quadratically in N — the same
    * fixed-granularity scale-killer the minhash banding and LSH bucket
    * sizing already correct for — while occupancy-proportional k keeps
    * it ~linear (SemDeDup runs k ≈ 100k at billions of embeddings for
    * exactly this reason). Centroids are the k lowest-id base vectors,
    * so the quantizer stays deterministic and oracle-replayable at any
    * pinned dir. */
  private[graft] val SemCellsPinnedN = 8192L
  private[graft] def semCellCount(n: Long): Long =
    if (n <= SemCellsPinnedN) 16L
    // integer ceil-div, NOT math.ceil(...).toInt: the double path
    // rounds above 2^53 and an Int result clamps at 2^31-1 (≈3.2e11
    // vectors), silently re-creating the fixed-granularity quadratic —
    // the PropertySpec occupancy band caught exactly that clamp
    else (n + 149L) / 150L

  /** The cell-partitioned exact-cosine pair frame at an EXPLICIT cell
    * count k — dedup_semantic_cells' body, parameterized so the
    * ScaleStress recall/cost canary can sweep k; the registered query
    * derives k via [[semCellCount]].
    *
    * Assignment is a single codegen projection: the codebook collapses
    * to ONE broadcast row (collect_list of the k lowest-id base
    * vectors — same k-row broadcast asymptotics as a per-row centroid
    * frame, ~k·d·8 bytes, the SemDeDup codebook regime) and the native
    * nearest_centroid expression does the argmax per input row. Two
    * prior plans were measured failures at the 100× corpus (288k vecs
    * × 1920 cells): rank-1 window → sorted the N×k vector-dragging
    * stream, 801 GB spill; max_by hash agg → silently planned as
    * SortAggregate (struct ordering buffer is not hash-aggregable), so
    * it STILL sorted the N×k stream — 33 GB spill. The expression
    * keeps the argmax inside the scan's whole-stage-codegen pipeline:
    * per row it loops the thread-memoized decoded codebook (primitive
    * arrays, no per-centroid allocation), emits ONE long, and replays
    * the exact window/max_by semantics — full-precision cosine
    * (bit-identical accumulation order to cosine_sim), highest cosine
    * wins, ties to the lowest cell. No N×k stream exists; the only
    * shuffle in the whole query is the cell self-join's. */
  /** The semantic-cells pipeline as DuckDB CTEs (planted corpus →
    * pinned 16-centroid quantizer → cell assignment → within-cell exact
    * cosine pairs in `p`) — shared by dedup_semantic_cells,
    * sim_ivf_incremental, and dedup_semantic_two_stage. The NOT isnan
    * filter pins the nearest_centroid kernel's degenerate-vector
    * contract: the kernel never lets a NaN cosine win (zero-norm vector
    * or centroid) and returns NULL when every cosine is NaN, dropping
    * the row from the pair join; DuckDB's ORDER BY DESC sorts NaN
    * greatest and would otherwise let a zero-norm side WIN assignment
    * here while vanishing there. */
  private lazy val semCellPairsCtesSql = """
        base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        planted AS (
          SELECT orig_id + 10000000 AS vec_id,
                 list_concat(vec[1:32],
                   list_transform(vec[33:], x -> x * m)) AS vec
          FROM (SELECT vec_id AS orig_id, vec,
                       1.0 + (vec_id % 7 + 1) * 0.25 AS m
                FROM base WHERE vec_id % 5 = 0)),
        allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        cents AS (SELECT vec_id AS cell, vec AS cv FROM base WHERE vec_id < 16),
        asg AS (
          SELECT a.vec_id, a.vec, c.cell,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(a.vec, c.cv) DESC,
                            c.cell) AS rk
          FROM allv a CROSS JOIN cents c
          WHERE NOT isnan(list_cosine_similarity(a.vec, c.cv))),
        lists AS (SELECT vec_id, vec, cell FROM asg WHERE rk = 1),
        p AS (SELECT x.cell, x.vec_id AS id_a, y.vec_id AS id_b,
                     round(list_cosine_similarity(x.vec, y.vec), 6) AS cos_sim
              FROM lists x JOIN lists y
                ON x.cell = y.cell AND x.vec_id < y.vec_id)"""

  /** The ONE-row broadcast codebook frame (collect_list of the k
    * lowest-id base vectors as struct<cell, cv>) — the coarse
    * quantizer every semantic-cell query shares. */
  private[graft] def semCellCodebook(s: SparkSession, dir: String, k: Long)
      : DataFrame =
    t(s, dir, "embeddings")
      .filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"),
        col("embedding").cast("array<double>").as("cv"))
      .agg(collect_list(struct(col("cell"), col("cv"))).as("cb"))

  /** Cell assignment of an arbitrary (vec_id, vec) frame: one broadcast
    * codebook row + the native codegen nearest_centroid argmax inside
    * the scan pipeline → (vec_id, vec, cell). No N×k stream exists. */
  private[graft] def semCellAssign(s: SparkSession, vecs: DataFrame,
      cb: DataFrame): DataFrame = {
    import graft.functions.VectorExprs
    vecs.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("vec"),
        VectorExprs.nearestCentroid(s, col("vec"), col("cb")).as("cell"))
  }

  private[graft] def semCellPairs(s: SparkSession, dir: String, k: Long)
      : DataFrame = {
    import graft.functions.VectorExprs
    val allv = embPlantedCorpus(s, dir)
    // persisted: both sides of the cell self-join would otherwise
    // re-run the k·d argmax scan
    val lists = semCellAssign(s, allv, semCellCodebook(s, dir, k))
      .persist()
    lists.as("x")
      .join(lists.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos_sim",
        round(VectorExprs.cosine(s, col("x.vec"), col("y.vec")), 6))
      .filter(col("cos_sim") >= 0.95)
      .select(col("x.cell").cast("long").as("cell"),
        col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        col("cos_sim"))
      .orderBy("cell", "id_a", "id_b")
  }

  /** Per-cell occupancy above which the two-stage composition runs its
    * stage-2 LSH bucketing; at or below it the cell takes the direct
    * within-cell exact join. The production rule round 13's regime
    * probe derived (BENCH_scale100_twostage.json): at the tuned
    * quantizer (occupancy ≈150) stage 2 COSTS 1.56× — the tables×occ
    * bucket frame dominates while the occ²/2 pair stream it caps is
    * small — and at a misfit one (occupancy ≈2400) it WINS 2.3×. The
    * crossover is where occ²/2 exact meetings outgrow the ~tables×occ
    * bucket-frame overhead, i.e. occ ≈ tens×tables ≈ several hundred;
    * 512 sits between the two measured regimes with margin on both
    * sides. A real corpus is heterogeneous WITHIN one run, so the gate
    * routes per cell, not per query. */
  private[graft] val TwoStageOccupancyGate = 512L

  /** dedup_semantic_two_stage's body at an EXPLICIT cell count k (so
    * ScaleStress can sweep it): cell-assign the corpus, compute each
    * cell's occupancy, and route per cell — occupancy ≤ gate takes the
    * direct within-cell exact join (stage 2 buys nothing in a sparse
    * cell), occupancy > gate takes within-cell LSH bucketing into
    * `tables` tables (embLshConfig), self-join on (cell, tbl, bucket),
    * verify INSIDE the join (vectors ride the bucket frame; candidate
    * pairs are never materialized to a shuffle — the
    * dedup_embedding_cosine lesson), distinct over table multiplicity.
    * Both branches verify with the same exact cosine, so the gate
    * changes COST only — the union equals the within-cell exact pair
    * set at every gate value (DedupSpec pins gate=0 / mid / ∞
    * row-identical). The distinct's columns are all fixed-width (two
    * ids, a bigint cell, a double) → hash aggregate, no silent sort. */
  private[graft] def semCellTwoStagePairs(s: SparkSession, dir: String,
      k: Long, gate: Long = TwoStageOccupancyGate): DataFrame = {
    import graft.functions.VectorExprs
    val n = Tables.footerRowCount(s, s"$dir/embeddings.parquet") * 6 / 5
    // LSH granularity sized from CELL OCCUPANCY, not global N: the
    // buckets only ever join within one cell (the join key is (cell,
    // tbl, bucket)), so sizing bits/tables from N over-partitions a
    // ~150-vector domain — measured at 100×: global sizing picked
    // (16 bits, 69 tables), a 20M-row frame, 128 s; occupancy sizing
    // keeps the pinned (8, 24) at every scale semCellCount holds
    // occupancy ≈150 (a per-pair recall bound is N-independent), a
    // 6.9M-row frame. Same outputs at the oracled dirs (occupancy 45
    // sits in the same pinned branch as their old global config).
    val (bits, tables) = embLshConfig(math.max(1L, n / k))
    // persist the N-row ASSIGNED corpus (one k·d argmax pass — the same
    // cache shape as semCellPairs), never the N×tables exploded bucket
    // frame (~11 GB at 100× with the vec payload riding — caching it
    // would trade a cheap recompute for real memory; the embBucketFrame
    // lesson). Occupancy is a k-row aggregate OFF the cache joined back
    // per branch side — AQE broadcasts it at any k the driver can hold
    // (k = n/150: 160 rows at 10×) and falls back to a shuffle join
    // beyond, so the N frame itself never takes an extra shuffle. The
    // first cut computed occ as a count-over-cell WINDOW before the
    // persist; the gate sweep measured that window's pre-cache shuffle
    // + sort costing ~2× cells-only on an all-direct corpus
    // (BENCH_gate_sweep_r14.json first cut: 3.6 s vs 1.74 s at 10×) —
    // kept here as the measured failure the aggregate-join form fixes.
    val assigned = semCellAssign(s, embPlantedCorpus(s, dir),
      semCellCodebook(s, dir, k))
      .persist()
    val withOcc = assigned.join(
      assigned.groupBy("cell").agg(count(lit(1)).as("occ")), "cell")
    val cos = VectorExprs.cosine(s, col("x.vec"), col("y.vec"))
    def verified(joined: DataFrame): DataFrame = joined
      .withColumn("cos_sim", round(cos, 6))
      .filter(col("cos_sim") >= 0.95)
      .select(col("x.cell").cast("long").as("cell"),
        col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        col("cos_sim"))
    val sparse = withOcc.filter(col("occ") <= gate)
    val direct = verified(sparse.as("x")
      .join(sparse.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.vec_id") < col("y.vec_id")))
    val dense = withOcc.filter(col("occ") > gate)
    val frame = dense
      .select(col("vec_id"), col("vec"), col("cell"),
        explode(transform(sequence(lit(0), lit(tables - 1)), tb =>
          struct(tb.as("tbl"),
            VectorExprs.lshBucket(s, col("vec"), tb, bits = bits)
              .as("bucket")))).as("tb"))
      .select(col("vec_id"), col("vec"), col("cell"),
        col("tb.tbl"), col("tb.bucket"))
    val bucketed = verified(frame.as("x")
      .join(frame.as("y"),
        col("x.cell") === col("y.cell") && col("x.tbl") === col("y.tbl") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id")))
      .distinct()
    // a pair lives in exactly one cell and a cell is entirely sparse or
    // entirely dense, so the branches partition the pair set — union,
    // no dedup across them
    direct.unionByName(bucketed)
      .orderBy("cell", "id_a", "id_b")
  }

  /** The planted-canary embedding corpus (vec_id, vec): base vectors ∪
    * deterministic near-dup copies (each vec_id % 5 == 0 row re-issued
    * as id + 10^7 with its tail half scaled by 1 + (id%7+1)/4, planted
    * cosines ~0.90–0.9999). Shared by the embedding dedup family
    * (hyperplane-LSH and semantic-cell variants) so both detectors face
    * the same ground truth. NOT persisted here — callers persist at the
    * reuse point that fits their plan. */
  private[graft] def embPlantedCorpus(s: SparkSession, dir: String)
      : DataFrame = {
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val m = (col("vec_id") % 7 + 1).cast("double") * lit(0.25) + lit(1.0)
    // perturb BEFORE renaming: aliasing the shifted id as "vec_id" in
    // the same select would make m's col("vec_id") resolve laterally
    // to the NEW id (Spark lateral column aliases), silently diverging
    // from the oracle's orig_id-based multiplier
    val planted = base.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"),
        concat(slice(col("vec"), 1, 32),
          transform(slice(col("vec"), 33, 32), x => x * m)).as("vec"))
      .select((col("vec_id") + 10000000L).as("vec_id"), col("vec"))
    base.unionByName(planted)
  }

  private[graft] def embBucketFrame(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.functions.VectorExprs
    // persisted: both sides of the bucket self-join would otherwise
    // re-run the union+perturb
    val vecs = embPlantedCorpus(s, dir).persist()
    // LSH granularity scales with N (the round-8 10× stress measured
    // 17.7× runtime at 10× data on the old fixed 8-bit/24-table
    // config — in-bucket pair counts are quadratic in occupancy, so
    // fixed bucket granularity is a scale-killer). n is sized from the
    // parquet footer (driver-side, no Spark job at plan-construction —
    // EXPLAIN and plan audits stay job-free) times 6/5 for the planted
    // vec_id%5 canaries; sizing only needs the order of magnitude, and
    // the pinned branch holds with margin at both oracled dirs (600 and
    // 2400 vs the 8192 cutoff).
    val n = Tables.footerRowCount(s, s"$dir/embeddings.parquet") * 6 / 5
    val (bits, tables) = embLshConfig(n)
    vecs.select(
      col("vec_id"), col("vec"),
      explode(transform(sequence(lit(0), lit(tables - 1)), tb =>
        struct(tb.as("tbl"),
          VectorExprs.lshBucket(s, col("vec"), tb, bits = bits)
            .as("bucket"))))
        .as("tb"))
      .select(col("vec_id"), col("vec"), col("tb.tbl"), col("tb.bucket"))
  }

  /** Candidate occurrences: rows streaming through the bucket join
    * BEFORE the cosine filter — the quantity whose growth the
    * dense-cluster scale stress bounds (quadratic in bucket occupancy,
    * the measured 77 GB-spill failure axis of the pre-round-8 design). */
  private[graft] def embCandidateOccurrences(s: SparkSession, dir: String)
      : Long = {
    val buckets = embBucketFrame(s, dir)
    buckets.as("x")
      .join(buckets.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .count()
  }

  /** Stop-key df cap for inverted-index pair joins: drop posting rows
    * whose key occurs in more than `cap` documents. One viral key (a
    * boilerplate header shared by millions of docs) otherwise makes the
    * posting self-join quadratic in its list length — and a key that
    * common carries no discriminative signal anyway, the same discipline
    * as stopword removal in BM25. df comes from a map-side-combined
    * aggregate (the hot key never concentrates raw posting rows on one
    * task), the hot set is ≤ |postings|/cap keys → broadcast anti-join,
    * so the posting stream itself is never reshuffled. Every oracle
    * replays the identical predicate (NOT IN … HAVING count(*) > cap).
    * DedupSpec plants a viral key across many docs and pins that the
    * candidate pair stream stays linear.
    *
    * PRECONDITION: `post` must carry each key at most once per document
    * (all call sites feed per-doc-DISTINCT keys — trigram_shingles /
    * list_distinct fingerprints), so the row count per key IS the
    * document frequency. A caller with duplicate per-doc keys would cap
    * on raw row count instead — count distinct doc_id per key in the hot
    * aggregate before reusing this for such a stream. */
  private[graft] def dfCapped(post: DataFrame, key: String,
      cap: Int): DataFrame = {
    val hot = post.groupBy(key).agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select(key)
    post.join(broadcast(hot), Seq(key), "left_anti")
  }

  /** Exact trigram-Jaccard near-dup pairs at `threshold` via the
    * inverted-index equi-join (shared by the pair query and the
    * cluster-resolution query). */
  private def jaccardPairs(s: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    // each posting row carries its doc's set size, so the pair aggregate
    // produces |A∩B|, |A|, |B| in ONE pass — no size-dimension join at
    // all afterwards (a per-doc dim is unbounded at scale; broadcasting
    // it would be a 100 TB bug, and re-shuffling the pair stream for a
    // sort-merge join is a wasted exchange)
    val docs = docShingles(s, dir, requireNonEmpty = false)
    // the df cap trims the INDEX only; set sizes stay full, so a pair
    // sharing viral grams scores a (deliberate) jaccard underestimate
    //
    // Posting frame shape (round-16 optimization): hash AFTER the
    // explode (plain per-row xxhash64) instead of
    // explode(transform(sh, xxhash64(_))) — a lambda-bearing subtree
    // defeats plan canonicalization (NamedLambdaVariable ids never
    // canonicalize equal), so ReuseExchange saw the df-cap aggregate
    // and the two self-join sides as distinct subtrees and the shingle
    // scan ran FOUR times per query. With the lambda-free subtree and
    // ONE explicit repartition(bg), all three consumers share a single
    // reused exchange: one shingle scan, one posting shuffle — the
    // same bytes a sort-merge self-join must move at 100 TB anyway
    // (the previous shape only avoided the shuffle while the planner
    // could broadcast a full posting side, which is a sub-10MB-estimate
    // local-mode accident, not a scale plan).
    // explode_outer + isnotnull(g): plain explode of an attribute makes
    // InferFiltersFromGenerate push `size(trigram_shingles(..)) > 0`
    // into the SCAN (the whole shingle chain re-evaluated per row in
    // the scan filter — the documented size()>0-guard trap); the outer
    // generate infers nothing, and the null filter sits on the
    // generator OUTPUT where it cannot be pushed below the Generate.
    // Empty-shingle docs emit one g=null row, dropped here — row set
    // identical to the inner explode.
    val post = docs.select(col("doc_id"), explode_outer(col("sh")).as("g"),
        size(col("sh")).as("sz"))
      .filter(col("g").isNotNull)
      .select(col("doc_id"), xxhash64(col("g")).as("bg"), col("sz"))
      .persist()
    val ex = dfCapped(post, "bg", DfCap).repartition(col("bg"))
    val pairs = ex.as("a")
      .join(ex.as("b"),
        col("a.bg") === col("b.bg") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"),
        first(col("a.sz")).as("sz_a"), first(col("b.sz")).as("sz_b"))
    val jac = col("inter").cast("double") /
      (col("sz_a") + col("sz_b") - col("inter"))
    pairs
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
  }

  /** Posting-list co-occurrence count (inverted-index join rows BEFORE
    * the pair aggregate) for dedup_ngram_jaccard — the canary probe's
    * measure of how the df cap behaves under planted dense clusters: a
    * 1000-member near-identical cluster pushes every shared gram's df
    * to ~1000 ≫ DfCap, so dfCapped DROPS those postings and the
    * detector goes (deliberately, and now measurably) blind to the
    * cluster — the cost trade the cap buys; MinHash, with no df cap,
    * is the detector that owns dense clusters. */
  private[graft] def ngramMeetings(s: SparkSession, dir: String): Long = {
    val docs = docShingles(s, dir, requireNonEmpty = false)
    // lambda-free posting subtree + one repartition(bg) shared via
    // ReuseExchange — same restructure as jaccardPairs above
    val ex = dfCapped(
      docs.select(col("doc_id"), explode_outer(col("sh")).as("g"))
        .filter(col("g").isNotNull)
        .select(col("doc_id"), xxhash64(col("g")).as("bg"))
        .repartition(col("bg")),
      "bg", DfCap)
    ex.as("a")
      .join(ex.as("b"),
        col("a.bg") === col("b.bg") && col("a.doc_id") < col("b.doc_id"))
      .count()
  }

  /** Connected components of an undirected pair graph: per round, (1) min
    * over neighbor labels, then (2) pointer-jump lbl := label(lbl). Plain
    * propagation alone needs O(diameter) rounds — a long duplicate CHAIN
    * at scale would blow any fixed cap; the jump step doubles the label
    * horizon per round, giving O(log n) convergence. Fails loudly (never
    * silently-wrong labels) if the cap is somehow hit. Returns (doc, lbl)
    * where lbl = component id = min member. */
  /** Rows of the label frame one loop task should own: low enough that a
    * billion-row pair graph fans out to thousands of partitions, high
    * enough that the sf0.01 graph (hundreds of rows) stays at the 8-task
    * floor where per-round task-launch overhead would otherwise dominate
    * the 3 shuffles × O(log n) rounds. */
  private val RowsPerLoopTask = 1000000L

  private[graft] def components(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    // Materialize the symmetric edge list at the CALLER's shuffle width
    // (it consumes the expensive candidate-pair stream), then size the
    // loop's width from the MEASURED edge count — the label frames are
    // one row per doc in the pair graph, so width = edges/RowsPerLoopTask
    // (floor 8) keeps loop-task overhead negligible locally yet widens
    // with the data instead of funnelling a 100 TB pair graph through a
    // fixed-8 bottleneck. The count is free: `.truncated` has already
    // materialized the frame.
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst").truncated
    // withLoopWidth pins AQE's initialPartitionNum too — a session-wide
    // harness value would otherwise override the measured width.
    val loopWidth = math.max(8L, edges.count() / RowsPerLoopTask)
    Tables.withLoopWidth(s, loopWidth)(componentsLoop(edges))
  }

  /** Resolve every node of a parent-pointer FOREST to its root by
    * pointer doubling: input (m, p) with p = m exactly at roots (an
    * ingest-verdict chain always terminates — each verdict points at a
    * strictly earlier arrival). Each round substitutes p := f(p) using
    * the ALREADY-jumped frame on both sides, so the chased horizon
    * doubles per round — O(log depth) rounds of two shuffles, the same
    * convergence class as [[components]], with the same loud failure if
    * the cap is somehow hit (a cycle — impossible for arrival-ordered
    * verdicts — would spin forever otherwise). Consumer: the media
    * tier's incremental keepers (multimodal_phash_keepers_incremental),
    * which resolves each item's retained representative from the
    * manifest-committed verdict forest. */
  private[graft] def resolveRoots(par0: DataFrame): DataFrame = {
    val s = par0.sparkSession
    val par = par0.select(col("m"), col("p")).truncated
    val loopWidth = math.max(8L, par.count() / RowsPerLoopTask)
    Tables.withLoopWidth(s, loopWidth) {
      var f = par
      var changed = 1L
      var iter = 0
      val maxIters = 64
      while (changed > 0 && iter < maxIters) {
        // total join: every p is itself a node of the forest (roots
        // self-map), so the jump lookup never drops a row
        val nxt = f.as("a")
          .join(f.select(col("m").as("jm"), col("p").as("jp")),
            col("a.p") === col("jm"))
          .select(col("a.m").as("m"), col("a.p").as("old"),
            col("jp").as("p"))
          .truncated
        changed = nxt.filter(col("p") =!= col("old")).count()
        f = nxt.drop("old")
        iter += 1
      }
      if (changed > 0) {
        throw new IllegalStateException(
          s"root resolution did not converge in $maxIters rounds")
      }
      f
    }
  }

  private def componentsLoop(edges: DataFrame): DataFrame = {
    // localCheckpoint (not persist): each round joins the previous labels
    // against themselves, so WITHOUT lineage truncation the logical plan
    // doubles per round and the driver OOMs just printing it. Checkpoint
    // materializes the round's result and cuts the plan back to a leaf —
    // the standard shape for iterative DataFrame algorithms.
    var labels = edges.select(col("src").as("doc")).distinct()
      .withColumn("lbl", col("doc")).truncated
    // Self-loop edges fold the propagate step into the neighbor-min
    // aggregate (round-16 optimization): min over neighbors ∪ self IS
    // least(own, neighbor min) and is total (every node has its self
    // edge), so the per-round labels⋈nbrMin left join disappears — two
    // joins per round instead of three, identical per-round label
    // frames by construction.
    // no .truncated: both union inputs are already checkpointed, the
    // union is trivial lineage — a third materialized copy of the edge
    // frame costs more than it saves
    val selfEdges = edges
      .union(labels.select(col("doc").as("src"), col("doc").as("dst")))
    // Convergence via the label-sum delta instead of a carried old
    // column: labels are non-increasing (least of previous labels), so
    // the DECIMAL(38,0)-exact sum is strictly decreasing until the
    // fixed point — same termination round as the per-row comparison.
    def lblSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("lbl").cast("decimal(38,0)"))).first()
      if (v.isNullAt(0)) java.math.BigDecimal.ZERO else v.getDecimal(0)
    }
    var prevSum = lblSum(labels)
    var changed = true
    var iter = 0
    val maxIters = 64 // O(log n) rounds with pointer jumping; wide margin
    while (changed && iter < maxIters) {
      val propagated = selfEdges
        .join(labels.withColumnRenamed("doc", "dst2"), col("dst") === col("dst2"))
        .groupBy(col("src").as("doc"))
        .agg(min("lbl").as("lbl"))
      // pointer jump: a label is always itself a member doc, so its own
      // (smaller-or-equal) label is defined; inner join is total
      val next = propagated.as("p")
        .join(propagated.select(col("doc").as("pj_doc"), col("lbl").as("pj_lbl")),
          col("p.lbl") === col("pj_doc"))
        .select(col("p.doc").as("doc"),
          least(col("p.lbl"), col("pj_lbl")).as("lbl"))
        .truncated
      val curSum = lblSum(next)
      changed = curSum.compareTo(prevSum) != 0
      prevSum = curSum
      labels = next
      iter += 1
    }
    if (changed) {
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds")
    }
    labels
  }

  /** DuckDB fragment for the same pairs (expects `docs` CTE in scope). */
  private def jaccardPairsSql(threshold: Double) = s"""
    ex0 AS (SELECT doc_id, unnest(sh) AS bg FROM docs),
    ex AS (SELECT * FROM ex0 WHERE bg NOT IN
             (SELECT bg FROM ex0 GROUP BY bg HAVING count(*) > $DfCap)),
    rawpairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM ex a JOIN ex b ON a.bg = b.bg AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM docs),
    pairs AS (
      SELECT id_a, id_b,
             round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6)
               AS jaccard
      FROM rawpairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= $threshold)"""

  /** Window width (tokens) for substring-span dedup: every repeated run
    * of ≥ SpanK tokens is detected; shorter repeats are ignored. 8 is
    * small enough that the sf0.01 corpus contains real repeats and large
    * enough that common short phrases don't mark everything (production
    * uses ~50, Lee et al. 2021 — the plan is width-independent). */
  private val SpanK = 8

  val all: Seq[Q] = Seq(

    // ---- exact dedup: one hash-aggregate on the full text ----
    Q(
      "dedup_exact",
      Some("""
        SELECT text, CAST(count(*) AS BIGINT) AS n,
               CAST(min(doc_id) AS BIGINT) AS keeper
        FROM documents GROUP BY text ORDER BY keeper"""),
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy("text")
          .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
          .orderBy("keeper")),

    // ---- exact dedup by digest: group on md5 of normalized content (the
    // scale pattern when the payload is huge — shuffle 16-byte keys, not
    // documents) ----
    Q(
      "dedup_exact_hash",
      Some("""
        SELECT md5(trim(text)) AS digest, CAST(count(*) AS BIGINT) AS n,
               CAST(min(doc_id) AS BIGINT) AS keeper
        FROM documents GROUP BY 1 ORDER BY keeper"""),
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(trim(col("text")).cast("binary")).as("digest"))
          .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
          .orderBy("keeper")),

    // ---- near-dup: exact trigram-set Jaccard, candidates from an
    // inverted-index equi-join on shared shingles (no all-pairs; the
    // posting-list join key is an 8-byte xxhash64, and the per-doc size
    // dim broadcasts into the pair stream) ----
    Q(
      "dedup_ngram_jaccard",
      Some(s"""
        WITH docs AS ($docShinglesSql),
        ${jaccardPairsSql(0.2)}
        SELECT id_a, id_b, jaccard FROM pairs
        ORDER BY id_a, id_b"""),
      (s, dir) =>
        jaccardPairs(s, dir, 0.2).orderBy("id_a", "id_b")),

    // ---- duplicate-cluster resolution: connected components over the
    // near-dup pair graph by iterative min-label propagation (the BSP
    // pattern — O(log diameter) joined passes, no driver-side graph),
    // then keeper = min doc_id per component. Oracle = transitive
    // closure via DuckDB's recursive CTE. ----
    Q(
      "dedup_cluster_keepers",
      Some(s"""
        WITH RECURSIVE docs AS ($docShinglesSql),
        ${jaccardPairsSql(0.2)},
        edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        nodes AS (SELECT DISTINCT a AS doc FROM edges),
        reach(a, b) AS (
          SELECT doc, doc FROM nodes
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS component,
               a = min(b) AS is_keeper
        FROM reach GROUP BY a ORDER BY doc_id"""),
      (s, dir) =>
        components(jaccardPairs(s, dir, 0.2))
          .select(col("doc").as("doc_id"), col("lbl").as("component"),
            (col("doc") === col("lbl")).as("is_keeper"))
          .orderBy("doc_id")),

    // ---- MinHash (16 perms) + LSH banding (4 bands × 4) → candidate
    // equi-join on (band, band-hash) → exact Jaccard verify. Every hash in
    // the pipeline is md5-derived (shingle hash = 48 md5 bits mod 1000003,
    // band key = md5 of the signature slice), so the ENTIRE pipeline —
    // signatures, banding, candidate set, final pairs — replays exactly in
    // DuckDB and the row is hash-oracled, not allowlisted. DedupSpec
    // additionally pins recall against dedup_ngram_jaccard and the
    // no-cartesian plan. ----
    Q(
      "dedup_minhash_lsh",
      Some(s"""
        $minhashPairsCtesSql
        SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b"""),
      (s, dir) => minhashPairs(s, dir).orderBy("id_a", "id_b")),

    // ---- incremental MinHash index with ingest-time verdicts: the
    // ONLINE form of the detector above. Documents arrive in batches
    // (doc_id % 3 — the batch convention curate_dsir_incremental set);
    // the engine maintains a persisted band-postings index and each
    // arriving doc is verdicted against everything that arrived BEFORE
    // it (earlier batch, or same batch with a lower id) — a verdict is
    // emitted once at ingest and never revised, which is what lets the
    // streaming form run in append mode. NON-cascading by design: a
    // doc that was itself flagged still enters the index (production
    // pipelines index all seen docs so whole duplicate FAMILIES keep
    // resolving to one blocker; the cascade variant — only keepers
    // index — is dedup_cluster_keepers' connected components). The
    // registered body is the batch-decomposed computation: the global
    // gated pair set (batching-invariant — each unordered pair meets
    // exactly once in its minimal agreeing band regardless of which
    // batch discovered it) directed by arrival order, then a min_by
    // hash aggregate picks the earliest blocker. Arrival order is ONE
    // scalar BIGINT key (batch · 2⁴⁰ + doc_id): min_by over a scalar
    // stays a hash aggregate — a struct ordering key would silently
    // plan as SortAggregate (the dedup_semantic_cells lesson).
    // StreamsSpec pins Trigger.AvailableNow parity: a real file-source
    // foreachBatch run maintaining the postings index in parquet
    // reproduces this frame exactly. Scale: per-day cost is the
    // day's-batch × persisted-index band equi-join (the postings are
    // bucketed by band key at 100 TB), never a whole-corpus rescan. ----
    Q(
      "dedup_minhash_incremental",
      Some(s"""
        $minhashPairsCtesSql,
        arr AS (SELECT doc_id,
                       (doc_id % 3) * 1099511627776 + doc_id AS akey
                FROM documents),
        dirn AS (
          SELECT CASE WHEN a.akey < b.akey THEN p.id_b ELSE p.id_a END
                   AS doc,
                 CASE WHEN a.akey < b.akey THEN p.id_a ELSE p.id_b END
                   AS blocker,
                 CASE WHEN a.akey < b.akey THEN a.akey ELSE b.akey END
                   AS bakey
          FROM pairs p
          JOIN arr a ON a.doc_id = p.id_a
          JOIN arr b ON b.doc_id = p.id_b),
        v AS (SELECT doc, arg_min(blocker, bakey) AS near_dup_of
              FROM dirn GROUP BY doc)
        SELECT d.doc_id, CAST(d.doc_id % 3 AS BIGINT) AS batch,
               CAST(v.near_dup_of AS BIGINT) AS near_dup_of,
               v.near_dup_of IS NULL AS is_novel
        FROM documents d LEFT JOIN v ON v.doc = d.doc_id
        ORDER BY d.doc_id"""),
      (s, dir) => {
        val v = minhashArrivalVerdicts(s, dir)
        t(s, dir, "documents")
          .select(col("doc_id"), pmod(col("doc_id"), lit(3L)).as("batch"))
          .join(v, col("doc_id") === col("doc"), "left")
          .select(col("doc_id"), col("batch"), col("near_dup_of"),
            col("near_dup_of").isNull.as("is_novel"))
          .orderBy("doc_id")
      }),

    // ---- incremental TEXT keepers: the verdict-forest consumer for
    // the text tier (round-16, mirroring the media tier's
    // multimodal_phash_keepers_incremental — every continuous-ingest
    // tier now has its drop-list consumer). rep(d) = d if novel else
    // rep(near_dup_of(d)): pointer-doubled root resolution over the
    // ingest-verdict forest (Dedup.resolveRoots), the ONLINE
    // clustering semantic — representatives never revised, a late
    // bridge doc joins ONE existing cluster rather than merging two
    // (dedup_cluster_keepers' connected components is the batch
    // re-clustering that WOULD merge them; registering both makes the
    // trade inspectable). Oracle chases the same forest with a
    // recursive CTE. Scale: state is one (m, p) row per doc, the
    // resolve shuffles ids only — never signatures or the pair graph. ----
    Q(
      "dedup_minhash_keepers_incremental",
      Some(s"""
        ${minhashPairsCtesSql.replaceFirst("WITH", "WITH RECURSIVE")},
        arr AS (SELECT doc_id,
                       (doc_id % 3) * 1099511627776 + doc_id AS akey
                FROM documents),
        dirn AS (
          SELECT CASE WHEN a.akey < b.akey THEN p.id_b ELSE p.id_a END
                   AS doc,
                 CASE WHEN a.akey < b.akey THEN p.id_a ELSE p.id_b END
                   AS blocker,
                 CASE WHEN a.akey < b.akey THEN a.akey ELSE b.akey END
                   AS bakey
          FROM pairs p
          JOIN arr a ON a.doc_id = p.id_a
          JOIN arr b ON b.doc_id = p.id_b),
        v AS (SELECT doc, arg_min(blocker, bakey) AS near_dup_of
              FROM dirn GROUP BY doc),
        par AS (SELECT d.doc_id AS m,
                       coalesce(v.near_dup_of, d.doc_id) AS p
                FROM documents d LEFT JOIN v ON v.doc = d.doc_id),
        chase(m, p) AS (
          SELECT m, p FROM par
          UNION
          SELECT c.m, pr.p FROM chase c
          JOIN par pr ON pr.m = c.p AND pr.p <> c.p)
        SELECT c.m AS doc_id, CAST(c.p AS BIGINT) AS keeper_id,
               c.m = c.p AS is_keeper
        FROM chase c JOIN par rp ON rp.m = c.p AND rp.p = c.p
        ORDER BY doc_id"""),
      (s, dir) => {
        val v = minhashArrivalVerdicts(s, dir)
        val par = t(s, dir, "documents")
          .join(v, col("doc_id") === col("doc"), "left")
          .select(col("doc_id").as("m"),
            coalesce(col("near_dup_of"), col("doc_id")).as("p"))
        resolveRoots(par)
          .select(col("m").as("doc_id"), col("p").as("keeper_id"),
            (col("m") === col("p")).as("is_keeper"))
          .orderBy("doc_id")
      }),

    // ---- embedding-cosine near-dup: hyperplane-LSH candidate buckets →
    // exact cosine ≥ 0.95 verify. The testdata has no natural near-dups
    // (max pairwise cosine ≈ 0.51/0.60 at sf0.01/0.1), so the query
    // plants deterministic canary duplicates first — the standard way a
    // production dedup pipeline validates itself end-to-end: each
    // vec_id % 5 == 0 row gets a copy (id + 10^7) with its tail half
    // scaled by 1 + (id%7+1)/4, yielding planted pairs spanning cosine
    // ~0.90–0.9999 so the 0.95 threshold cuts through the middle.
    // Because the verify step is EXACT, the LSH stage only affects
    // recall; 24 tables × 8 sign bits gives per-pair miss ≤ 1e-6 at
    // the threshold angle (18°), so the result equals the exact pair
    // set and a DuckDB all-pairs oracle checks it (verified at sf0.01
    // AND sf0.1 — 16 tables deterministically missed one 0.9518 pair). Candidate volume is
    // bucket-bound (equi-join, no cartesian): near-orthogonal non-dup
    // pairs collide at ~1/256 per table; production data with tighter
    // dup clusters would raise `bits` with log(N) to keep buckets small.
    Q(
      "dedup_embedding_cosine",
      Some("""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        planted AS (
          SELECT orig_id + 10000000 AS vec_id,
                 list_concat(vec[1:32],
                   list_transform(vec[33:], x -> x * m)) AS vec
          FROM (SELECT vec_id AS orig_id, vec,
                       1.0 + (vec_id % 7 + 1) * 0.25 AS m
                FROM base WHERE vec_id % 5 = 0)),
        allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
                     round(list_cosine_similarity(x.vec, y.vec), 6) AS cos_sim
              FROM allv x JOIN allv y ON x.vec_id < y.vec_id)
        SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.95
        ORDER BY id_a, id_b"""),
      (s, dir) => {
        import graft.functions.VectorExprs
        // VERIFY INSIDE THE BUCKET JOIN. The vectors ride the bucket
        // frame (N × tables rows, one 64-dim array each — bounded and
        // linear in N) and the exact cosine filter sits directly in the
        // join projection, so candidate PAIRS are never materialized to
        // a shuffle: they stream through the codegen'd join stage and
        // only survivors (≈ true pairs × table multiplicity) reach the
        // distinct. The previous id-only-candidates + re-attach design
        // inverted this — with dense duplicate clusters the distinct
        // pair set times two 520-byte vectors is quadratic-in-cluster
        // traffic (measured: ~169M candidate occurrences at 240k
        // vectors filled 77 GB of spill and killed the job; the bucket
        // frame here is 15M rows ≈ 8 GB). Per-occurrence cosine evals
        // cost more FLOPs, but FLOPs in a codegen pipeline are cheap;
        // shuffled bytes are not. Corpus construction + N-adaptive LSH
        // sizing live in embBucketFrame/embLshConfig (shared with the
        // ScaleStress candidate-occurrence probe).
        val buckets = embBucketFrame(s, dir)
        buckets.as("x")
          .join(buckets.as("y"),
            col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .withColumn("cos_sim",
            round(VectorExprs.cosine(s, col("x.vec"), col("y.vec")), 6))
          .filter(col("cos_sim") >= 0.95)
          .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
            col("cos_sim"))
          .distinct()
          .orderBy("id_a", "id_b")
      }),

    // ---- semantic dedup via cluster partitioning (the SemDeDup scale
    // path — Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    // web-scale through semantic deduplication": cluster the embedding
    // space, then look for duplicates ONLY within a cluster). The other
    // decomposition of the same problem dedup_embedding_cosine solves
    // with hyperplane-LSH: here a deterministic coarse quantizer (the
    // k lowest-id base vectors as cell centroids — the sim_ivf_probe
    // quantizer, k N-adaptive via semCellCount, pinned 16 at oracled
    // dirs) partitions the corpus, and the exact-cosine pairing runs
    // as a cell-partitioned self-join — ONE equi-join shuffle on the
    // cell id, quadratic only within a cell, never across cells.
    // At 100 TB this is the decomposition that needs NO per-vector
    // table explosion (LSH pays N×tables bucket rows; SemDeDup pays
    // N×k broadcast-join cosines with k ∝ N/target-occupancy — the
    // paper runs k≈100k on billions of embeddings).
    // The deliberate recall trade, visible in the oracle: pairs whose
    // members quantize into DIFFERENT cells are invisible (DedupSpec
    // pins measured cell-recall vs the LSH detector's pair set on the
    // same planted corpus). Assignment is a single codegen projection:
    // the codebook collapses to ONE broadcast row (collect_list of the
    // k centroids) and a native nearest_centroid expression does the
    // argmax per input row — the previous max_by-over-cross-join form
    // looked like a hash aggregate but was silently planned as
    // SortAggregate (max_by's struct ordering buffer is not
    // UnsafeRow-mutable, so HashAggregateExec refuses it), sorting the
    // full N×k exploded stream: 33 GB of measured sort spill at the
    // 100× corpus. With the expression no N×k stream exists — the only
    // shuffle in the whole query is the cell self-join's. ----
    Q(
      "dedup_semantic_cells",
      Some(s"""
        WITH $semCellPairsCtesSql
        SELECT CAST(cell AS BIGINT) AS cell, id_a, id_b, cos_sim
        FROM p WHERE cos_sim >= 0.95 ORDER BY cell, id_a, id_b"""),
      (s, dir) => {
        // footer-sized like embLshConfig: order-of-magnitude N at
        // plan-construction time, no Spark job (EXPLAIN stays job-free)
        val k = semCellCount(
          Tables.footerRowCount(s, s"$dir/embeddings.parquet") * 6 / 5)
        // the oracle SQL hardcodes 16 centroids (the SemCellsPinnedN
        // regime); if an oracle-dump run ever points at a dir where the
        // N-adaptive count diverges, fail loudly instead of letting the
        // two sides partition differently into a confusing hash mismatch
        if (sys.props.get("graft.oracle.run").contains("true"))
          require(k == 16,
            s"dedup_semantic_cells: oracle SQL pins 16 centroids but " +
              s"semCellCount gave $k for $dir — pinned-config violation")
        semCellPairs(s, dir, k)
      }),

    // ---- incremental IVF index with ingest-time verdicts: the
    // embedding-side counterpart of dedup_minhash_incremental. Vectors
    // arrive in batches (vec_id % 3); the engine maintains a persisted
    // IVF postings index — (vec_id, cell, vec) inverted lists under the
    // frozen coarse quantizer (production IVF trains its quantizer
    // offline and freezes it; here the pinned lowest-id-centroid rule,
    // k N-adaptive via semCellCount) — and each arriving vector is
    // verdicted against everything that arrived BEFORE it: same cell,
    // exact cosine ≥ 0.95. A verdict is final at ingest (append-mode
    // semantics, nothing revised); the directing key is the ONE scalar
    // BIGINT arrival key (batch · 2⁴⁰ + vec_id), so min_by stays a hash
    // aggregate. The registered body is the batch-decomposed
    // computation: the global within-cell pair set (batching-invariant)
    // directed by arrival order. ivfIndexIngest is the REAL streaming
    // form — StreamsSpec pins Trigger.AvailableNow parity and
    // order-independence under scrambled file mtimes. Scale: per-batch
    // cost is batch × same-cell postings (the lists are partitioned by
    // cell at 100 TB), never a whole-corpus rescan; the quantizer
    // argmax is one broadcast codebook row per scan. ----
    Q(
      "sim_ivf_incremental",
      Some(s"""
        WITH $semCellPairsCtesSql,
        pairs AS (SELECT id_a, id_b FROM p WHERE cos_sim >= 0.95),
        arr AS (SELECT vec_id,
                       (vec_id % 3) * 1099511627776 + vec_id AS akey
                FROM allv),
        dirn AS (
          SELECT CASE WHEN a.akey < b.akey THEN pr.id_b ELSE pr.id_a END
                   AS doc,
                 CASE WHEN a.akey < b.akey THEN pr.id_a ELSE pr.id_b END
                   AS blocker,
                 CASE WHEN a.akey < b.akey THEN a.akey ELSE b.akey END
                   AS bakey
          FROM pairs pr
          JOIN arr a ON a.vec_id = pr.id_a
          JOIN arr b ON b.vec_id = pr.id_b),
        v AS (SELECT doc, arg_min(blocker, bakey) AS near_dup_of
              FROM dirn GROUP BY doc)
        SELECT al.vec_id, CAST(al.vec_id % 3 AS BIGINT) AS batch,
               CAST(v.near_dup_of AS BIGINT) AS near_dup_of,
               v.near_dup_of IS NULL AS is_novel
        FROM allv al LEFT JOIN v ON v.doc = al.vec_id
        ORDER BY al.vec_id"""),
      (s, dir) => {
        val k = semCellCount(
          Tables.footerRowCount(s, s"$dir/embeddings.parquet") * 6 / 5)
        if (sys.props.get("graft.oracle.run").contains("true"))
          require(k == 16,
            s"sim_ivf_incremental: oracle SQL pins 16 centroids but " +
              s"semCellCount gave $k for $dir — pinned-config violation")
        val pairs = semCellPairs(s, dir, k)
          .select(col("id_a"), col("id_b"))
        def akey(c: Column): Column =
          pmod(c, lit(3L)) * lit(1099511627776L) + c
        val dirn = pairs
          .select(col("id_a"), col("id_b"),
            akey(col("id_a")).as("akey_a"), akey(col("id_b")).as("akey_b"))
          .select(
            when(col("akey_a") < col("akey_b"), col("id_b"))
              .otherwise(col("id_a")).as("doc"),
            when(col("akey_a") < col("akey_b"), col("id_a"))
              .otherwise(col("id_b")).as("blocker"),
            least(col("akey_a"), col("akey_b")).as("bakey"))
        val v = dirn.groupBy("doc")
          .agg(min_by(col("blocker"), col("bakey")).as("near_dup_of"))
        embPlantedCorpus(s, dir)
          .select(col("vec_id"), pmod(col("vec_id"), lit(3L)).as("batch"))
          .join(v, col("vec_id") === col("doc"), "left")
          .select(col("vec_id"), col("batch"), col("near_dup_of"),
            col("near_dup_of").isNull.as("is_novel"))
          .orderBy("vec_id")
      }),

    // ---- the SemDeDup PRODUCTION composition (round-12 verdict task
    // 8): coarse quantizer → within-cell LSH candidate generation →
    // exact-cosine verify on within-cell candidates. The two standalone
    // detectors each carry one half of the scale argument — cells bound
    // WHERE pairs may form (precision 1.0 by exact verify, the measured
    // recall trade), LSH bounds HOW MANY candidates stream through a
    // cell (a dense cell's quadratic occupancy² pair stream becomes
    // bucket-level) — and this query composes them: the self-join key
    // is (cell, tbl, bucket), so candidate volume is bounded by BOTH
    // partitions at once. Since round 14 stage 2 is OCCUPANCY-GATED per
    // cell (round-13 verdict task 1): the regime probe measured the
    // unconditional composition costing 1.56× at the tuned quantizer
    // and winning 2.3× at a misfit one, so sparse cells (occ ≤
    // TwoStageOccupancyGate) take the direct exact join and only dense
    // cells pay the bucket frame — heterogeneous corpora get both
    // regimes in ONE run. Because the exact verify and the 24-table ×
    // per-pair miss ≤ 1e-6 LSH recall bound make the candidate stage
    // lossless at the 0.95 threshold (the dedup_embedding_cosine
    // argument, verified at both oracled SFs), the confirmed pair set
    // EQUALS the within-cell exact pair set at EVERY gate value and the
    // semantic-cells oracle grades it row-for-row — output equality IS
    // the composition's precision-1.0 property; what changes is the
    // cost curve, measured at 10×/100× in ScaleStress. ----
    Q(
      "dedup_semantic_two_stage",
      Some(s"""
        WITH $semCellPairsCtesSql
        SELECT CAST(cell AS BIGINT) AS cell, id_a, id_b, cos_sim
        FROM p WHERE cos_sim >= 0.95 ORDER BY cell, id_a, id_b"""),
      (s, dir) => {
        val n = Tables.footerRowCount(s, s"$dir/embeddings.parquet") * 6 / 5
        val k = semCellCount(n)
        if (sys.props.get("graft.oracle.run").contains("true"))
          require(k == 16,
            s"dedup_semantic_two_stage: oracle SQL pins 16 centroids " +
              s"but semCellCount gave $k for $dir — pinned-config violation")
        semCellTwoStagePairs(s, dir, k)
      }),

    // ---- the composed training-data curation pipeline: quality gate →
    // exact dedup (keep min doc_id per text) → near-dup removal (keep
    // only cluster keepers) → per-doc token stats. One declarative plan:
    // two hash shuffles + the pair-graph resolution, no driver loops
    // except the O(log n) component iteration. ----
    Q(
      "pipeline_training_data",
      Some(s"""
        WITH RECURSIVE docs AS ($docShinglesSql),
        ${jaccardPairsSql(0.2)},
        edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        nodes AS (SELECT DISTINCT a AS doc FROM edges),
        reach(a, b) AS (
          SELECT doc, doc FROM nodes
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
        near_dup_losers AS (SELECT doc_id FROM comp WHERE doc_id <> component),
        toks AS (
          SELECT doc_id, text,
                 list_filter(string_split(text, ' '), x -> x <> '') AS ts
          FROM documents),
        quality AS (
          SELECT doc_id, text, len(ts) AS n_tokens,
                 CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts)
                   AS distinct_ratio
          FROM toks WHERE len(ts) >= 5),
        exact_kept AS (
          SELECT min(doc_id) AS doc_id FROM quality GROUP BY text)
        SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
               round(q.distinct_ratio, 4) AS distinct_ratio
        FROM quality q
        JOIN exact_kept k ON q.doc_id = k.doc_id
        WHERE q.doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
        ORDER BY q.doc_id"""),
      (s, dir) => {
        // near-dup losers: non-keeper members of pair-graph components
        val losers = components(jaccardPairs(s, dir, 0.2))
          .filter(col("doc") =!= col("lbl"))
          .select(col("doc").as("loser_id"))
        // quality gate + token stats
        val quality = t(s, dir, "documents")
          .select(col("doc_id"), col("text"), tokens(col("text")).as("ts"))
          .filter(size(col("ts")) >= 5)
          .select(col("doc_id"), col("text"),
            size(col("ts")).cast("long").as("n_tokens"),
            (size(array_distinct(col("ts"))).cast("double") / size(col("ts")))
              .as("distinct_ratio"))
        // exact dedup: keep min doc_id per text
        val keepers = quality.groupBy("text")
          .agg(min("doc_id").as("keep_id"))
          .select(col("keep_id").as("doc_id"))
        quality
          .join(keepers, "doc_id")
          // losers is per-doc (unbounded at scale) — keyed anti-join, no
          // broadcast hint; AQE broadcasts when it is actually small
          .join(losers, col("doc_id") === col("loser_id"), "left_anti")
          .select(col("doc_id"), col("n_tokens"),
            round(col("distinct_ratio"), 4).as("distinct_ratio"))
          .orderBy("doc_id")
      }),

    // ---- fuzzy entity-resolution join (edit distance <= 1) via
    // DELETION-NEIGHBORHOOD BLOCKING: each string generates itself plus
    // its |s| single-deletion variants as blocking keys; any pair within
    // edit distance 1 provably shares a key (substitution → same
    // deletion position; insert/delete → the shorter string itself), so
    // an equi-join on the key + an exact levenshtein re-filter finds
    // every pair with |s|+1 keys per row instead of an all-pairs scan —
    // at 100 TB the blocking join shuffles O(n·|s|) short keys where the
    // naive form compares n². The oracle IS the naive form (exact at
    // test scale), so the blocking is verified complete, not just
    // plausible. ----
    Q(
      "dedup_fuzzy_name_join",
      Some("""
        WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer
                   WHERE c_nationkey = 0)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM c a JOIN c b ON a.id < b.id AND levenshtein(a.s, b.s) <= 1
        ORDER BY id_a, id_b"""),
      (s, dir) => {
        val base = t(s, dir, "customer")
          .filter(col("c_nationkey") === 0)
          .select(col("c_custkey").as("id"), col("c_name").as("s"))
        // lambda-free key stream (r17): explode the deletion position and
        // build each key with plain substr arithmetic — i == length(s)
        // degenerates to the identity key (prefix = s, suffix = ""), so
        // one sequence covers {s} ∪ deletions. The transform-lambda
        // spelling blocked plan canonicalization (NamedLambdaVariable ids
        // never canonicalize equal), so the two self-join sides each
        // recomputed the key stream instead of sharing one exchange.
        // Per-row key dedup without array_union: deletions collide
        // exactly within a run of equal adjacent chars, so keeping only
        // the FIRST deletion of each run (char[i-1] != char[i], 1-based
        // substr) reproduces the old array_union key set — measured
        // 1.15× without it (duplicate keys inflate the candidate join).
        val keys = base.select(col("id"), col("s"),
          explode(sequence(lit(0), length(col("s")))).as("i"))
          .filter(col("i") === 0 ||
            col("s").substr(col("i"), lit(1)) =!=
              col("s").substr(col("i") + 1, lit(1)))
          .select(col("id"), col("s"),
            concat(col("s").substr(lit(1), col("i")),
              col("s").substr(col("i") + 2, length(col("s")))).as("k"))
        keys.as("a")
          .join(keys.as("b"),
            col("a.k") === col("b.k") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.s").as("sa"), col("b.s").as("sb"))
          .distinct()
          .filter(levenshtein(col("sa"), col("sb")) <= 1)
          .select(col("id_a"), col("id_b"),
            levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
          .orderBy("id_a", "id_b")
      }),

    // ---- SimHash: 32-bit signature from token hashes (bit-majority).
    // Token hash = first 32 md5 bits, so every signature replays exactly
    // in DuckDB (positional hex arithmetic — no conv() there) and the row
    // is hash-oracled; DedupSpec still pins determinism + locality. ----
    Q(
      "dedup_simhash",
      Some {
        val bitSum = (0 until 32).map { j =>
          s"""CASE WHEN sum(CASE WHEN (v // ${1L << j}) % 2 = 1
                            THEN 1 ELSE -1 END) > 0
                  THEN ${1L << j} ELSE 0 END"""
        }.mkString(" + ")
        s"""
        WITH ex AS (
          SELECT doc_id,
                 unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS tok
          FROM documents),
        h AS (SELECT doc_id, ${duckHexToLong("md5(tok)", 8)} AS v FROM ex)
        SELECT doc_id, CAST($bitSum AS BIGINT) AS simhash
        FROM h GROUP BY doc_id ORDER BY doc_id"""
      },
      (s, dir) => {
        val ex = t(s, dir, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .withColumn("h",
            conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
        val bitAggs = (0 until 32).map(j =>
          sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
            .otherwise(-1)).as(s"b$j"))
        val sim = (0 until 32)
          .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _)
        ex.groupBy("doc_id")
          .agg(bitAggs.head, bitAggs.tail: _*)
          .select(col("doc_id"), sim.as("simhash"))
          .orderBy("doc_id")
      }),

    // ---- Incremental corpus dedup: the production shape — a NEW batch
    // (odd doc_ids stand in for today's crawl) deduped against the
    // EXISTING corpus (even doc_ids), never corpus×corpus. Exact layer:
    // md5 digest semi-join. Near layer: the same inverted-index trigram
    // join as dedup_ngram_jaccard, but the posting sides are disjoint
    // (incoming × existing), so the candidate volume is |batch| -bounded.
    // At 100 TB the existing side's postings are a persisted, bucketed
    // index the daily batch streams against — the joins here are exactly
    // that access pattern. Verdict per incoming doc: exact dup, near dup
    // (of whom), or novel. ----
    Q(
      "dedup_incremental_corpus",
      Some(s"""
        WITH alldocs AS ($docShinglesSql),
        ex AS (SELECT doc_id, unnest(sh) AS bg, len(sh) AS sz FROM alldocs),
        dig AS (SELECT doc_id, md5(text) AS dg FROM documents),
        exact AS (
          SELECT DISTINCT i.doc_id FROM dig i
          JOIN dig e ON i.dg = e.dg AND e.doc_id % 2 = 0
          WHERE i.doc_id % 2 = 1),
        rawpairs AS (
          SELECT a.doc_id AS inc_id, b.doc_id AS ex_id,
                 CAST(count(*) AS BIGINT) AS inter,
                 max(a.sz) AS sa, max(b.sz) AS sb
          FROM ex a JOIN ex b ON a.bg = b.bg
          WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          GROUP BY 1, 2),
        near AS (
          SELECT inc_id, min(ex_id) AS near_dup_of FROM rawpairs
          WHERE CAST(inter AS DOUBLE) / (sa + sb - inter) >= 0.2
          GROUP BY inc_id)
        SELECT d.doc_id, ex.doc_id IS NOT NULL AS is_exact_dup,
               CAST(n.near_dup_of AS BIGINT) AS near_dup_of,
               ex.doc_id IS NULL AND n.near_dup_of IS NULL AS is_novel
        FROM documents d
        LEFT JOIN exact ex ON ex.doc_id = d.doc_id
        LEFT JOIN near n ON n.inc_id = d.doc_id
        WHERE d.doc_id % 2 = 1
        ORDER BY d.doc_id"""),
      (s, dir) => {
        // requireNonEmpty=false: posts is the only consumer and explode
        // drops empty arrays itself (see docShingles scaladoc)
        val docsAll = docShingles(s, dir, requireNonEmpty = false)
        val posts = docsAll.select(col("doc_id"),
          explode(col("sh")).as("bg"), size(col("sh")).as("sz"))
        val dig = t(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("dg"))
        val exact = dig.filter(col("doc_id") % 2 === 1)
          .join(dig.filter(col("doc_id") % 2 === 0).select("dg").distinct(),
            Seq("dg"), "left_semi")
          .select(col("doc_id").as("exact_id"))
        val near = posts.filter(col("doc_id") % 2 === 1).as("a")
          .join(posts.filter(col("doc_id") % 2 === 0).as("b"),
            col("a.bg") === col("b.bg"))
          .groupBy(col("a.doc_id").as("inc_id"), col("b.doc_id").as("ex_id"))
          .agg(count(lit(1)).as("inter"),
            max(col("a.sz")).as("sa"), max(col("b.sz")).as("sb"))
          .filter(col("inter").cast("double") /
            (col("sa") + col("sb") - col("inter")) >= 0.2)
          .groupBy("inc_id").agg(min("ex_id").as("near_dup_of"))
        t(s, dir, "documents")
          .filter(col("doc_id") % 2 === 1)
          .select("doc_id")
          .join(exact, col("doc_id") === col("exact_id"), "left")
          .join(near, col("doc_id") === col("inc_id"), "left")
          .select(col("doc_id"),
            col("exact_id").isNotNull.as("is_exact_dup"),
            col("near_dup_of"),
            (col("exact_id").isNull && col("near_dup_of").isNull)
              .as("is_novel"))
          .orderBy("doc_id")
      }),

    // ---- substring-level dedup: maximal repeated token SPANS, the
    // exact-substring complement to the document-level detectors above
    // (the "remove every ≥k-token run that appears twice in the corpus"
    // operation of training-data dedup; suffix arrays do this exactly on
    // one machine — the distributed shape is fixed-k window hashes, which
    // detect every repeat of length ≥ k, then a per-doc interval merge
    // recovers maximal spans). Pipeline: (1) one md5 window hash per
    // token position (per-row HOF, no shuffle), (2) repeated windows via
    // groupBy(count>1) + equi-join back — shuffles carry (id, pos, 16-byte
    // hash), never text (md5 is the oracle-replay choice; at 100 TB the
    // key would be xxhash64, same plan), (3) gaps-and-islands merge under
    // a doc_id-partitioned window (bounded by max document length).
    // Within-doc repeats count toward the ≥2 occurrences, matching the
    // self-repetition removal of the suffix-array formulation. No pair
    // stream anywhere: output is per-doc spans, linear in corpus size. ----
    Q(
      "dedup_substring_spans",
      Some(s"""
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text, ' '), x -> x <> '')
                            AS ts
                   FROM documents),
        hs AS (SELECT doc_id,
                      list_transform(range(1, len(ts) - ${SpanK - 2}),
                        i -> md5(array_to_string(ts[i:i+${SpanK - 1}], ' ')))
                        AS whs
               FROM t WHERE len(ts) >= $SpanK),
        w AS (SELECT doc_id,
                     CAST(generate_subscripts(whs, 1) AS BIGINT) AS pos,
                     unnest(whs) AS wh
              FROM hs),
        d AS (SELECT wh FROM w GROUP BY wh HAVING count(*) > 1),
        m AS (SELECT w.doc_id, w.pos FROM w JOIN d USING (wh)),
        i AS (SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER
                            (PARTITION BY doc_id ORDER BY pos) <= $SpanK
                          THEN 0 ELSE 1 END AS brk
              FROM m),
        g AS (SELECT doc_id, pos,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
              FROM i)
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + ${SpanK - 1} AS BIGINT) AS span_end,
               CAST(max(pos) - min(pos) + $SpanK AS BIGINT) AS span_tokens
        FROM g GROUP BY doc_id, grp
        ORDER BY doc_id, span_start"""),
      (s, dir) => {
        val k = SpanK
        val wins = t(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("ts"))
          .filter(size(col("ts")) >= k)
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(1), size(col("ts")) - (k - 1)),
              i => md5(concat_ws(" ", slice(col("ts"), i, lit(k)))
                .cast("binary")))))
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
            col("col").as("wh"))
          // persisted: the repeated-window aggregate AND the join back
          // both consume this frame, and its lambda-bearing subtree
          // (tokens filter + per-position md5 transform) never
          // canonicalizes for exchange reuse — without the cache the
          // window-hash pass ran twice per query (round-16; the
          // map-side-combined dup aggregate stays, a window count over
          // wh would concentrate a viral span's rows on one task)
          .persist()
        val dup = wins.groupBy("wh").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).select("wh")
        val byDoc = Window.partitionBy("doc_id").orderBy("pos")
        wins.join(dup, Seq("wh"))
          .select("doc_id", "pos")
          .withColumn("brk",
            when(col("pos") - lag("pos", 1).over(byDoc) <= k, lit(0))
              .otherwise(lit(1)))
          .withColumn("grp", sum("brk").over(byDoc))
          .groupBy("doc_id", "grp")
          .agg(
            min("pos").cast("long").as("span_start"),
            (max("pos") + lit(k - 1)).cast("long").as("span_end"),
            (max("pos") - min("pos") + lit(k)).cast("long")
              .as("span_tokens"))
          .drop("grp")
          .orderBy("doc_id", "span_start")
      })
  )
}
