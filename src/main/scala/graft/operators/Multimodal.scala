package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule, Tables}

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, and a decode/feature-extract stage over partitioned batches.
  *
  * The container has no image/audio codecs, so [[MultimodalStub.decode]] is
  * a clearly-marked DETERMINISTIC FAKE — but everything Spark-side is real:
  * the binary column, the typed Dataset schema, the mapPartitions batch
  * shape (one decoder init per partition, the same pattern as an
  * mapInPandas/Arrow UDF), and the downstream relational handling of the
  * extracted features.
  */
object Multimodal extends QueryModule {

  /** Typed record produced by the decode stage. */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      width: Long,
      height: Long,
      mean_intensity: Double)

  object MultimodalStub {
    /** STUB: stands in for a real image decode (e.g. JPEG → WxH + pixel
      * stats). Deterministic in the bytes so tests and the oracle can pin
      * it: "width/height" derive from the byte length, "intensity" from a
      * byte-sum. A real deployment swaps ONLY this function.
      */
    def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
      val n = bytes.length.toLong
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xffL; i += 1 }
      MediaFeatures(
        doc_id = docId,
        byte_len = n,
        width = n % 64 + 1,
        height = n % 48 + 1,
        mean_intensity = if (n == 0) 0.0 else sum.toDouble / n)
    }

    /** The decode stage: binary column in, typed features out, one
      * "decoder" per partition (mirrors batch-init of a real codec).
      */
    def decodeStage(media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
      import media.sparkSession.implicits._
      media.mapPartitions { it =>
        // real codecs initialize per-partition state here
        it.map { case (id, bytes) => decode(id, bytes) }
      }
    }

    /** Block-mean perceptual hash over the stubbed "decode" output —
      * the blockhash structure a real image pipeline uses (Yang et al.,
      * "Block Mean Value Based Image Perceptual Hashing"): partition
      * the media into 64 blocks (here: byte positions mod 64 stand in
      * for an 8×8 downsampled intensity grid — a real deployment swaps
      * ONLY the block-intensity extraction), threshold each block's
      * intensity sum against the global mean (strict integer compare:
      * 64·blockSum > total — exactly replayable in the SQL oracle), and
      * pack the 64 bits into FOUR 16-bit slice values. A small local
      * edit perturbs few blocks, so near-identical media land within a
      * small Hamming distance — and any pair within Hamming ≤ 3 shares
      * at least one identical slice (pigeonhole over 4 slices), which
      * makes slice-equality blocking COMPLETE for the ≤3 verify. */
    def phashSlices(bytes: Array[Byte]): Array[Long] = {
      val v = new Array[Long](64)
      var tot = 0L
      var i = 0
      while (i < bytes.length) {
        val x = (bytes(i) & 0xff).toLong
        v(i % 64) += x
        tot += x
        i += 1
      }
      val s = new Array[Long](4)
      var c = 0
      while (c < 64) {
        if (v(c) * 64 > tot) s(c / 16) |= 1L << (c % 16)
        c += 1
      }
      s
    }
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** The pHash pipeline as DuckDB CTEs ending in `ppairs` (id_a, id_b,
    * hamming ≤ 3) — shared by multimodal_phash_near_dup and
    * multimodal_phash_keepers so both oracles grade the SAME pair
    * semantics. Media = ASCII-stripped documents ∪ planted perturbed
    * copies (doc_id + 10^7, block-7 bytes → 'z' = 122); fingerprints
    * are 64 block-mean bits packed into four 16-bit slice values,
    * exactly the integer arithmetic MultimodalStub.phashSlices runs. */
  private lazy val phashPairsCtesSql = """
        media AS (
          SELECT doc_id,
                 regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS payload
          FROM documents),
        bytes AS (
          SELECT doc_id, (i-1) % 64 AS cell,
                 CAST(ascii(substr(payload, i, 1)) AS BIGINT) AS b
          FROM media, unnest(range(1, strlen(payload)+1)) AS t(i)
          UNION ALL
          SELECT doc_id + 10000000, (i-1) % 64,
                 CASE WHEN (i-1) % 64 = 7 THEN 122
                      ELSE CAST(ascii(substr(payload, i, 1)) AS BIGINT) END
          FROM media, unnest(range(1, strlen(payload)+1)) AS t(i)),
        cells AS (SELECT doc_id, cell, sum(b) AS v FROM bytes GROUP BY 1, 2),
        tot AS (SELECT doc_id, sum(v) AS total FROM cells GROUP BY 1),
        bits AS (
          SELECT c.doc_id, c.cell,
                 CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
          FROM cells c JOIN tot t USING (doc_id)),
        slices AS (
          SELECT doc_id, cell // 16 AS si,
                 sum(CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << (cell % 16)))
                   AS sv
          FROM bits GROUP BY 1, 2),
        ids AS (SELECT doc_id FROM media
                UNION ALL SELECT doc_id + 10000000 FROM media),
        fp AS (
          SELECT i.doc_id,
                 coalesce(max(CASE WHEN si = 0 THEN sv END), 0) AS s0,
                 coalesce(max(CASE WHEN si = 1 THEN sv END), 0) AS s1,
                 coalesce(max(CASE WHEN si = 2 THEN sv END), 0) AS s2,
                 coalesce(max(CASE WHEN si = 3 THEN sv END), 0) AS s3
          FROM ids i LEFT JOIN slices s USING (doc_id)
          GROUP BY 1),
        ppairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.s0, b.s0)) + bit_count(xor(a.s1, b.s1)) +
                      bit_count(xor(a.s2, b.s2)) + bit_count(xor(a.s3, b.s3))
                   AS BIGINT) AS hamming
          FROM fp a JOIN fp b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.s0, b.s0)) + bit_count(xor(a.s1, b.s1)) +
                bit_count(xor(a.s2, b.s2)) + bit_count(xor(a.s3, b.s3)) <= 3)"""

  /** multimodal_phash_near_dup's body (exposed for MultimodalSpec's
    * planted-recall pin): media ∪ perturbed copies → phashSlices
    * fingerprints (typed mapPartitions, the decode-stage batch shape) →
    * slice-equality band join → Hamming-≤3 verify inside the join. */
  private[graft] def phashNearDupPairs(s: SparkSession, dir: String)
      : DataFrame = {
    import org.apache.spark.sql.Encoders
    val pairEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val base = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), "[^\\x00-\\x7F]", "")
          .cast("binary").as("payload"))
      .as(pairEnc)
    // planted near-dups: every byte in block 7 rewritten to 'z' — a
    // deterministic local edit that perturbs one block's intensity (and
    // nudges the global mean), the pHash near-dup canary
    val planted = base.map { case (id, b) =>
      val c = b.clone()
      var p = 7
      while (p < c.length) { c(p) = 'z'.toByte; p += 64 }
      (id + 10000000L, c)
    }(pairEnc)
    val fp = base.union(planted).mapPartitions { it =>
      it.map { case (id, bytes) =>
        val sl = MultimodalStub.phashSlices(bytes)
        (id, sl(0), sl(1), sl(2), sl(3))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF("doc_id", "s0", "s1", "s2", "s3")
    val banded = fp.select(col("doc_id"),
      col("s0"), col("s1"), col("s2"), col("s3"),
      explode(array(
        struct(lit(0).as("si"), col("s0").as("sv")),
        struct(lit(1).as("si"), col("s1").as("sv")),
        struct(lit(2).as("si"), col("s2").as("sv")),
        struct(lit(3).as("si"), col("s3").as("sv")))).as("band"))
      .select(col("doc_id"), col("s0"), col("s1"), col("s2"), col("s3"),
        col("band.si"), col("band.sv"))
    val ham = Seq("s0", "s1", "s2", "s3").map(c =>
      bit_count(col(s"x.$c").bitwiseXOR(col(s"y.$c"))).cast("long"))
      .reduce(_ + _)
    banded.as("x")
      .join(banded.as("y"),
        col("x.si") === col("y.si") && col("x.sv") === col("y.sv") &&
          col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming", ham)
      .filter(col("hamming") <= 3)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("hamming"))
      .distinct()
      .orderBy("id_a", "id_b")
  }

  val all: Seq[Q] = Seq(

    // frame sampling: one media row expands to k frame rows (the video
    // frame-extraction batch shape — same typed flatMap a real sampler
    // uses; the "decoder" is the deterministic byte-slice stub, and a
    // resize stage would be one more map over the same Dataset). The
    // payload is the text stripped to ASCII on BOTH sides, so the
    // oracle's character offsets provably equal the byte offsets the
    // Spark side slices — multi-byte rows can't silently diverge.
    Q(
      "multimodal_frame_sample",
      Some("""
        WITH media AS (
          SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS payload
          FROM documents)
        SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
               md5(substring(payload, i * 7 + 1, 16)) AS frame_digest
        FROM media, unnest(range(strlen(payload) % 4 + 1)) AS t(i)
        ORDER BY doc_id, frame_idx"""),
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        val media = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^\\x00-\\x7F]", "")
              .cast("binary").as("payload"))
          .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
        media.flatMap { case (id, bytes) =>
          val k = bytes.length % 4 + 1
          (0 until k).map { i =>
            val slice = bytes.slice(i * 7, math.min(bytes.length, i * 7 + 16))
            (id, i.toLong, md5hex(slice))
          }
        }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING))
          .toDF("doc_id", "frame_idx", "frame_digest")
          .orderBy("doc_id", "frame_idx")
      }),

    // binary ingestion + per-row digesting — the part of a media pipeline
    // that IS oracle-checkable (md5/length are codec-independent).
    Q(
      "multimodal_binary_features",
      Some("""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS byte_len,
               md5(text) AS digest,
               substr(text, 1, 8) AS head
        FROM documents ORDER BY doc_id"""),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("byte_len"),
            md5(col("payload")).as("digest"),
            col("payload").cast("string").substr(1, 8).as("head"))
          .orderBy("doc_id")),

    // resize stage: decode → downscale to a bounded box (the thumbnail
    // step of an image pipeline) — a second typed map over the decode
    // output; the stub arithmetic (integer halving until within bounds)
    // is deterministic so the oracle can reproduce it off the base table.
    Q(
      "multimodal_resize_stub",
      Some("""
        SELECT doc_id, w AS width, h AS height,
               CAST(CASE WHEN w <= 32 AND h <= 24 THEN w
                    WHEN (w + 1) // 2 <= 32 AND (h + 1) // 2 <= 24 THEN (w + 1) // 2
                    ELSE (w + 3) // 4 END AS BIGINT) AS resized_w,
               CAST(CASE WHEN w <= 32 AND h <= 24 THEN h
                    WHEN (w + 1) // 2 <= 32 AND (h + 1) // 2 <= 24 THEN (h + 1) // 2
                    ELSE (h + 3) // 4 END AS BIGINT) AS resized_h
        FROM (SELECT doc_id,
                     strlen(text) % 64 + 1 AS w,
                     strlen(text) % 48 + 1 AS h
              FROM documents)
        ORDER BY doc_id"""),
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        val media = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
        MultimodalStub.decodeStage(media)
          .map { f =>
            // halve until the frame fits 32x24 (max two halvings needed
            // for the stub's 64x48 bound); ceil-division like a real
            // downsampler
            var (w, h) = (f.width, f.height)
            while (w > 32 || h > 24) {
              w = (w + 1) / 2
              h = (h + 1) / 2
            }
            (f.doc_id, f.width, f.height, w, h)
          }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
            Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
          .toDF("doc_id", "width", "height", "resized_w", "resized_h")
          .orderBy("doc_id")
      }),

    // ---- perceptual-hash near-dup over the binary tier (round-13
    // verdict task 7 — images repeat at enormous rates in web corpora
    // and the multimodal family had no dedup story): block-mean hash
    // fingerprints (MultimodalStub.phashSlices) over the media corpus ∪
    // planted perturbed copies (doc_id + 10^7, every cell-7 byte
    // rewritten — a small local edit, the near-dup canary), bit-sliced
    // band blocking on (slice_idx, slice_value) — the MinHash band
    // lesson: an equi-join, never all-pairs — with the exact Hamming
    // verify INSIDE the join (fingerprints ride the 4-row-per-doc band
    // frame; no pair frame is ever materialized unverified), distinct
    // over band multiplicity. Blocking is COMPLETE for the ≤3 verify:
    // 3 differing bits cannot touch all 4 slices, so every qualifying
    // pair shares an identical slice and the all-pairs oracle grades
    // the banded plan row-for-row. Scale: the join key is a 16-bit
    // slice value — ~4·N/65536 rows per bucket on balanced
    // fingerprints; degenerate identical-media buckets are exactly the
    // mass exact-dedup removes upstream in the production pipeline. ----
    Q(
      "multimodal_phash_near_dup",
      Some(s"""
        WITH $phashPairsCtesSql
        SELECT id_a, id_b, hamming FROM ppairs ORDER BY id_a, id_b"""),
      (s, dir) => phashNearDupPairs(s, dir)),

    // ---- duplicate-MEDIA cluster resolution: the production consumer
    // of the pair set above. A near-identical media family (the 49M-pair
    // 100× lesson: a pair set is quadratic in CLUSTER size) is consumed
    // as connected components over the pair graph — the same BSP
    // min-label propagation as dedup_cluster_keepers — and ONE keeper
    // (min id) survives per component; everything else is the drop
    // list. Oracle = transitive closure via DuckDB's recursive CTE over
    // the identical pair CTEs. ----
    Q(
      "multimodal_phash_keepers",
      Some(s"""
        WITH RECURSIVE $phashPairsCtesSql,
        edges AS (SELECT id_a AS a, id_b AS b FROM ppairs
                  UNION ALL SELECT id_b, id_a FROM ppairs),
        nodes AS (SELECT DISTINCT a AS doc FROM edges),
        reach(a, b) AS (
          SELECT doc, doc FROM nodes
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS media_id, CAST(min(b) AS BIGINT) AS component,
               a = min(b) AS is_keeper
        FROM reach GROUP BY a ORDER BY media_id"""),
      (s, dir) =>
        graft.operators.Dedup.components(phashNearDupPairs(s, dir))
          .select(col("doc").as("media_id"), col("lbl").as("component"),
            (col("doc") === col("lbl")).as("is_keeper"))
          .orderBy("media_id")),

    // typed mapPartitions decode stage (stubbed codec) + relational
    // aggregation of the extracted features. The oracle reproduces the
    // stub's arithmetic off the base table — verifying the Spark plumbing
    // end-to-end (binary cast, Dataset encoder, partition batching, agg).
    Q(
      "multimodal_decode_stub",
      Some("""
        SELECT CAST(strlen(text) % 64 + 1 AS BIGINT) AS width,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(CAST(strlen(text) AS DOUBLE)), 4) AS avg_bytes
        FROM documents GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        val media = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
        MultimodalStub.decodeStage(media)
          .groupBy("width")
          .agg(count(lit(1)).as("n"),
            round(avg(col("byte_len").cast("double")), 4).as("avg_bytes"))
          .orderBy("width")
      })
  )
}
