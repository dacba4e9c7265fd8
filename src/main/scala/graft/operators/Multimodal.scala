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
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

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
