package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side shape is real and tested — schema, partition-batched
  * iteration (the Scala analogue of `mapInPandas` batches: one decoder
  * instance per partition, amortized across rows), typed Encoders — while
  * the decode step itself is a STUB: this container has no image/audio
  * codecs, so `StubDecoder` stands in for libjpeg/ffmpeg with a
  * deterministic pure function of the bytes. Swapping in a real codec
  * changes only the body of `StubDecoder.decode`.
  */
object Multimodal {

  /** Envelope of an opaque media payload. */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Typed metadata produced by the (stub) decoder. */
  final case class MediaMeta(
      doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, sample_rate: Int)

  /** ======================= STUB ==========================
    * Deterministic fake decoder. A real implementation would parse the
    * container format (JPEG SOF / WAV header / MP4 moov) here; the fake
    * derives plausible metadata from byte length alone so tests and
    * oracles stay exact. One instance per partition (see decodeMeta) —
    * real codecs are expensive to construct, so the per-partition
    * lifecycle is the part worth getting right now.
    */
  final class StubDecoder {
    def decode(row: MediaRow): MediaMeta = {
      val n = row.payload.length.toLong
      row.kind match {
        case "image" => MediaMeta(row.doc_id, row.kind, n,
          width = (64 + n % 512).toInt, height = (64 + n % 384).toInt,
          n_frames = 1, sample_rate = 0)
        case "audio" => MediaMeta(row.doc_id, row.kind, n,
          width = 0, height = 0, n_frames = (n / 100L).toInt + 1,
          sample_rate = 16000)
        case _ => MediaMeta(row.doc_id, row.kind, n,
          width = (64 + n % 512).toInt, height = (64 + n % 384).toInt,
          n_frames = (n / 50L).toInt + 1, sample_rate = 0)
      }
    }
  }

  /** Synthesize the opaque media table deterministically from documents
    * (payload = utf-8 bytes of the text; kind cycles by doc_id).
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "utf-8").as("payload")
    ).as[MediaRow]
  }

  /** Partition-batched decode: decoder constructed once per partition,
    * rows streamed through it lazily (never materializes the partition).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder // one per partition, like mapInPandas
      rows.map(decoder.decode)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta" -> { (s, dir) =>
      decodeMeta(mediaTable(s, dir)).toDF()
        .select(col("doc_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"), col("sample_rate"))
        .orderBy("doc_id")
    },
    // frame-sample + resize plumbing: every ceil(n_frames/4)-th frame index
    // exploded to a row (<= 4 sampled frames per media item), with
    // letterbox-resize target dims (width -> 224, height scaled by integer
    // math). The decode is the same per-partition stub; the SAMPLING and
    // RESIZE arithmetic — the part that shapes shuffle volume at 100 TB —
    // is real, typed, and oracle-checked.
    "media_frames" -> { (s, dir) =>
      val meta = decodeMeta(mediaTable(s, dir)).toDF()
      // integer-only math throughout (floor-div), mirrored in the oracle
      val step = floor((col("n_frames") + 3) / 4).cast("int")
      meta
        .select(col("doc_id"), col("kind"), col("width"), col("height"),
          explode(sequence(lit(0), col("n_frames") - 1, step)).as("frame_idx"))
        .select(col("doc_id"), col("kind"), col("frame_idx"),
          when(col("width") > 0, lit(224)).otherwise(lit(0)).as("out_w"),
          when(col("width") > 0, floor(col("height") * 224 / col("width")))
            .otherwise(lit(0)).cast("int").as("out_h"))
        .orderBy("doc_id", "frame_idx")
    }
  )

  def oracleSql: Map[String, String] = Map(
    // the stub decoder's formulas re-derived from octet_length in SQL
    "media_meta" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 0
              ELSE 64 + octet_length(encode(text)) % 512 END AS INT) AS width,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 0
              ELSE 64 + octet_length(encode(text)) % 384 END AS INT) AS height,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 1
              WHEN doc_id % 3 = 1 THEN octet_length(encode(text)) // 100 + 1
              ELSE octet_length(encode(text)) // 50 + 1 END AS INT) AS n_frames,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate
         FROM documents ORDER BY doc_id""",
    "media_frames" ->
      """WITH meta AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             CASE WHEN doc_id % 3 = 1 THEN 0
                  ELSE 64 + octet_length(encode(text)) % 512 END AS width,
             CASE WHEN doc_id % 3 = 1 THEN 0
                  ELSE 64 + octet_length(encode(text)) % 384 END AS height,
             CASE WHEN doc_id % 3 = 0 THEN 1
                  WHEN doc_id % 3 = 1 THEN octet_length(encode(text)) // 100 + 1
                  ELSE octet_length(encode(text)) // 50 + 1 END AS n_frames
           FROM documents)
         SELECT doc_id, kind,
           CAST(unnest(range(0, n_frames, (n_frames + 3) // 4)) AS INT) AS frame_idx,
           CAST(CASE WHEN width > 0 THEN 224 ELSE 0 END AS INT) AS out_w,
           CAST(CASE WHEN width > 0 THEN (height * 224) // width ELSE 0 END AS INT) AS out_h
         FROM meta ORDER BY doc_id, frame_idx"""
  )
}
