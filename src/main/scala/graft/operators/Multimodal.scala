package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, batched decode / feature-extract over partitions.
  *
  * The real pipeline shape (schema, partitioning, batch iteration,
  * output contract) is implemented and tested; the codec itself is a
  * clearly-marked deterministic STUB — image/audio libraries are not in
  * this environment (builder brief). Swapping `StubCodec` for a real
  * JNI/FFI decoder changes no plumbing.
  *
  * 100 TB notes: payloads never pass through a shuffle here — decode is
  * a mapPartitions over the scan, so bytes stream from parquet to the
  * codec without reserialization. Feature vectors (small) are what any
  * downstream shuffle carries. Batch size is rows-per-iterator-chunk,
  * bounding peak codec memory.
  */
object Multimodal {

  /** Attach a binary payload + metadata to documents — the ingest-side
    * shape of an image/audio table. Payload here is the utf-8 text
    * bytes (deterministic stand-in for real media bytes). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        octet_length(encode(col("text"), "utf-8")).as("byte_len"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height")).as("meta"))

  final case class MediaFeature(
      doc_id: Long, media_type: String, byte_len: Int,
      mean_byte: Double, max_byte: Int, frames_sampled: Int)

  /** STUB codec: "decodes" a payload by reading its bytes directly.
    * Deterministic; replace with a real decoder (libjpeg/ffmpeg FFI)
    * in production — signature and batching stay identical. */
  object StubCodec {
    def decode(payload: Array[Byte]): Array[Int] = payload.map(_ & 0xff)
  }

  /** One row per sampled frame: stride `frameStep` over the decoded
    * byte stream (the video/audio frame-sampling step). Generator
    * shape (1 → N rows) as an iterator-to-iterator flatMap — frames
    * never buffer per document, payloads never shuffle. */
  def sampleFrames(media: DataFrame, frameStep: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val px = StubCodec.decode(payload)
        Iterator.range(0, px.length, frameStep).zipWithIndex.map {
          case (pos, fi) => (id, fi.toLong, px(pos))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_val")
  }

  /** Nearest-neighbor resize STUB to a fixed output length: out[j] =
    * px[⌊j·n/outLen⌋] — the 1-D form of image downscaling, integer
    * arithmetic only so any engine reproduces it exactly. Emits the
    * resized length and a checksum (what a real pipeline would verify
    * after a codec swap). */
  def resizeStub(media: DataFrame, outLen: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val px = StubCodec.decode(payload)
        val checksum =
          if (px.isEmpty) 0L
          // index math in Long: j * px.length overflows Int for
          // payloads ≥ ~34 MB (real media sizes)
          else (0 until outLen).foldLeft(0L)((s, j) =>
            s + px((j.toLong * px.length / outLen).toInt))
        (id, outLen.toLong, checksum)
      }
      .toDF("doc_id", "out_len", "checksum")
  }

  /** Batched per-partition decode + feature extraction. Iterator-to-
    * iterator transform: constant memory per partition, no collect. */
  def extractFeatures(media: DataFrame, frameStep: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.media_type"),
      col("meta.byte_len"))
      .as[(Long, Array[Byte], String, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, mediaType, byteLen) =>
          val px = StubCodec.decode(payload)
          val mean =
            if (px.isEmpty) 0.0
            else {
              // fixed-point mean so the value is reproducible regardless
              // of summation strategy
              val s = px.foldLeft(0L)(_ + _)
              math.floor(s.toDouble / px.length * 10000 + 0.5) / 10000
            }
          MediaFeature(id, mediaType, byteLen,
            mean, if (px.isEmpty) 0 else px.max,
            (px.length + frameStep - 1) / frameStep)
        }
      }
      .toDF()
  }
}
