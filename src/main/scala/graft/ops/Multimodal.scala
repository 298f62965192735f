package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque bytes + typed metadata. At 100 TB the
 * `media` column is the heavy payload — everything here is designed so the
 * bytes are read once, processed per-partition in bounded batches, and never
 * shuffled (metadata-only outputs). */
final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)

/** Decoded metadata + a tiny feature summary (deterministic). */
final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
                           height: Int, channels: Int, checksum: Long)

/**
 * Multimodal-column plumbing: treat image/audio/video as opaque binary
 * columns with typed metadata, decode/feature-extract per partition in
 * bounded batches. The decode itself is a clearly-marked STUB (no image/
 * audio libraries in this container) — a deterministic fake derived from
 * the bytes — but the Spark-side plumbing (schema, batching, partition
 * behavior, metadata-only output) is real and tested.
 */
object Multimodal {

  /** Derive a binary media column from documents (the test tables carry no
   * real blobs): media = UTF-8 bytes of text, mime from lang. */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        concat(lit("application/x-fake-"), col("lang")).as("mime"))
      .as[MediaRow]
  }

  /** STUB image decode — deterministic arithmetic on the byte array. A real
   * deployment swaps this single function for an actual codec; everything
   * around it (batching, schema, partitioning) is unchanged. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val width = 16 + (n % 640)
    // long arithmetic: n * 7 wraps Int negative past ~306 MB — video-sized
    // blobs would get impossible negative dimensions
    val height = 16 + (n.toLong * 7 % 480).toInt
    val channels = 1 + (n % 3)
    (width, height, channels)
  }

  /** Per-partition batched decode: drains the iterator in `batchSize`
   * groups (the shape a vectorized/native decoder wants), emits
   * metadata-only rows — the heavy bytes never leave the scan stage. */
  def extractMeta(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // null payloads are SKIPPED (poisoned-row policy, same as the
        // streaming operators): one undecodable row must not kill the job
        batch.iterator.filter(_.media != null).map { r =>
          val (w, h, c) = decodeStub(r.media)
          val checksum = r.media.take(8).foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
          MediaMeta(r.doc_id, r.media.length.toLong, w, h, c, checksum)
        }
      }
    }
  }
}
