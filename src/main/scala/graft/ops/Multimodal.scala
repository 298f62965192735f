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
 * bounded batches. IMAGE payloads (mime prefix `image/`) decode for REAL via
 * the JDK-native `javax.imageio` codecs (PNG/JPEG/BMP/GIF — no external
 * library needed); audio/video decode remains the clearly-marked STUB
 * (no codec libraries in this container) — a deterministic fake derived
 * from the bytes. The Spark-side plumbing (schema, batching, partition
 * behavior, metadata-only output) is identical for both.
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

  /** Deterministic REAL images: one PNG per document row, dimensions
   * derived from doc_id so an oracle can predict what the decoder must
   * read back — grayscale (1 band) for even ids, RGB (3 bands) for odd.
   * Exercises the real encode→decode cycle end-to-end with zero external
   * data. */
  def syntheticImages(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val w = 8 + (id % 32).toInt
        val h = 8 + (id * 3 % 32).toInt
        val typ =
          if (id % 2 == 0) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        val img = new java.awt.image.BufferedImage(w, h, typ)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id + x * 31 + y * 131) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, bos.toByteArray, "image/png")
      }
    }
  }

  /** Real JDK-native image decode (PNG/JPEG/BMP/GIF via `javax.imageio`):
   * pixel dimensions + raster band count. Returns None when no registered
   * reader recognizes the payload (the caller's poisoned-row policy skips
   * it). `setUseCache(false)` keeps executors off disk-backed ImageIO
   * scratch files — decode stays in-memory per batch. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, img.getRaster.getNumBands))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB decode for audio/video — deterministic arithmetic on the byte
   * array. A real deployment swaps this single function for an actual
   * codec; everything around it (batching, schema, partitioning) is
   * unchanged. */
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
        batch.iterator.filter(_.media != null).flatMap { r =>
          // an `image/`-mime payload decodes for REAL (javax.imageio); an unreadable image
          // is a poisoned row and drops. Other mimes use the stub.
          val decoded =
            if (r.mime != null && r.mime.startsWith("image/")) decodeImage(r.media)
            else Some(decodeStub(r.media))
          decoded.map { case (w, h, c) =>
            val checksum = r.media.take(8).foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
            MediaMeta(r.doc_id, r.media.length.toLong, w, h, c, checksum)
          }
        }
      }
    }
  }
}
