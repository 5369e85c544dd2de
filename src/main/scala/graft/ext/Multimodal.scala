package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) as opaque `binary` columns with typed metadata,
  * partition-wise decode / feature-extraction / frame-sampling.
  *
  * The Spark-side shape is real — schema, partitioning, per-partition
  * decoder lifecycle, batch iteration — but the DECODE STEP IS A STUB:
  * this container has no image/audio codecs, so [[FakeDecoder]] derives
  * deterministic pseudo-features from the bytes (clearly marked; swap
  * in a real codec per partition in production).
  */
object Multimodal {

  /** Attach an opaque binary `content` column + typed metadata struct —
    * the canonical layout for media columns at scale (metadata columns
    * prune/filter without touching the payload bytes). Here the bytes
    * are the UTF-8 text (a deterministic stand-in for real media). */
  def withBinaryContent(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id).as("media_id"),
      col(text).cast("binary").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col(text).cast("binary")).as("n_bytes")).as("meta"))

  /** Extracted per-media features. */
  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, mime: String,
      width: Long, height: Long, fp: String)

  /** Per-partition media decoder contract: instantiated ONCE per
    * partition inside `mapPartitions` (the codec-handle lifecycle),
    * returns (width, height, fingerprint). */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Long, Long, String)
  }

  /** STUB decoder: deterministic pseudo-decode of media bytes — derives
    * "dimensions" from the md5 of the bytes so the full pipeline stays
    * testable + oracle-checkable on the synthetic `documents` payloads
    * (which are not real media). Production swaps [[ImageIoDecoder]]
    * (or any codec) in per partition. */
  final class FakeDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): (Long, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val h32 = java.lang.Long.parseLong(hex.take(8), 16)
      (h32 % 640 + 1, (h32 / 640) % 480 + 1, hex) // (width, height, fingerprint)
    }
  }

  /** REAL image decoder over the JDK's `javax.imageio` (PNG/JPEG/GIF/
    * BMP readers ship with the JDK — zero external dependencies).
    * Undecodable payloads yield (0, 0) dimensions instead of failing
    * the partition — the reference's per-file error-isolation posture
    * (`M/main_batch.py:100-103`) applied per payload. */
  final class ImageIoDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): (Long, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(bytes).map("%02x".format(_)).mkString
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) (0L, 0L, fp)
      else (img.getWidth.toLong, img.getHeight.toLong, fp)
    }
  }

  /** Partition-wise decode + feature extraction: one decoder instance
    * per partition (the real-codec lifecycle), streaming iteration (no
    * materialization), typed output. This is the `mapPartitions` escape
    * hatch of the builder guide — justified here because decoding is
    * genuinely imperative library code, not expressible as Columns.
    * `newDecoder` is the per-partition codec factory; the default stays
    * the deterministic [[FakeDecoder]] (the oracle-gated query needs
    * reproducible output on non-media payloads). */
  def extractFeatures(media: DataFrame,
      newDecoder: () => MediaDecoder = () => new FakeDecoder)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val decoder = newDecoder() // per-partition codec handle
        it.map { case (id, bytes, mime) =>
          val (w, h, fp) = decoder.decode(bytes)
          MediaFeatures(id, bytes.length.toLong, mime, w, h, fp)
        }
      }
  }

  /** Resize output: scaled dimensions + the re-encoded payload's size
    * and fingerprint. */
  final case class ResizedMedia(
      media_id: Long, out_w: Long, out_h: Long, out_bytes: Long,
      out_fp: String)

  /** Aspect-fit resize to a (targetW, targetH) box, partition-wise with
    * the per-partition decoder lifecycle. The GEOMETRY is real and
    * integer-exact (no upscaling; the binding side pins to the target,
    * the other floors `dim * target / other` — pure integer ops, so the
    * oracle reproduces it with `//`). The RE-ENCODE is the stub half of
    * the codec contract (no codecs in this container): the "resampled"
    * payload is the byte prefix sized by the area ratio
    * `len * out_w * out_h / (w * h)` — deterministic and size-faithful;
    * production swaps a real scaler+encoder into the same seam.
    * Undecodable payloads (w or h = 0) yield a (0,0,0,"") row — the
    * per-payload error-isolation posture of [[ImageIoDecoder]]. */
  def resizeMedia(media: DataFrame, targetW: Int, targetH: Int,
      newDecoder: () => MediaDecoder = () => new FakeDecoder)
      : Dataset[ResizedMedia] = {
    require(targetW >= 1 && targetH >= 1, "target box must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = newDecoder() // per-partition codec handle
        it.map { case (id, bytes) =>
          val (w, h, _) = decoder.decode(bytes)
          if (w <= 0L || h <= 0L) ResizedMedia(id, 0L, 0L, 0L, "")
          else {
            val (ow, oh) =
              if (targetW >= w && targetH >= h) (w, h) // never upscale
              else if (targetW.toLong * h <= targetH.toLong * w)
                (targetW.toLong, math.max(1L, h * targetW / w))
              else (math.max(1L, w * targetH / h), targetH.toLong)
            val nl = math.max(1L,
              bytes.length.toLong * ow * oh / (w * h))
            val out = bytes.take(nl.toInt)
            val md = java.security.MessageDigest.getInstance("MD5")
            ResizedMedia(id, ow, oh, nl,
              md.digest(out).map("%02x".format(_)).mkString)
          }
        }
      }
  }

  /** Frame sampling: fixed-size byte windows at a stride — the shape of
    * video frame extraction (binary slicing is byte-based). One row per
    * sampled frame with its (lowercased) hex rendering; frames past the
    * end of the payload are dropped. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int,
      maxFrames: Int): DataFrame =
    media.select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(maxFrames - 1)),
          i => col("content").substr(i * stride + 1, lit(frameBytes)))))
      .select(col("media_id"), col("pos").as("frame_idx"),
        lower(hex(col("col"))).as("frame_hex"))
      .filter(col("frame_hex") =!= "")
}
