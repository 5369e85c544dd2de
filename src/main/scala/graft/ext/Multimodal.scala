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

  /** STUB decoder: deterministic pseudo-decode of media bytes.
    * A real implementation would hold a codec handle per partition and
    * decode each payload; this fake derives "dimensions" from the md5
    * of the bytes so the full pipeline stays testable + oracle-checkable. */
  final class FakeDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Long, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val h32 = java.lang.Long.parseLong(hex.take(8), 16)
      (h32 % 640 + 1, (h32 / 640) % 480 + 1, hex) // (width, height, fingerprint)
    }
  }

  /** Partition-wise decode + feature extraction: one decoder instance
    * per partition (the real-codec lifecycle), streaming iteration (no
    * materialization), typed output. This is the `mapPartitions` escape
    * hatch of the builder guide — justified here because decoding is
    * genuinely imperative library code, not expressible as Columns. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val decoder = new FakeDecoder // per-partition codec handle
        it.map { case (id, bytes, mime) =>
          val (w, h, fp) = decoder.decode(bytes)
          MediaFeatures(id, bytes.length.toLong, mime, w, h, fp)
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
