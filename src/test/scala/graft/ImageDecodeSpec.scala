package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** The REAL decoder half of the multimodal codec contract: encode
  * genuine PNGs in-memory with the JDK, push them through the
  * PRODUCTION `extractFeatures`/`resizeMedia` path with
  * [[Multimodal.ImageIoDecoder]], and assert exact pixel dimensions —
  * proving the seam carries real media, not just the oracle stub. */
class ImageDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out), "JDK PNG writer missing")
    out.toByteArray
  }

  private def mediaFrame(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "content")
      .select(col("media_id"), col("content"),
        struct(lit("image/png").as("mime"),
          length(col("content")).as("n_bytes")).as("meta"))

  test("ImageIoDecoder reads real PNG dimensions through extractFeatures") {
    val media = mediaFrame(Seq(
      (1L, png(17, 23)), (2L, png(64, 1)), (3L, png(2, 300))))
    val got = Multimodal.extractFeatures(media,
        newDecoder = () => new Multimodal.ImageIoDecoder)
      .collect().map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(got == Map(1L -> ((17L, 23L)), 2L -> ((64L, 1L)),
      3L -> ((2L, 300L))))
  }

  test("undecodable payload isolates to (0,0) instead of failing") {
    val media = mediaFrame(Seq(
      (1L, png(5, 5)), (2L, "not an image".getBytes("UTF-8"))))
    val got = Multimodal.extractFeatures(media,
        newDecoder = () => new Multimodal.ImageIoDecoder)
      .collect().map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(got == Map(1L -> ((5L, 5L)), 2L -> ((0L, 0L))))
  }

  test("resizeMedia geometry is exact over real decoded dimensions") {
    val media = mediaFrame(Seq((1L, png(100, 40)), (2L, png(30, 90))))
    val got = Multimodal.resizeMedia(media, targetW = 50, targetH = 50,
        newDecoder = () => new Multimodal.ImageIoDecoder)
      .collect().map(r => r.media_id -> ((r.out_w, r.out_h))).toMap
    // aspect-fit into 50x50: 100x40 binds on width -> 50x20;
    // 30x90 binds on height -> floor(30*50/90)=16 x 50
    assert(got == Map(1L -> ((50L, 20L)), 2L -> ((16L, 50L))))
  }
}
