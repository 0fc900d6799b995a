package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Codecs, ImageIo, Multimodal}
import graft.multimodal.Codecs.BgrImage

/** Real JDK-codec coverage (multimodal.ImageIo): PNG lossless round-trip,
  * JPEG bounded-error decode + header-only parse, multi-frame GIF
  * encode/decode, the magic-sniffed header-dim expressions in
  * Multimodal.asMediaTable, the frame-kernel seam, and loud failure on
  * garbage input.
  */
class ImageIoSpec extends SparkSpec {

  private def testImage(w: Int, h: Int): BgrImage =
    BgrImage(w, h, Array.tabulate(w * h * 3)(i => ((i * 7 + 3) % 256).toByte))

  test("PNG round-trip is bit-exact (lossless DEFLATE)") {
    val img = testImage(41, 32)
    val back = ImageIo.decodeImage(ImageIo.encodePng(img))
    assert(back.width == 41 && back.height == 32)
    assert(back.pixels.toSeq == img.pixels.toSeq)
  }

  test("TIFF round-trip is bit-exact (lossless)") {
    val img = testImage(23, 17)
    val tiff = ImageIo.encodeTiff(img)
    val hdr = ImageIo.headerInfo(tiff)
    assert(Set("tif", "tiff").contains(hdr.format.toLowerCase))
    assert(hdr.width == 23 && hdr.height == 17)
    val back = ImageIo.decodeImage(tiff)
    assert(back.pixels.toSeq == img.pixels.toSeq)
  }

  test("headerInfo parses dims without decode; PNG IHDR matches") {
    val img = testImage(13, 7)
    val hdr = ImageIo.headerInfo(ImageIo.encodePng(img))
    assert(hdr.format.equalsIgnoreCase("png"))
    assert(hdr.width == 13 && hdr.height == 7 && hdr.nFrames == 1)
  }

  test("JPEG decode recovers dims exactly and pixels within DCT error") {
    // smooth gradient — JPEG error stays within a few gray levels
    val w = 24
    val h = 16
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = 30 + 3 * x + 4 * y
      val i = (y * w + x) * 3
      px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
    }
    val jpg = ImageIo.encodeJpeg(BgrImage(w, h, px))
    val hdr = ImageIo.headerInfo(jpg)
    assert(hdr.format == "JPEG" && hdr.width == w && hdr.height == h)
    val back = ImageIo.decodeImage(jpg)
    assert(back.width == w && back.height == h)
    val maxErr = back.pixels.indices.map(i =>
      math.abs((back.pixels(i) & 0xff) - (px(i) & 0xff))).max
    assert(maxErr <= 8, s"JPEG error $maxErr too large for a smooth ramp")
  }

  test("multi-frame GIF: frame directory walk recovers every gray frame") {
    val w = 16
    val h = 12
    val frames = (0 until 4).map(f =>
      Array.tabulate(w * h)(i => ((i * 5 + f * 17) % 256).toByte))
    val gif = ImageIo.encodeGifGray(w, h, frames)
    val hdr = ImageIo.headerInfo(gif)
    assert(hdr.format.equalsIgnoreCase("gif"))
    assert(hdr.width == w && hdr.height == h && hdr.nFrames == 4)
    val back = ImageIo.decodeGifGray(gif)
    assert(back.length == 4)
    back.zip(frames).foreach { case (g, want) =>
      assert(g.width == w && g.height == h)
      assert(g.pixels.toSeq == want.toSeq)
    }
  }

  test("asMediaTable parses REAL header dims for PNG, GIF, and BMP") {
    val png = ImageIo.encodePng(testImage(19, 11))
    val gif = ImageIo.encodeGifGray(300, 260, // u16 LE: exercises both bytes
      Seq(Array.fill(300 * 260)(7.toByte)))
    val bmp = Codecs.encodeBmp(testImage(5, 9))
    val txt = "not an image".getBytes("UTF-8")
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, png), (2L, gif), (3L, bmp), (4L, txt))
      .toDF("id", "payload")
    val got = Multimodal.asMediaTable(df, "id", "payload", "image/auto")
      .select(col("media_id"), col("meta.width"), col("meta.height"))
      .orderBy("media_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 19, 11), (2L, 300, 260), (3L, 5, 9),
      (4L, 0, 0)))
  }

  test("asMediaTable handles top-down BMP (negative height) via |i32|") {
    // hand-flip the height field of an encoded BMP to -9 (top-down)
    val bmp = Codecs.encodeBmp(testImage(5, 9))
    val bb = java.nio.ByteBuffer.wrap(bmp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -9)
    val sp = spark
    import sp.implicits._
    val got = Multimodal.asMediaTable(
      Seq((1L, bmp)).toDF("id", "payload"), "id", "payload", "image/bmp")
      .select(col("meta.width"), col("meta.height")).collect()(0)
    assert((got.getInt(0), got.getInt(1)) == ((5, 9)))
  }

  test("GifFrameKernel re-emits decoded frames as parseable BMP blobs") {
    val w = 8
    val h = 6
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h)(i => ((i + f * 40) % 256).toByte))
    val gif = ImageIo.encodeGifGray(w, h, frames)
    val sp = spark
    import sp.implicits._
    val media = Seq((7L, gif)).toDF("media_id", "blob")
    val out = Multimodal.sampleFrames(spark, media, Multimodal.GifFrameKernel)
      .collect().sortBy(_.frame_idx)
    assert(out.length == 3)
    out.zipWithIndex.foreach { case (fr, f) =>
      assert(fr.media_id == 7L && fr.frame_idx == f)
      val img = Codecs.decodeBmp(fr.frame)
      assert(img.width == w && img.height == h)
      // gray replicated to BGR: blue channel carries the gray value
      val gray = (0 until w * h).map(i => img.pixels(i * 3) & 0xff)
      assert(gray == frames(f).map(_ & 0xff).toSeq)
    }
  }

  test("ImageIoKernel features match BmpKernel on the same image") {
    val img = testImage(10, 10)
    val viaPng = ImageIo.ImageIoKernel.featurize(ImageIo.encodePng(img))
    val viaBmp = Codecs.BmpKernel.featurize(Codecs.encodeBmp(img))
    assert(viaPng.toSeq == viaBmp.toSeq) // PNG lossless ⇒ identical stats
  }

  test("WBMP 1-bit round-trip is exact") {
    val w = 17 // not a multiple of 8 — exercises row bit packing
    val h = 5
    val bits = Array.tabulate(w * h)(i => (i * 7 + 1) % 3 == 0)
    val blob = ImageIo.encodeWbmp(w, h, bits)
    val hdr = ImageIo.headerInfo(blob)
    assert(hdr.format.equalsIgnoreCase("wbmp"))
    assert(hdr.width == w && hdr.height == h)
    val (bw, bh, back) = ImageIo.decodeWbmp(blob)
    assert(bw == w && bh == h)
    assert(back.toSeq == bits.toSeq)
  }

  test("garbage input fails loudly, never plausible output") {
    intercept[IllegalArgumentException](
      ImageIo.decodeImage(Array[Byte](1, 2, 3, 4)))
    intercept[IllegalArgumentException](
      ImageIo.headerInfo("definitely not an image".getBytes("UTF-8")))
    intercept[IllegalArgumentException](
      ImageIo.decodeGifGray(Array[Byte](0x47, 0x49)))
  }
}
