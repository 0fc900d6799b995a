package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.stream.{ImageInputStream, ImageOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageReader, ImageWriter}

/** REAL compressed-image codecs via `javax.imageio` — part of the JDK
  * itself, so no external library is needed even in a zero-egress
  * container: PNG (lossless DEFLATE), JPEG (lossy DCT), and multi-frame
  * animated GIF (LZW, palette), over the same [[Codecs.BgrImage]] pixel
  * model as the pure-JVM BMP/WAV codecs. This replaces the former stub
  * justification ("no codec libraries in this container") for image
  * formats — the JDK's readers decode JPG/PNG/GIF/TIFF/BMP/WBMP
  * headless.
  *
  * Contracts match [[Codecs]]: decode failures are LOUD
  * (`IllegalArgumentException`, never plausible garbage), encodes are
  * deterministic for a fixed JDK, and PNG/GIF round-trips are bit-exact
  * (PNG is lossless; GIF is lossless for ≤256-color — e.g. grayscale —
  * sources), which is what lets the DuckDB oracles replay decoded pixel
  * statistics from the synthesis formula.
  */
object ImageIo {

  /** 8-bit grayscale image, row-major, one byte per pixel. */
  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != ${width}x$height")
  }

  /** Container facts read from the header WITHOUT a full pixel decode:
    * reader format name, logical dims of the first image, and the frame
    * count (>1 only for animated containers like GIF).
    */
  final case class ImageHeader(format: String, width: Int, height: Int,
      nFrames: Int)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ImageIO decode: $msg")

  private def toBuffered(img: Codecs.BgrImage): BufferedImage = {
    val bi = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val i = (y * img.width + x) * 3
        val b = img.pixels(i) & 0xff
        val g = img.pixels(i + 1) & 0xff
        val r = img.pixels(i + 2) & 0xff
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    bi
  }

  private def fromBuffered(bi: BufferedImage): Codecs.BgrImage = {
    val w = bi.getWidth
    val h = bi.getHeight
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = bi.getRGB(x, y)
        val i = (y * w + x) * 3
        out(i) = (rgb & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Codecs.BgrImage(w, h, out)
  }

  private def write(img: Codecs.BgrImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(toBuffered(img), format, bos))
      fail(s"no JDK writer for format '$format'")
    bos.toByteArray
  }

  /** Lossless PNG encode — `decodeImage(encodePng(img)) == img` exactly. */
  def encodePng(img: Codecs.BgrImage): Array[Byte] = write(img, "png")

  /** Lossy JPEG encode (JDK default quality). Dims/structure round-trip
    * exactly; pixel values only approximately (gate stats with a margin).
    */
  def encodeJpeg(img: Codecs.BgrImage): Array[Byte] = write(img, "jpg")

  /** Lossless TIFF encode (JDK default — LZW or none; either way
    * `decodeImage(encodeTiff(img)) == img` exactly).
    */
  def encodeTiff(img: Codecs.BgrImage): Array[Byte] = write(img, "tiff")

  /** 1-bit WBMP encode (WAP bitmap — the minimal monochrome container):
    * `bits(y*w + x)` true = white. Lossless by construction.
    */
  def encodeWbmp(width: Int, height: Int,
      bits: Array[Boolean]): Array[Byte] = {
    require(bits.length == width * height,
      s"bit buffer ${bits.length} != ${width}x$height")
    val bi = new BufferedImage(width, height,
      BufferedImage.TYPE_BYTE_BINARY)
    val ras = bi.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        ras.setSample(x, y, 0, if (bits(y * width + x)) 1 else 0)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(bi, "wbmp", bos)) fail("no JDK WBMP writer")
    bos.toByteArray
  }

  /** 1-bit WBMP decode: true = white pixel. Loud on unrecognized input. */
  def decodeWbmp(blob: Array[Byte]): (Int, Int, Array[Boolean]) = {
    val img = decodeImage(blob)
    val out = new Array[Boolean](img.width * img.height)
    var i = 0
    while (i < out.length) {
      out(i) = (img.pixels(i * 3) & 0xff) > 127
      i += 1
    }
    (img.width, img.height, out)
  }

  /** Full pixel decode of any JDK-readable container (PNG/JPEG/GIF/BMP/
    * TIFF/WBMP), normalized to BGR bytes. Loud on unrecognized input.
    */
  def decodeImage(blob: Array[Byte]): Codecs.BgrImage = {
    val bi = ImageIO.read(new ByteArrayInputStream(blob))
    if (bi == null) fail(s"unrecognized container (${blob.length} bytes)")
    fromBuffered(bi)
  }

  private def withReader[A](blob: Array[Byte])(f: ImageReader => A): A = {
    val iis: ImageInputStream =
      ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) fail(s"no reader claims this blob (${blob.length} bytes)")
      val r = readers.next()
      try { r.setInput(iis); f(r) } finally r.dispose()
    } finally iis.close()
  }

  /** Header-only facts (format, dims, frame count) — the reader parses
    * just the container header, no pixel decode; `nFrames` walks the
    * frame directory (GIF) and is 1 for single-image formats.
    */
  def headerInfo(blob: Array[Byte]): ImageHeader =
    withReader(blob) { r =>
      ImageHeader(r.getFormatName, r.getWidth(0), r.getHeight(0),
        r.getNumImages(true))
    }

  /** Animated-GIF encode of grayscale frames (all `width`×`height`).
    * Grayscale fits a 256-entry palette, so the encode is LOSSLESS:
    * `decodeGifGray(encodeGifGray(w, h, fs)) == fs` byte-exact.
    */
  def encodeGifGray(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "GIF needs at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"frame buffer ${f.length} != ${width}x$height"))
    val writer: ImageWriter = {
      val it = ImageIO.getImageWritersByFormatName("gif")
      if (!it.hasNext) fail("no JDK GIF writer")
      it.next()
    }
    val bos = new ByteArrayOutputStream()
    val ios: ImageOutputStream = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        val bi = new BufferedImage(width, height,
          BufferedImage.TYPE_BYTE_GRAY)
        val ras = bi.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            ras.setSample(x, y, 0, px(y * width + x) & 0xff)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new IIOImage(bi, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL multi-frame decode: one [[GrayImage]] per frame in the
    * container, via `ImageReader.getNumImages`/`read(i)` — the actual
    * frame directory walk, not a byte slice. Gray value is the decoded
    * pixel's blue channel (identical across channels for gray palettes).
    */
  def decodeGifGray(blob: Array[Byte]): Seq[GrayImage] =
    withReader(blob) { r =>
      val n = r.getNumImages(true)
      if (n < 1) fail("container has no frames")
      (0 until n).map { f =>
        val bi = r.read(f)
        val w = bi.getWidth
        val h = bi.getHeight
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = (bi.getRGB(x, y) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        GrayImage(w, h, out)
      }
    }

  /** Real image kernel over the [[Multimodal.MediaKernel]] seam — the
    * compressed-format sibling of [[Codecs.BmpKernel]], same feature
    * contract: [width, height, meanB, meanG, meanR, mean luma] with
    * means from exact integer channel sums. Works on any JDK-readable
    * container (PNG/JPEG/GIF/BMP/TIFF).
    */
  object ImageIoKernel extends Multimodal.MediaKernel {
    override def featurize(blob: Array[Byte]): Array[Float] = {
      val img = decodeImage(blob)
      var sb = 0L
      var sg = 0L
      var sr = 0L
      var i = 0
      while (i < img.pixels.length) {
        sb += img.pixels(i) & 0xff
        sg += img.pixels(i + 1) & 0xff
        sr += img.pixels(i + 2) & 0xff
        i += 3
      }
      val n = img.width.toLong * img.height
      Array(img.width.toFloat, img.height.toFloat,
        (sb.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
        (sr.toDouble / n).toFloat,
        ((sr * 299L + sg * 587L + sb * 114L).toDouble / (1000.0 * n)).toFloat)
    }
  }
}
