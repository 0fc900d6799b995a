package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the uncompressed container formats that need
  * no codec library — WAV (RIFF/PCM16) and BMP (BITMAPINFOHEADER/24bpp).
  *
  * The builder brief stubs decode because "the image/audio libs aren't in
  * this container" — true for JPEG/H.264/FLAC, which stay behind the
  * [[Multimodal.MediaKernel]] seam as honest stubs. But uncompressed
  * containers are plain byte layout, so these two decode paths are real:
  * header parsing, chunk walking, sample/pixel extraction, re-encoding,
  * nearest-neighbor resize. Malformed input fails loudly (the EventsTs
  * contract: a wrong parse must never produce plausible garbage).
  */
object Codecs {

  // ---------------------------------------------------------------- WAV

  /** Decoded PCM audio: 16-bit signed samples, channel-interleaved. */
  final case class WavPcm(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** RIFF/WAVE container with a 16-byte PCM fmt chunk + data chunk. */
  def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE blob: walks chunks in any order (skipping unknown
    * ones — LIST/INFO etc. are legal), requires PCM 16-bit. */
  def decodeWav(blob: Array[Byte]): WavPcm = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"WAV decode: $msg")
    if (blob.length < 12) fail(s"truncated header (${blob.length} bytes)")
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    if (new String(magic, "US-ASCII") != "RIFF") fail("not a RIFF file")
    buf.getInt // declared riff size; trust actual length instead
    buf.get(magic)
    if (new String(magic, "US-ASCII") != "WAVE") fail("not a WAVE form")
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var data: Option[Array[Short]] = None
    while (buf.remaining() >= 8) {
      buf.get(magic)
      val id = new String(magic, "US-ASCII")
      val len = buf.getInt
      if (len < 0 || len > buf.remaining())
        fail(s"chunk '$id' overruns the blob (len=$len)")
      id match {
        case "fmt " =>
          if (len < 16) fail(s"fmt chunk too short ($len)")
          val audioFormat = buf.getShort
          if (audioFormat != 1) fail(s"not PCM (format=$audioFormat)")
          val channels = buf.getShort.toInt
          val rate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          if (bits != 16) fail(s"only 16-bit PCM supported (bits=$bits)")
          buf.position(buf.position() + (len - 16)) // fmt extensions
          fmt = Some((channels, rate))
        case "data" =>
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort; i += 1 }
          if ((len & 1) == 1) buf.get() // odd chunks are padded
          data = Some(out)
        case _ => // LIST, fact, cue , ... — skip (plus pad byte)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    val (ch, rate) = fmt.getOrElse(fail("no fmt chunk"))
    WavPcm(rate, ch, data.getOrElse(fail("no data chunk")))
  }

  // ---------------------------------------------------------------- BMP

  /** Decoded 24-bit image: BGR bytes, row-major, TOP-DOWN, 3 bytes/px. */
  final case class BgrImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != ${width}x$height x3")
  }

  private def bmpRowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** BITMAPINFOHEADER, 24bpp, uncompressed, bottom-up rows padded to 4. */
  def encodeBmp(img: BgrImage): Array[Byte] = {
    val stride = bmpRowStride(img.width)
    val dataLen = stride * img.height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel offset
    buf.putInt(40).putInt(img.width).putInt(img.height)
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var y = img.height - 1
    while (y >= 0) { // bottom-up
      buf.put(img.pixels, y * img.width * 3, img.width * 3)
      var pad = stride - img.width * 3
      while (pad > 0) { buf.put(0: Byte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a BMP blob: BITMAPINFOHEADER (or larger), 24bpp uncompressed;
    * handles bottom-up AND top-down (negative height) row order. */
  def decodeBmp(blob: Array[Byte]): BgrImage = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"BMP decode: $msg")
    if (blob.length < 54) fail(s"truncated header (${blob.length} bytes)")
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.get() != 'B'.toByte || buf.get() != 'M'.toByte)
      fail("not a BM file")
    buf.getInt; buf.getInt
    val pixelOffset = buf.getInt
    val headerSize = buf.getInt
    if (headerSize < 40) fail(s"unsupported DIB header ($headerSize)")
    val width = buf.getInt
    val rawHeight = buf.getInt
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    buf.getShort // planes
    val bpp = buf.getShort
    if (bpp != 24) fail(s"only 24bpp supported (bpp=$bpp)")
    val compression = buf.getInt
    if (compression != 0) fail(s"compressed BMP unsupported ($compression)")
    if (width <= 0 || height == 0) fail(s"bad dims ${width}x$rawHeight")
    val stride = bmpRowStride(width)
    if (pixelOffset.toLong + stride.toLong * height > blob.length)
      fail("pixel data overruns the blob")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      System.arraycopy(blob, pixelOffset + srcRow * stride,
        out, y * width * 3, width * 3)
      y += 1
    }
    BgrImage(width, height, out)
  }

  /** Nearest-neighbor resize — the real pixel transform behind
    * [[Multimodal.resizeMeta]]'s metadata contract. Source pixel for
    * target (x, y) is (x·W/w, y·H/h) in integer arithmetic (floor), the
    * standard nearest-neighbor grid. */
  def resizeNearest(img: BgrImage, w: Int, h: Int): BgrImage = {
    require(w > 0 && h > 0, s"bad target dims ${w}x$h")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        System.arraycopy(img.pixels, (sy * img.width + sx) * 3,
          out, (y * w + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    BgrImage(w, h, out)
  }

  // ------------------------------------------------------------ kernels

  /** Real audio kernel over the [[Multimodal.MediaKernel]] seam:
    * [n_samples, sample_rate, channels, peak, rms, zero-crossing count].
    * Integer accumulations, one float division each — deterministic. */
  object WavKernel extends Multimodal.MediaKernel {
    override def featurize(blob: Array[Byte]): Array[Float] = {
      val wav = decodeWav(blob)
      var sumSq = 0L
      var peak = 0L
      var zc = 0L
      var i = 0
      while (i < wav.samples.length) {
        val v = wav.samples(i).toLong
        sumSq += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && (v > 0) != (wav.samples(i - 1) > 0L)) zc += 1
        i += 1
      }
      val n = math.max(1, wav.samples.length)
      Array(wav.samples.length.toFloat, wav.sampleRate.toFloat,
        wav.channels.toFloat, peak.toFloat,
        math.sqrt(sumSq.toDouble / n).toFloat, zc.toFloat)
    }
  }

  /** Real image kernel: [width, height, meanB, meanG, meanR, mean luma]
    * (means from exact integer channel sums). */
  object BmpKernel extends Multimodal.MediaKernel {
    override def featurize(blob: Array[Byte]): Array[Float] = {
      val img = decodeBmp(blob)
      var (sb, sg, sr) = (0L, 0L, 0L)
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
