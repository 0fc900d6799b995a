package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the byte-layout container formats that need
  * no codec library at all: WAV (RIFF; PCM16 + G.711 μ-law/A-law +
  * IMA ADPCM), BMP
  * (BITMAPINFOHEADER/24bpp), and AVI (RIFF 'vids'/'DIB ' video) — plus
  * the pixel/sample transforms behind the multimodal operators (resize,
  * crop, flip, rotate, decimation). Compressed image formats decode for
  * real too, via the JDK readers in [[ImageIo]]; only formats whose
  * codecs the JVM genuinely lacks (H.264, FLAC) remain stubbed behind
  * the [[Multimodal.MediaKernel]] seam. Malformed input fails loudly
  * (the EventsTs contract: a wrong parse must never produce plausible
  * garbage).
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

  /** G.711 μ-law expansion (ITU-T G.711, the 8-bit telephony companding
    * standard): complement, split sign/exponent/mantissa, rebuild the
    * 13-bit magnitude with the +0x84 bias trick, apply sign. Pure integer
    * arithmetic — bit-exact everywhere.
    */
  /** G.711 μ-law compression (the encode half of [[ulawToPcm16]] — CCITT
    * linear2ulaw): clip to 32635, add the 0x84 bias, locate the exponent
    * segment (MSB position − 7), take the 4-bit mantissa below it, pack
    * sign|exp|mantissa and complement for the wire. Pure integer
    * arithmetic. Round-trips every wire code except 0x7F (the −0 code:
    * both ±0 decode to 0, which re-encodes to +0's 0xFF — the standard's
    * one collapsed pair).
    */
  def pcm16ToUlaw(pcm: Short): Byte = {
    val sign = if (pcm < 0) 0x80 else 0
    var x = if (pcm < 0) -pcm.toInt else pcm.toInt
    if (x > 32635) x = 32635
    x += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)).toByte
  }

  def ulawToPcm16(b: Byte): Short = {
    val u = (~b) & 0xff
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** G.711 A-law expansion (the European telephony companding half):
    * XOR with 0x55, split sign/exponent/mantissa, rebuild the 12-bit
    * magnitude ((m<<4)+8 in the linear segment, ((m<<4)+0x108)<<(e−1)
    * above it), apply sign. Pure integer arithmetic — bit-exact.
    */
  def alawToPcm16(b: Byte): Short = {
    val u = (b ^ 0x55) & 0xff
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val mag =
      if (exponent == 0) (mantissa << 4) + 8
      else ((mantissa << 4) + 0x108) << (exponent - 1)
    (if ((u & 0x80) != 0) mag else -mag).toShort
  }

  /** IMA ADPCM step-size table (IMA "Recommended Practices for Enhancing
    * Digital Audio Compatibility", 1992 — the table every fmt-0x11 WAV
    * decoder ships verbatim): 89 quantizer steps, ~1.1× geometric growth.
    */
  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA ADPCM index-adjust table, indexed by the nibble's 3 magnitude
    * bits (the sign bit does not move the step index).
    */
  private val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM decode step: (predictor, stepIndex, nibble) → updated
    * (predictor, stepIndex). diff = step/8 + bit-selected step, step/2,
    * step/4 halves; sign bit subtracts; both outputs clamped. Pure
    * integer arithmetic — bit-exact everywhere.
    */
  def imaAdpcmStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val n = nibble & 0xf
    val step = ImaStepTable(idx)
    var diff = step >> 3
    if ((n & 4) != 0) diff += step
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 1) != 0) diff += step >> 2
    var p = if ((n & 8) != 0) pred - diff else pred + diff
    if (p > 32767) p = 32767 else if (p < -32768) p = -32768
    var i = idx + ImaIndexTable(n & 7)
    if (i < 0) i = 0 else if (i > 88) i = 88
    (p, i)
  }

  /** Parse a RIFF/WAVE blob: walks chunks in any order (skipping unknown
    * ones — LIST/INFO etc. are legal). Supported sample codings: format 1
    * (PCM, 16-bit), format 6 (G.711 A-law, 8-bit), format 7 (G.711
    * μ-law, 8-bit) and format 17 (IMA ADPCM, 4-bit, mono block walk) —
    * all expanded to PCM16.
    */
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
    var fmt: Option[(Int, Int, Int)] = None // (format, channels, sampleRate)
    var blockAlign = 0 // needed for the ADPCM block walk
    var data: Option[Array[Byte]] = None // raw — decoded after the walk
    while (buf.remaining() >= 8) {
      buf.get(magic)
      val id = new String(magic, "US-ASCII")
      val len = buf.getInt
      if (len < 0 || len > buf.remaining())
        fail(s"chunk '$id' overruns the blob (len=$len)")
      id match {
        case "fmt " =>
          if (len < 16) fail(s"fmt chunk too short ($len)")
          val audioFormat = buf.getShort.toInt
          val channels = buf.getShort.toInt
          val rate = buf.getInt
          buf.getInt // byte rate
          blockAlign = buf.getShort.toInt
          val bits = buf.getShort.toInt
          (audioFormat, bits) match {
            case (1, 16) => // PCM16
            case (6, 8) => // G.711 A-law
            case (7, 8) => // G.711 μ-law
            case (17, 4) => // IMA ADPCM
              if (channels != 1) fail("IMA ADPCM: mono only")
            case _ => fail("unsupported coding " +
              s"(format=$audioFormat, bits=$bits; " +
              "PCM16, A-law/8, μ-law/8, IMA-ADPCM/4 only)")
          }
          buf.position(buf.position() + (len - 16)) // fmt extensions
          fmt = Some((audioFormat, channels, rate))
        case "data" =>
          val raw = new Array[Byte](len)
          buf.get(raw)
          if ((len & 1) == 1) buf.get() // odd chunks are padded
          data = Some(raw)
        case _ => // LIST, fact, cue , ... — skip (plus pad byte)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    val (format, ch, rate) = fmt.getOrElse(fail("no fmt chunk"))
    val raw = data.getOrElse(fail("no data chunk"))
    val samples = format match {
      case 1 =>
        val out = new Array[Short](raw.length / 2)
        val db = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < out.length) { out(i) = db.getShort; i += 1 }
        out
      case 6 =>
        val out = new Array[Short](raw.length)
        var i = 0
        while (i < out.length) { out(i) = alawToPcm16(raw(i)); i += 1 }
        out
      case 7 =>
        val out = new Array[Short](raw.length)
        var i = 0
        while (i < out.length) { out(i) = ulawToPcm16(raw(i)); i += 1 }
        out
      case 17 =>
        // block walk: 4-byte header (initial predictor int16, step index
        // byte, reserved) emits the predictor as the block's first
        // sample, then each data byte carries two nibbles, low first
        val ba = if (blockAlign >= 8) blockAlign else raw.length
        val out = scala.collection.mutable.ArrayBuffer.empty[Short]
        var off = 0
        while (off + 4 <= raw.length) {
          val blk = math.min(ba, raw.length - off)
          var pred = ((raw(off) & 0xff) | (raw(off + 1) << 8)).toShort.toInt
          var idx = raw(off + 2) & 0xff
          if (idx > 88) fail(s"ADPCM block step index $idx > 88")
          out += pred.toShort
          var i = off + 4
          while (i < off + blk) {
            val b = raw(i) & 0xff
            var half = 0
            while (half < 2) {
              val n = if (half == 0) b & 0xf else (b >> 4) & 0xf
              val (p2, i2) = imaAdpcmStep(pred, idx, n)
              pred = p2
              idx = i2
              out += pred.toShort
              half += 1
            }
            i += 1
          }
          off += blk
        }
        out.toArray
    }
    WavPcm(rate, ch, samples)
  }

  /** RIFF/WAVE container for IMA ADPCM (format 17, 4 bits/sample, mono,
    * ONE block): 4-byte block header carrying the initial predictor and
    * step index, then the nibbles packed two per byte, low nibble first.
    * Writes the fmt extension (samples-per-block) and the fact chunk the
    * compressed-WAV spec expects; [[decodeWav]] round-trips it through
    * the real block walk + [[imaAdpcmStep]].
    */
  def encodeWavImaAdpcm(sampleRate: Int, nibbles: Array[Byte],
      pred0: Short = 0, idx0: Int = 0): Array[Byte] = {
    require(nibbles.length % 2 == 0, "pad the nibble stream to even length")
    require(idx0 >= 0 && idx0 <= 88, s"step index $idx0 out of [0, 88]")
    val dataLen = 4 + nibbles.length / 2
    val samplesPerBlock = 1 + nibbles.length
    val pad = dataLen & 1
    val buf = ByteBuffer.allocate(12 + (8 + 20) + (8 + 4) + 8 + dataLen + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + (8 + 20) + (8 + 4) + 8 + dataLen + pad)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17) // IMA ADPCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * dataLen / samplesPerBlock) // byte rate
      .putShort(dataLen.toShort) // block align = the single block
      .putShort(4) // bits per sample
      .putShort(2) // cbSize
      .putShort(samplesPerBlock.toShort)
    buf.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samplesPerBlock)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.putShort(pred0).put(idx0.toByte).put(0: Byte)
    var i = 0
    while (i < nibbles.length) {
      buf.put((((nibbles(i + 1) & 0xf) << 4) | (nibbles(i) & 0xf)).toByte)
      i += 2
    }
    if (pad == 1) buf.put(0: Byte)
    buf.array()
  }

  private def encodeWavG711(format: Short, sampleRate: Int, channels: Int,
      data: Array[Byte]): Array[Byte] = {
    val dataLen = data.length
    val pad = dataLen & 1
    val buf = ByteBuffer.allocate(44 + dataLen + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen + pad)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(format)
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels) // byte rate (1 byte/sample)
      .putShort(channels.toShort) // block align
      .putShort(8) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.put(data)
    if (pad == 1) buf.put(0: Byte)
    buf.array()
  }

  /** RIFF/WAVE container for G.711 μ-law bytes (format 7, 8 bits/sample). */
  def encodeWavUlaw(sampleRate: Int, channels: Int,
      ulaw: Array[Byte]): Array[Byte] =
    encodeWavG711(7, sampleRate, channels, ulaw)

  /** RIFF/WAVE container for G.711 A-law bytes (format 6, 8 bits/sample). */
  def encodeWavAlaw(sampleRate: Int, channels: Int,
      alaw: Array[Byte]): Array[Byte] =
    encodeWavG711(6, sampleRate, channels, alaw)

  /** 2× audio decimation with pair averaging (mono): out[i] =
    * (s[2i] + s[2i+1]) / 2 in truncating integer division, trailing odd
    * sample dropped, sample rate halved — the cheap anti-aliased
    * downsample a speech pipeline runs to normalize corpus rates.
    */
  def downsample2(pcm: WavPcm): WavPcm = {
    require(pcm.channels == 1, "downsample2 is mono-only " +
      s"(channels=${pcm.channels}); deinterleave first")
    val n = pcm.samples.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((pcm.samples(2 * i) + pcm.samples(2 * i + 1)) / 2).toShort
      i += 1
    }
    WavPcm(pcm.sampleRate / 2, pcm.channels, out)
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

  /** Crop to the `w`×`h` window at (x0, y0) — bounds-checked, real pixel
    * copy (the augmentation primitive every vision data pipeline runs).
    */
  def crop(img: BgrImage, x0: Int, y0: Int, w: Int, h: Int): BgrImage = {
    require(x0 >= 0 && y0 >= 0 && w > 0 && h > 0 &&
      x0 + w <= img.width && y0 + h <= img.height,
      s"crop ${w}x$h@($x0,$y0) outside ${img.width}x${img.height}")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      System.arraycopy(img.pixels, ((y0 + y) * img.width + x0) * 3,
        out, y * w * 3, w * 3)
      y += 1
    }
    BgrImage(w, h, out)
  }

  /** Horizontal mirror: out(x, y) = in(w−1−x, y). */
  def hflip(img: BgrImage): BgrImage = {
    val out = new Array[Byte](img.pixels.length)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        System.arraycopy(img.pixels,
          (y * img.width + (img.width - 1 - x)) * 3,
          out, (y * img.width + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    BgrImage(img.width, img.height, out)
  }

  /** Rotate 90° clockwise: dims swap, out(x, y) = in(y, H_in−1−x). */
  def rot90cw(img: BgrImage): BgrImage = {
    val w = img.height // out dims
    val h = img.width
    val out = new Array[Byte](img.pixels.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // out(x, y) = in(xi = y, yi = H_in−1−x)
        System.arraycopy(img.pixels,
          ((img.height - 1 - x) * img.width + y) * 3,
          out, (y * w + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    BgrImage(w, h, out)
  }

  /** BT.601 integer luma per pixel: (29·B + 150·G + 77·R) >> 8 — the
    * fixed-point spelling of 0.114/0.587/0.299 every integer RGB→gray
    * pipeline uses. Pure integer, bit-exact everywhere.
    */
  def grayLuma(img: BgrImage): Array[Int] = {
    val n = img.width * img.height
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (29 * (img.pixels(i * 3) & 0xff) +
        150 * (img.pixels(i * 3 + 1) & 0xff) +
        77 * (img.pixels(i * 3 + 2) & 0xff)) >> 8
      i += 1
    }
    out
  }

  /** Histogram equalization over an 8-bit luma plane: the truncating
    * CDF map v ↦ (cdf(v)·255) / n — integer division, so both the LUT
    * and the remapped plane are bit-exact across engines.
    */
  def equalize(luma: Array[Int]): Array[Int] = {
    val hist = new Array[Long](256)
    luma.foreach(v => hist(v) += 1)
    val lut = new Array[Int](256)
    var cdf = 0L
    var v = 0
    while (v < 256) {
      cdf += hist(v)
      lut(v) = (cdf * 255 / luma.length).toInt
      v += 1
    }
    luma.map(lut)
  }

  // ---------------------------------------------------------------- AVI

  /** Decoded AVI video: frame rate plus fully decoded frames. */
  final case class AviVideo(fps: Int, frames: Seq[BgrImage])

  /** RIFF/AVI container with one uncompressed 24bpp DIB video stream —
    * the classic 'vids'/'DIB ' AVI (Microsoft AVI RIFF spec): hdrl LIST
    * (avih + strl[strh,strf]) then movi LIST with one '00db' chunk per
    * frame, rows bottom-up and 4-byte padded exactly like BMP pixel data.
    */
  def encodeAviDib(fps: Int, frames: Seq[BgrImage]): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    require(fps > 0, s"bad fps $fps")
    val w = frames.head.width
    val h = frames.head.height
    frames.foreach(f => require(f.width == w && f.height == h,
      s"all frames must be ${w}x$h"))
    val stride = bmpRowStride(w)
    val frameLen = stride * h
    def frameBytes(img: BgrImage): Array[Byte] = {
      val out = new Array[Byte](frameLen)
      var y = 0
      while (y < h) { // bottom-up, padded — the DIB layout BMP uses
        System.arraycopy(img.pixels, (h - 1 - y) * w * 3, out, y * stride,
          w * 3)
        y += 1
      }
      out
    }
    val moviLen = 4 + frames.length * (8 + frameLen) // 'movi' + chunks
    val strlLen = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen) // 'hdrl' + avih + LIST strl
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
      .putInt(frames.length).putInt(0).putInt(1) // totalFrames, initial, streams
      .putInt(frameLen).putInt(w).putInt(h) // suggestedBuffer, width, height
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); buf.putInt(strlLen); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, initial
      .putInt(1).putInt(fps) // dwScale=1, dwRate=fps → fps frames/sec
      .putInt(0).putInt(frames.length) // start, length (frames)
      .putInt(frameLen).putInt(0).putInt(0) // suggestedBuffer, quality, sampleSize
      .putShort(0).putShort(0) // rcFrame left, top
      .putShort(w.toShort).putShort(h.toShort) // rcFrame right, bottom
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(frameLen)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(moviLen); fourcc("movi")
    frames.foreach { img =>
      fourcc("00db"); buf.putInt(frameLen); buf.put(frameBytes(img))
    }
    buf.array()
  }

  /** Parse a RIFF/AVI blob with a REAL container walk: RIFF form check,
    * hdrl LIST → strh ('vids'/'DIB ' only) + strf (BITMAPINFOHEADER,
    * 24bpp uncompressed), movi LIST → every '##db' frame chunk, each
    * converted from bottom-up padded DIB rows to a top-down [[BgrImage]].
    * Unknown chunks are skipped (odd lengths padded), exactly like the
    * WAV walker; malformed structure fails loudly.
    */
  def decodeAviDib(blob: Array[Byte]): AviVideo = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"AVI decode: $msg")
    if (blob.length < 12) fail(s"truncated header (${blob.length} bytes)")
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    def fourcc(): String = { buf.get(magic); new String(magic, "US-ASCII") }
    if (fourcc() != "RIFF") fail("not a RIFF file")
    buf.getInt // declared size; trust actual length instead
    if (fourcc() != "AVI ") fail("not an AVI form")
    var dims: Option[(Int, Int)] = None // from strf
    var fps = 0
    val rawFrames = Seq.newBuilder[Array[Byte]]
    // walk chunks between [buf.position, end); LIST chunks recurse
    def walk(end: Int): Unit = {
      while (end - buf.position() >= 8) {
        val id = fourcc()
        val len = buf.getInt
        if (len < 0 || len > end - buf.position())
          fail(s"chunk '$id' overruns its parent (len=$len)")
        val next = buf.position() + len + (len & 1)
        id match {
          case "LIST" =>
            fourcc() // list type (hdrl/strl/movi/...) — contents decide
            walk(buf.position() + len - 4)
          case "strh" =>
            if (len < 56) fail(s"strh too short ($len)")
            val fccType = fourcc()
            val handler = fourcc()
            if (fccType == "vids") {
              if (handler != "DIB " && handler != "    ")
                fail(s"unsupported video codec '$handler' (DIB only)")
              buf.getInt; buf.getShort; buf.getShort; buf.getInt // flags..initial
              val scale = buf.getInt
              val rate = buf.getInt
              if (scale <= 0 || rate <= 0 || rate % scale != 0)
                fail(s"unsupported frame timing rate=$rate scale=$scale")
              fps = rate / scale
            }
          case "strf" =>
            if (dims.isEmpty) { // first video strf wins
              if (len < 40) fail(s"strf too short ($len)")
              buf.getInt // biSize
              val w = buf.getInt
              val h = buf.getInt
              buf.getShort // planes
              val bpp = buf.getShort
              val compression = buf.getInt
              if (bpp != 24) fail(s"only 24bpp DIB supported (bpp=$bpp)")
              if (compression != 0)
                fail(s"compressed AVI stream unsupported ($compression)")
              if (w <= 0 || h <= 0) fail(s"bad dims ${w}x$h")
              dims = Some((w, h))
            }
          case _ if id.length == 4 && id.endsWith("db") =>
            val raw = new Array[Byte](len)
            buf.get(raw)
            rawFrames += raw
          case _ => // idx1, JUNK, audio chunks, ... — skip
        }
        buf.position(next)
      }
    }
    walk(blob.length)
    val (w, h) = dims.getOrElse(fail("no video strf header"))
    val stride = bmpRowStride(w)
    val frames = rawFrames.result().map { raw =>
      if (raw.length < stride * h)
        fail(s"frame chunk ${raw.length} bytes < ${stride * h}")
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) { // bottom-up → top-down
        System.arraycopy(raw, (h - 1 - y) * stride, out, y * w * 3, w * 3)
        y += 1
      }
      BgrImage(w, h, out)
    }
    if (frames.isEmpty) fail("no frame chunks in movi")
    AviVideo(fps, frames)
  }

  /** REAL video frame extraction over the [[Multimodal.FrameKernel]]
    * seam: walks the AVI container and re-emits each decoded frame as a
    * standalone BMP blob (deterministic layout) — the video sibling of
    * [[Multimodal.GifFrameKernel]].
    */
  object AviFrameKernel extends Multimodal.FrameKernel {
    override def frames(blob: Array[Byte]): Seq[Array[Byte]] =
      decodeAviDib(blob).frames.map(encodeBmp)
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
