package graft

import graft.multimodal.{Codecs, Multimodal}
import graft.multimodal.Codecs.{BgrImage, WavPcm}

/** Real pure-JVM codec coverage (multimodal.Codecs): WAV and BMP
  * round-trips, chunk-walking robustness, nearest-neighbor resize
  * geometry, kernel features through the partition-wise Spark seam, and
  * loud failure on malformed blobs.
  */
class CodecsSpec extends SparkSpec {

  private def sine(n: Int, amp: Double, period: Int): Array[Short] =
    Array.tabulate(n)(i =>
      math.round(amp * math.sin(2 * math.Pi * i / period)).toShort)

  test("μ-law encoder: involution over wire codes, bounded error") {
    // encode(decode(b)) == b for every wire code except 0x7F (the -0
    // code collapses onto +0's 0xFF -- the standard's one merged pair)
    (0 until 256).map(_.toByte).foreach { b =>
      val rt = Codecs.pcm16ToUlaw(Codecs.ulawToPcm16(b))
      if ((b & 0xff) == 0x7f) assert((rt & 0xff) == 0xff)
      else assert(rt == b, f"code 0x${b & 0xff}%02x round-tripped to 0x${rt & 0xff}%02x")
    }
    // quantization error bounded by half the largest segment step (1<<7 * 8 / 2 = 512)
    Seq(-30000, -12345, -1, 0, 1, 77, 1234, 30000, 32767, -32768).foreach { v =>
      val err = math.abs(Codecs.ulawToPcm16(Codecs.pcm16ToUlaw(v.toShort)) - v)
      assert(err <= 1024, s"pcm $v error $err beyond segment bound")
    }
  }

  test("WAV round-trip: encode → decode recovers rate, channels, samples") {
    val s = sine(4800, 3000.0, 48)
    val wav = Codecs.decodeWav(Codecs.encodeWav(16000, 1, s))
    assert(wav == WavPcm(16000, 1, wav.samples))
    assert(wav.sampleRate == 16000 && wav.channels == 1)
    assert(wav.samples.toSeq == s.toSeq)
  }

  test("WAV decode walks unknown chunks and odd-length padding") {
    val s = Array[Short](100, -200, 300)
    val base = Codecs.encodeWav(8000, 1, s)
    // splice a 3-byte (odd) junk chunk between fmt and data
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val wav = Codecs.decodeWav(spliced)
    assert(wav.samples.toSeq == s.toSeq && wav.sampleRate == 8000)
  }

  test("WAV malformed blobs fail loudly") {
    intercept[IllegalArgumentException](Codecs.decodeWav(Array[Byte](1, 2)))
    intercept[IllegalArgumentException](
      Codecs.decodeWav("RIFXnope".getBytes ++ new Array[Byte](40)))
    // PCM format check: flip audioFormat to 2 (ADPCM)
    val bad = Codecs.encodeWav(8000, 1, Array[Short](1))
    bad(20) = 2
    intercept[IllegalArgumentException](Codecs.decodeWav(bad))
  }

  test("IMA ADPCM: known-vector decode through the real container") {
    // hand-computed against the IMA-1992 tables: nibbles 0,7,15,3 from
    // (pred 0, idx 0) → samples 0(header),0,11,-19,10
    val blob = Codecs.encodeWavImaAdpcm(8000, Array[Byte](0, 7, 15, 3))
    val wav = Codecs.decodeWav(blob)
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    assert(wav.samples.toSeq == Seq[Short](0, 0, 11, -19, 10))
  }

  test("IMA ADPCM: predictor clamps at both rails") {
    // at idx 88 (step 32767) one max-magnitude nibble overshoots the rail
    val up = Codecs.decodeWav(
      Codecs.encodeWavImaAdpcm(8000, Array[Byte](7, 0), 32000, 88))
    assert(up.samples(1) == 32767)
    val dn = Codecs.decodeWav(
      Codecs.encodeWavImaAdpcm(8000, Array[Byte](15, 0), -32000, 88))
    assert(dn.samples(1) == -32768)
    // step index clamps at 88: a second loud nibble must not overrun the
    // 89-entry table
    val twice = Codecs.decodeWav(
      Codecs.encodeWavImaAdpcm(8000, Array[Byte](7, 7), 0, 88))
    assert(twice.samples.length == 3)
  }

  test("IMA ADPCM: malformed inputs fail loudly") {
    intercept[IllegalArgumentException](
      Codecs.encodeWavImaAdpcm(8000, Array[Byte](1))) // odd nibble count
    intercept[IllegalArgumentException](
      Codecs.encodeWavImaAdpcm(8000, Array[Byte](1, 2), 0, 89)) // idx > 88
    val blob = Codecs.encodeWavImaAdpcm(8000, Array[Byte](1, 2))
    // data layout from the end: [pred0 ×2, idx, reserved, packed, pad]
    blob(blob.length - 4) = 90 // corrupt the block's step index past 88
    intercept[IllegalArgumentException](Codecs.decodeWav(blob))
  }

  test("BMP round-trip incl. row padding (width not divisible by 4)") {
    // 3x2 top-down BGR gradient — stride pads 9 bytes to 12
    val px = Array.tabulate(3 * 2 * 3)(i => (i * 7 % 251).toByte)
    val img = BgrImage(3, 2, px)
    val back = Codecs.decodeBmp(Codecs.encodeBmp(img))
    assert(back.width == 3 && back.height == 2)
    assert(back.pixels.toSeq == px.toSeq)
  }

  test("BMP nearest-neighbor resize picks the floor-grid source pixels") {
    // 4x4 image whose pixel (x,y) encodes its own coordinates
    val px = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      px((y * 4 + x) * 3) = (x * 10 + y).toByte // B encodes (x, y)
    }
    val half = Codecs.resizeNearest(BgrImage(4, 4, px), 2, 2)
    // target (x,y) ← source (x*4/2, y*4/2) = (2x, 2y)
    val got = for (y <- 0 until 2; x <- 0 until 2)
      yield half.pixels((y * 2 + x) * 3)
    assert(got == Seq(0, 20, 2, 22).map(_.toByte))
    // upscale 2x2 → 4x4 then check block structure
    val up = Codecs.resizeNearest(half, 4, 4)
    assert(up.pixels(0) == half.pixels(0) && up.pixels(3) == half.pixels(0))
  }

  test("real kernels flow through the partition-wise MediaKernel seam") {
    val sp = spark
    import sp.implicits._
    val blobs = Seq(
      (1L, Codecs.encodeWav(16000, 1, sine(1600, 1000.0, 16))),
      (2L, Codecs.encodeWav(8000, 1, Array[Short](0, 500, -500, 500))))
      .toDF("media_id", "blob")
    val feats = Multimodal.extractFeatures(spark, blobs, Codecs.WavKernel)
      .collect().map(f => f.media_id -> f.feature).toMap
    assert(feats(1L)(0) == 1600f && feats(1L)(1) == 16000f)
    // sine RMS ≈ amp/√2 (ties in round keep it within 1%)
    assert(math.abs(feats(1L)(4) - 1000.0 / math.sqrt(2)) < 10)
    assert(feats(2L)(0) == 4f && feats(2L)(3) == 500f)
    // bytes → features must equal a direct kernel call (plumbing adds
    // nothing)
    val direct = Codecs.WavKernel.featurize(
      Codecs.encodeWav(8000, 1, Array[Short](0, 500, -500, 500)))
    assert(feats(2L).toSeq == direct.toSeq)
  }

  test("BMP kernel means are exact integer-sum means") {
    // 2x1: pure blue (255,0,0 BGR) next to pure red (0,0,255 BGR)
    val img = BgrImage(2, 1, Array[Byte](-1, 0, 0, 0, 0, -1))
    val f = Codecs.BmpKernel.featurize(Codecs.encodeBmp(img))
    assert(f(0) == 2f && f(1) == 1f)
    assert(f(2) == 127.5f && f(3) == 0f && f(4) == 127.5f)
  }
}
