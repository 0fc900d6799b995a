package graft

import graft.multimodal.{Codecs, Multimodal}
import graft.multimodal.Codecs.BgrImage

/** Real AVI video-container and G.711 μ-law codec coverage
  * (multimodal.Codecs round-11 additions): container round-trips,
  * chunk-walk robustness, companding-law identities, the FrameKernel
  * seam, and loud failure on malformed input.
  */
class AviUlawSpec extends SparkSpec {

  private def frame(w: Int, h: Int, seed: Int): BgrImage =
    BgrImage(w, h, Array.tabulate(w * h * 3)(i =>
      ((i * 7 + seed * 31 + 3) % 256).toByte))

  test("AVI round-trip: dims, fps, frame count, exact pixels") {
    val frames = (0 until 3).map(frame(10, 8, _)) // width 10 pads stride
    val avi = Codecs.encodeAviDib(25, frames)
    val back = Codecs.decodeAviDib(avi)
    assert(back.fps == 25 && back.frames.length == 3)
    back.frames.zip(frames).foreach { case (got, want) =>
      assert(got.width == 10 && got.height == 8)
      assert(got.pixels.toSeq == want.pixels.toSeq)
    }
  }

  test("AVI decode skips unknown chunks (JUNK) like the WAV walker") {
    val avi = Codecs.encodeAviDib(10, Seq(frame(4, 4, 0)))
    // splice a JUNK chunk between hdrl and movi; patch the RIFF size
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0, 1, 2, 3, 4, 5, 6)
    val hdrlLen = java.nio.ByteBuffer.wrap(avi, 16, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val cut = 12 + 8 + hdrlLen // end of the hdrl LIST
    val spliced = avi.take(cut) ++ junk ++ avi.drop(cut)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val back = Codecs.decodeAviDib(spliced)
    assert(back.frames.length == 1)
    assert(back.frames.head.pixels.toSeq == frame(4, 4, 0).pixels.toSeq)
  }

  test("AVI malformed blobs fail loudly") {
    intercept[IllegalArgumentException](
      Codecs.decodeAviDib(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException]( // a WAV is RIFF but not AVI
      Codecs.decodeAviDib(Codecs.encodeWav(8000, 1, Array[Short](1, 2))))
    // flip the strf bit depth to 8 — decoder must refuse
    val avi = Codecs.encodeAviDib(10, Seq(frame(4, 4, 0)))
    val idx = avi.indexOfSlice("strf".getBytes("US-ASCII"))
    val bad = avi.clone()
    bad(idx + 8 + 14) = 8 // biBitCount lives 14 bytes into the header
    intercept[IllegalArgumentException](Codecs.decodeAviDib(bad))
  }

  test("AviFrameKernel re-emits decoded frames as parseable BMP blobs") {
    val frames = (0 until 2).map(frame(6, 5, _))
    val avi = Codecs.encodeAviDib(12, frames)
    val sp = spark
    import sp.implicits._
    val media = Seq((9L, avi)).toDF("media_id", "blob")
    val out = Multimodal.sampleFrames(spark, media, Codecs.AviFrameKernel)
      .collect().sortBy(_.frame_idx)
    assert(out.length == 2)
    out.zipWithIndex.foreach { case (fr, f) =>
      assert(fr.media_id == 9L && fr.frame_idx == f)
      val img = Codecs.decodeBmp(fr.frame)
      assert(img.width == 6 && img.height == 5)
      assert(img.pixels.toSeq == frames(f).pixels.toSeq)
    }
  }

  test("μ-law expansion matches the G.711 identities") {
    // transmitted codes are complemented: 0xFF → +0, 0x7F → −0 (= 0)
    assert(Codecs.ulawToPcm16(0xff.toByte) == 0)
    assert(Codecs.ulawToPcm16(0x7f.toByte) == 0)
    // 0x00 is the most negative code: −(((15·8+132)<<7)−132) = −32124
    assert(Codecs.ulawToPcm16(0x00.toByte) == -32124)
    // 0x80 is the most positive code: +32124
    assert(Codecs.ulawToPcm16(0x80.toByte) == 32124)
    // the negative half (0x00..0x7F) rises monotonically toward 0
    val negs = (0x00 to 0x7f).map(b => Codecs.ulawToPcm16(b.toByte).toInt)
    assert(negs.forall(_ <= 0))
    assert(negs.zip(negs.tail).forall { case (a, b) => a <= b })
  }

  test("μ-law WAV round-trip through the real chunk walk") {
    val ulaw = Array.tabulate(251)(i => (i * 7 % 256).toByte) // odd length
    val wav = Codecs.decodeWav(Codecs.encodeWavUlaw(8000, 1, ulaw))
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    assert(wav.samples.toSeq == ulaw.map(Codecs.ulawToPcm16).toSeq)
  }

  test("A-law expansion matches the G.711 identities") {
    // transmitted codes are XOR 0x55: 0x55 → −8 and 0xD5 → +8 (the
    // smallest magnitudes — A-law has no ±0 codes)
    assert(Codecs.alawToPcm16(0x55.toByte) == -8)
    assert(Codecs.alawToPcm16(0xd5.toByte) == 8)
    // extreme codes: 0x2A → −32256, 0xAA → +32256
    assert(Codecs.alawToPcm16(0x2a.toByte) == -32256)
    assert(Codecs.alawToPcm16(0xaa.toByte) == 32256)
    // every decoded magnitude is even and bounded by 32256
    val all = (0 to 255).map(b => Codecs.alawToPcm16(b.toByte).toInt)
    assert(all.forall(v => math.abs(v) <= 32256 && v % 2 == 0))
  }

  test("A-law WAV round-trip through the real chunk walk") {
    val alaw = Array.tabulate(100)(i => (i * 11 % 256).toByte)
    val wav = Codecs.decodeWav(Codecs.encodeWavAlaw(8000, 1, alaw))
    assert(wav.samples.toSeq == alaw.map(Codecs.alawToPcm16).toSeq)
  }

  test("WAV decoder refuses unsupported codings loudly") {
    val bad = Codecs.encodeWavUlaw(8000, 1, Array[Byte](1, 2))
    bad(20) = 2 // ADPCM — not implemented, must not decode as G.711
    intercept[IllegalArgumentException](Codecs.decodeWav(bad))
  }

  // pixel (x, y) encodes its own coordinates in (B, G) for geometry tests
  private def coordImage(w: Int, h: Int): BgrImage = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      px((y * w + x) * 3) = x.toByte
      px((y * w + x) * 3 + 1) = y.toByte
      px((y * w + x) * 3 + 2) = 7.toByte
    }
    BgrImage(w, h, px)
  }
  private def at(img: BgrImage, x: Int, y: Int): (Int, Int) = {
    val i = (y * img.width + x) * 3
    (img.pixels(i) & 0xff, img.pixels(i + 1) & 0xff)
  }

  test("crop picks the exact window; out-of-bounds refuses") {
    val img = coordImage(9, 7)
    val c = Codecs.crop(img, 2, 3, 4, 3)
    assert(c.width == 4 && c.height == 3)
    assert(at(c, 0, 0) == ((2, 3)) && at(c, 3, 2) == ((5, 5)))
    intercept[IllegalArgumentException](Codecs.crop(img, 6, 0, 4, 3))
  }

  test("hflip mirrors x; rot90cw maps (x,y) → source (y, H−1−x)") {
    val img = coordImage(5, 4)
    val f = Codecs.hflip(img)
    assert(at(f, 0, 2) == ((4, 2)) && at(f, 4, 0) == ((0, 0)))
    val r = Codecs.rot90cw(img) // 5×4 → 4×5
    assert(r.width == 4 && r.height == 5)
    // out(x, y) = in(y, 3 − x): left column of out = bottom row of in
    assert(at(r, 0, 0) == ((0, 3)) && at(r, 3, 4) == ((4, 0)))
    // double flip and four rotations are identities
    assert(Codecs.hflip(f).pixels.toSeq == img.pixels.toSeq)
    assert(Codecs.rot90cw(Codecs.rot90cw(Codecs.rot90cw(r))).pixels.toSeq
      == img.pixels.toSeq)
  }

  test("downsample2 truncating pair mean, odd tail dropped, rate halved") {
    val pcm = Codecs.WavPcm(16000, 1, Array[Short](10, 13, -7, -8, 5))
    val ds = Codecs.downsample2(pcm)
    assert(ds.sampleRate == 8000)
    // (10+13)/2 = 11 (truncates), (-7-8)/2 = -7 (truncates toward zero,
    // matching SQL integer division); trailing 5 dropped
    assert(ds.samples.toSeq == Seq[Short](11, -7))
    intercept[IllegalArgumentException](
      Codecs.downsample2(Codecs.WavPcm(16000, 2, Array[Short](1, 2))))
  }
}
