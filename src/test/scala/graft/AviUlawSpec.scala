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
}
