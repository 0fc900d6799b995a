package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal columns for a training-data pipeline (builder brief): media
  * as opaque `binary` columns with typed metadata, processed partition-wise.
  *
  * Decode status, honestly split by what the environment permits:
  * image containers decode for REAL — pure-JVM BMP/WAV in [[Codecs]] and
  * JDK `javax.imageio` PNG/JPEG/GIF/TIFF in [[ImageIo]] (the JDK ships
  * these readers headless; no external library needed). Only formats with
  * genuinely absent codecs (H.264 video, FLAC audio, …) remain
  * deterministic STUBS (clearly marked) behind the [[MediaKernel]] seam.
  * The Spark plumbing — schema shape, binary columns, partition-wise
  * batching, operator signatures — is identical for real and stub
  * kernels, and the real paths are oracle-gated (q_mm_wav_decode,
  * q_mm_bmp_resize, q_mm_png_decode, q_mm_frames).
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int,
      n_bytes: Long)
  final case class MediaRow(media_id: Long, blob: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  // ------------------------------------------------- header-dim parsing

  private def isPng(blob: Column): Column =
    hex(substring(blob, 1, 4)) === "89504E47"
  private def isGif(blob: Column): Column =
    hex(substring(blob, 1, 3)) === "474946"
  private def isBmp(blob: Column): Column =
    hex(substring(blob, 1, 2)) === "424D"

  /** Big-endian u32 at 1-based byte offset `pos` (PNG IHDR fields). */
  private def beU32(blob: Column, pos: Int): Column =
    conv(hex(substring(blob, pos, 4)), 16, 10).cast("long")

  /** Little-endian u16 at 1-based byte offset `pos` (GIF logical screen). */
  private def leU16(blob: Column, pos: Int): Column =
    conv(concat(hex(substring(blob, pos + 1, 1)),
      hex(substring(blob, pos, 1))), 16, 10).cast("long")

  /** Little-endian i32 at 1-based byte offset `pos` (BMP header ints —
    * signed: a negative BMP height means top-down row order).
    */
  private def leI32(blob: Column, pos: Int): Column = {
    val u = conv(concat(hex(substring(blob, pos + 3, 1)),
      hex(substring(blob, pos + 2, 1)), hex(substring(blob, pos + 1, 1)),
      hex(substring(blob, pos, 1))), 16, 10).cast("long")
    when(u >= 2147483648L, u - 4294967296L).otherwise(u)
  }

  /** REAL container-header width, sniffed from magic bytes with native
    * (codegen'd) expressions — no UDF, no pixel decode, no shuffle:
    * PNG IHDR (big-endian u32 at offset 16), GIF logical screen
    * (little-endian u16 at offset 6), BMP BITMAPINFOHEADER (little-endian
    * i32 at offset 18). Non-image payloads (text, audio) → 0.
    */
  def headerWidth(blob: Column): Column =
    when(isPng(blob), beU32(blob, 17))
      .when(isGif(blob), leU16(blob, 7))
      .when(isBmp(blob), leI32(blob, 19))
      .otherwise(lit(0L))

  /** Header height (|height| for BMP — negative encodes top-down rows). */
  def headerHeight(blob: Column): Column =
    when(isPng(blob), beU32(blob, 21))
      .when(isGif(blob), leU16(blob, 9))
      .when(isBmp(blob), abs(leI32(blob, 23)))
      .otherwise(lit(0L))

  /** Wrap an (id, payload) frame as a media table — the blob-column
    * ingest every other multimodal operator consumes. String payloads are
    * UTF-8 encoded (testdata's text stands in for opaque shards); binary
    * payloads pass through. Width/height come from the REAL container
    * header (magic-sniffed PNG/GIF/BMP parse above), 0×0 for non-image
    * payloads.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      mime: String): DataFrame = {
    val raw = df.schema(payloadCol).dataType match {
      case BinaryType => col(payloadCol)
      case _ => encode(col(payloadCol), "UTF-8")
    }
    df.select(col(idCol).cast("long").as("media_id"), raw.as("blob"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        headerWidth(col("blob")).cast("int").as("width"),
        headerHeight(col("blob")).cast("int").as("height"),
        length(col("blob")).cast("long").as("n_bytes")))
  }

  /** The decode/featurize kernel seam: production swaps in a real
    * codec + model (decode the container, run a forward pass) without
    * touching the Spark plumbing. Instances ship to executors
    * (Serializable); `open()` runs once per partition — the place to load
    * codec handles / model weights so per-row work stays cheap (the same
    * once-per-batch shape `mapInPandas` gives a Python kernel).
    *
    * Real instances: [[Codecs.WavKernel]], [[Codecs.BmpKernel]],
    * [[ImageIo.ImageIoKernel]].
    */
  trait MediaKernel extends Serializable {
    /** Called once per non-empty partition before any `featurize`. */
    def open(): Unit = ()
    def featurize(blob: Array[Byte]): Array[Float]
  }

  /** STUB kernel for formats whose codecs genuinely are absent here
    * (H.264, FLAC): 8 deterministic bytes-derived floats standing in for
    * a decode + model forward pass.
    */
  object StubKernel extends MediaKernel {
    override def featurize(blob: Array[Byte]): Array[Float] =
      Array.tabulate(8) { i =>
        var h = 1125899906842597L * (i + 1)
        blob.foreach(b => h = h * 31 + b)
        (h % 1000).toFloat / 1000f
      }
  }

  /** Partition-wise batched feature extraction (the mapInPandas shape in
    * Scala: one iterator pass per partition, no per-row task overhead;
    * kernel state initialized once per partition via `open()`).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      kernel: MediaKernel = StubKernel): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        if (it.hasNext) kernel.open()
        it.map { case (id, blob) => MediaFeatures(id, kernel.featurize(blob)) }
      }
  }

  /** Frame-extraction kernel seam (the per-container sibling of
    * [[MediaKernel]]): a container blob in, one payload per frame out.
    */
  trait FrameKernel extends Serializable {
    def open(): Unit = ()
    def frames(blob: Array[Byte]): Seq[Array[Byte]]
  }

  /** REAL frame extraction for animated GIF containers: walks the frame
    * directory with the JDK reader ([[ImageIo.decodeGifGray]]) and
    * re-emits each decoded frame as a standalone BMP blob (gray
    * replicated to BGR) — deterministic byte layout, so downstream
    * operators and oracles can gate the frames exactly.
    */
  object GifFrameKernel extends FrameKernel {
    override def frames(blob: Array[Byte]): Seq[Array[Byte]] =
      ImageIo.decodeGifGray(blob).map { g =>
        val px = new Array[Byte](g.width * g.height * 3)
        var i = 0
        while (i < g.pixels.length) {
          px(i * 3) = g.pixels(i)
          px(i * 3 + 1) = g.pixels(i)
          px(i * 3 + 2) = g.pixels(i)
          i += 1
        }
        Codecs.encodeBmp(Codecs.BgrImage(g.width, g.height, px))
      }
  }

  /** Byte-range chunker for OPAQUE payloads — n evenly spaced byte
    * slices, trailing remainder dropped. This is sharding (splitting
    * blobs for parallel transport/storage), NOT frame decoding; use
    * [[GifFrameKernel]] when the container format is known.
    */
  final case class ByteSliceKernel(n: Int) extends FrameKernel {
    override def frames(blob: Array[Byte]): Seq[Array[Byte]] = {
      val step = math.max(1, blob.length / n)
      (0 until math.min(n, blob.length)).map { i =>
        val from = i * step
        val until = math.min(blob.length, from + step)
        java.util.Arrays.copyOfRange(blob, from, until)
      }
    }
  }

  /** Explode a media table to one row per frame through a [[FrameKernel]]
    * — partition-wise (kernel opened once per partition), the shape a
    * video pipeline uses for keyframe extraction at scale.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      kernel: FrameKernel): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        if (it.hasNext) kernel.open()
        it.flatMap { case (id, blob) =>
          kernel.frames(blob).iterator.zipWithIndex.map {
            case (f, i) => Frame(id, i, f)
          }
        }
      }
  }

  /** Byte-slice chunking with the legacy arity (kept for callers that
    * shard opaque payloads without a container-aware kernel).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, n: Int): Dataset[Frame] =
    sampleFrames(spark, media, ByteSliceKernel(n))

  /** Resize metadata transform (the catalyst-side contract — new dims,
    * same blob schema; [[Codecs.resizeNearest]] is the real pixel
    * transform behind it, oracle-gated in q_mm_bmp_resize).
    */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.mime").as("mime"), lit(w).as("width"), lit(h).as("height"),
      col("meta.n_bytes").as("n_bytes")))
}
