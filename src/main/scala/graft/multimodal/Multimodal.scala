package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline (builder brief): media
  * as opaque `binary` columns with typed metadata, processed partition-wise.
  *
  * Decode status, honestly split by what the environment permits:
  * compressed formats (JPEG/H.264/FLAC…) need codec libraries that are
  * NOT in this container, so those kernels remain deterministic STUBS
  * (clearly marked) behind the [[MediaKernel]] seam. UNCOMPRESSED
  * containers need no library at all — [[Codecs]] ships REAL pure-JVM
  * WAV (RIFF/PCM16) and BMP (24bpp) decode/encode/resize, with real
  * kernels ([[Codecs.WavKernel]], [[Codecs.BmpKernel]]) over the same
  * seam and an oracle-gated decode query (q_mm_wav_decode). The Spark
  * plumbing — schema shape, binary columns, partition-wise batching,
  * operator signatures — is shared by both.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int,
      n_bytes: Long)
  final case class MediaRow(media_id: Long, blob: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Wrap any (id, string-payload) frame as a media table — the stand-in
    * ingest for blobs (testdata has no real media; text bytes act as the
    * payload).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      mime: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
        encode(col(payloadCol), "UTF-8").as("blob"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        // STUB decode: real pipelines parse the container header here;
        // dims derived deterministically from the payload hash instead
        (pmod(xxhash64(col("blob")), lit(1024)) + 128).cast("int").as("width"),
        (pmod(xxhash64(col("blob"), lit(1)), lit(1024)) + 128).cast("int").as("height"),
        length(col("blob")).cast("long").as("n_bytes")))

  /** The decode/featurize kernel seam: production swaps in a real
    * codec + model (decode the container, run a forward pass) without
    * touching the Spark plumbing. Instances ship to executors
    * (Serializable); `open()` runs once per partition — the place to load
    * codec handles / model weights so per-row work stays cheap (the same
    * once-per-batch shape `mapInPandas` gives a Python kernel).
    */
  trait MediaKernel extends Serializable {
    /** Called once per non-empty partition before any `featurize`. */
    def open(): Unit = ()
    def featurize(blob: Array[Byte]): Array[Float]
  }

  /** STUB kernel (no codec libraries in this environment): 8 deterministic
    * bytes-derived floats standing in for an image/audio embedding model.
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

  /** Frame sampling for video-like payloads: n evenly spaced byte-slices
    * per blob (STUB for container-aware keyframe extraction), emitted as
    * one row per frame — the explode-to-frames shape.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, n: Int): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val step = math.max(1, blob.length / n)
        (0 until math.min(n, blob.length)).map { i =>
          val from = i * step
          val until = math.min(blob.length, from + step)
          Frame(id, i, java.util.Arrays.copyOfRange(blob, from, until))
        }
      }
  }

  /** Resize metadata transform (STUB: real kernel re-encodes pixels; the
    * catalyst-side contract — new dims, same blob schema — is real).
    */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.mime").as("mime"), lit(w).as("width"), lit(h).as("height"),
      col("meta.n_bytes").as("n_bytes")))
}
