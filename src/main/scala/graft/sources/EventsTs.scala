package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Units-robust reader for the `events.ts` column.
  *
  * The engine's convention is `ts` as an epoch-MICROSECOND `BIGINT`
  * everywhere downstream (ordering, gap math, window buckets) — but what
  * the parquet file physically stores has changed between testdata
  * generations (TIMESTAMP(NANOS) through r6, timestamp[us] from r7). A
  * hand-written comment about the file's unit is not a contract: when the
  * unit flipped, every `ts div 1000` site silently squashed a 30-day
  * timeline into 43 minutes and only the oracle caught it.
  *
  * So the unit is read from the file itself: the parquet footer's logical
  * type annotation for `ts` decides the exact integer conversion to µs,
  * and anything unrecognized fails loudly instead of producing plausible
  * garbage. Footer reads are a few KB of I/O, cached per (file identity),
  * and happen on the driver — at 100 TB this is one footer per input
  * file listing, the same metadata Spark's own scan planning touches.
  */
object EventsTs {

  /** Exact integer conversion raw→µs: `us = raw div divToUs * mulToUs`
    * (exactly one of the two factors is ever ≠ 1). Integer `div` keeps
    * ns→µs truncation identical to engines without a ns timestamp type.
    */
  final case class Conv(divToUs: Long, mulToUs: Long) {
    def us(name: String): Column =
      if (divToUs == 1L && mulToUs == 1L) col(name)
      else if (divToUs == 1L) col(name) * lit(mulToUs)
      // Column has no integer-div operator and a double round-trip loses
      // precision at 1e18 ns magnitudes — go through SQL `div` (exact)
      else expr(s"$name div $divToUs")
  }

  // keyed by resolved parquet path + mtime + size so a regenerated file
  // re-inspects instead of serving the superseded unit
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Conv]()

  /** The µs conversion for `path` (an events parquet file, or a directory
    * holding staged copies of one — the streaming-source layout).
    */
  def conversion(path: String): Conv = {
    val file = resolveParquet(path)
    val attrs = Files.readAttributes(
      file, classOf[java.nio.file.attribute.BasicFileAttributes])
    val key = Seq(file.toString, attrs.lastModifiedTime.toMillis.toString,
      attrs.size.toString).mkString("|")
    cache.computeIfAbsent(key, _ => inspect(file.toString))
  }

  /** Batch-read events with `ts` normalized to epoch µs. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val p = s"$dir/events.parquet"
    normalize(
      spark.read.schema(graft.model.Schemas.events).parquet(p), p)
  }

  /** Replace raw `ts` with its epoch-µs value (works on batch and
    * streaming frames alike — the conversion factor is resolved
    * driver-side from the footer before the plan runs).
    */
  def normalize(df: DataFrame, path: String): DataFrame =
    df.withColumn("ts", conversion(path).us("ts"))

  private def resolveParquet(path: String): java.nio.file.Path = {
    val p = Paths.get(path)
    if (!Files.isDirectory(p)) p
    else {
      val s = Files.list(p)
      try {
        val it = s.filter(_.getFileName.toString.endsWith(".parquet"))
          .sorted().iterator()
        if (!it.hasNext)
          sys.error(s"EventsTs: no parquet file under directory $path")
        it.next()
      } finally s.close()
    }
  }

  private def inspect(file: String): Conv = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), new Configuration())
    val reader = ParquetFileReader.open(in)
    val ann =
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        if (!schema.containsField("ts"))
          sys.error(s"EventsTs: $file has no `ts` column")
        schema.getType("ts").getLogicalTypeAnnotation
      } finally reader.close()
    ann match {
      case t: TimestampLogicalTypeAnnotation =>
        t.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.NANOS  => Conv(1000L, 1L)
          case LogicalTypeAnnotation.TimeUnit.MICROS => Conv(1L, 1L)
          case LogicalTypeAnnotation.TimeUnit.MILLIS => Conv(1L, 1000L)
        }
      case other =>
        // an unannotated INT64 carries no unit — refuse to guess: the
        // whole point is that a wrong unit produces silently-collapsed
        // timelines, not errors
        sys.error(s"EventsTs: unsupported `ts` logical type in $file: " +
          s"${Option(other).map(_.toString).getOrElse("none (raw INT64)")}" +
          " — expected TIMESTAMP(NANOS|MICROS|MILLIS)")
    }
  }
}
