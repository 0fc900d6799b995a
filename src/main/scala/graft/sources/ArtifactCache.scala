package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Driver-side cache for the COLLECTED form of tiny immutable parquet
  * artifacts (IVF centroids, PQ codebooks): the index lifecycle re-reads
  * them once per append/probe call, and each re-read is a whole Spark job
  * (plan + schedule + collect, 50-150 ms) to fetch a few KB the caller
  * already collected moments earlier in the same lifecycle.
  *
  * Same discipline as [[EventsTs]]'s footer cache — keyed by the REQUESTED
  * path, storing the fileset identity (resolved file|mtime|len list)
  * alongside the collected value: any rewrite (rebuild, overwrite, delete +
  * re-create) changes the identity and REPLACES the entry, so a stale
  * artifact is never served. This is NOT result caching: the cache holds
  * bit-identical copies of what the file currently contains, re-validated
  * against the filesystem on every access, and bounded by the number of
  * distinct artifact paths alive in the process.
  */
object ArtifactCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, AnyRef)]()

  /** The collected form of the parquet artifact at `path`, recomputed via
    * `read` whenever the fileset identity changes. A missing path skips
    * the cache entirely and lets `read` fail (or succeed) exactly as it
    * would uncached.
    */
  def collected[T <: AnyRef](path: String)(read: => T): T =
    filesetId(path) match {
      case None => read // absent/unlistable: uncached, error surfaces as-is
      case Some(id) =>
        cache.compute(path, (_, prev) => {
          if (prev != null && prev._1 == id) prev else (id, read)
        })._2.asInstanceOf[T]
    }

  // resolved parquet fileset identity under `path` (file|mtime|len,
  // name-sorted) — Hadoop-FS so hdfs:// and s3a:// resolve like the read
  private def filesetId(path: String): Option[String] = {
    val p = new HPath(path)
    try {
      val fs = p.getFileSystem(new Configuration())
      val st = fs.getFileStatus(p)
      val files =
        if (!st.isDirectory) Array(st)
        else fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      if (files.isEmpty) None
      else Some(files.sortBy(_.getPath.getName)
        .map(f => s"${f.getPath}|${f.getModificationTime}|${f.getLen}")
        .mkString("||"))
    } catch { case _: java.io.FileNotFoundException => None }
  }
}
