package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArtifactCache

/** The driver-side artifact cache (r18 optimization: IVF centroids /
  * PQ codebooks stop paying a Spark collect job per probe/append) must
  * never serve a stale value: it is keyed on the resolved fileset
  * identity (file|mtime|len), so any rewrite re-reads, an absent path is
  * never cached, and an unchanged fileset is read exactly once.
  */
class ArtifactCacheSpec extends AnyFunSuite {

  private def write(dir: java.nio.file.Path, name: String,
      bytes: Array[Byte], mtimeMs: Long): Unit = {
    val f = dir.resolve(name)
    Files.write(f, bytes)
    Files.setLastModifiedTime(
      f, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

  test("unchanged fileset reads once; any rewrite re-reads; absent path " +
    "is uncached") {
    val dir = Files.createTempDirectory("graft_artifact_cache_spec")
    try {
      val p = dir.resolve("art").toString
      var reads = 0
      def readN(): Integer = { reads += 1; Integer.valueOf(reads) }

      // absent path: the read runs uncached every time (and its errors
      // would surface as-is)
      assert(ArtifactCache.collected(p)(readN()) == 1)
      assert(ArtifactCache.collected(p)(readN()) == 2)

      // present + unchanged: exactly one read serves repeat calls
      Files.createDirectories(Paths.get(p))
      write(Paths.get(p), "part-0.parquet", Array[Byte](1, 2, 3), 1000L)
      assert(ArtifactCache.collected(p)(readN()) == 3)
      assert(ArtifactCache.collected(p)(readN()) == 3)
      assert(reads == 3)

      // rewrite with different length: identity changes, re-read
      write(Paths.get(p), "part-0.parquet", Array[Byte](1, 2, 3, 4), 1000L)
      assert(ArtifactCache.collected(p)(readN()) == 4)

      // rewrite with same length, different mtime: identity changes
      write(Paths.get(p), "part-0.parquet", Array[Byte](9, 9, 9, 9), 2000L)
      assert(ArtifactCache.collected(p)(readN()) == 5)

      // added file: identity changes
      write(Paths.get(p), "part-1.parquet", Array[Byte](7), 2000L)
      assert(ArtifactCache.collected(p)(readN()) == 6)
      assert(ArtifactCache.collected(p)(readN()) == 6)

      // emptied dir (no parquet files): uncached again
      Files.delete(Paths.get(p).resolve("part-0.parquet"))
      Files.delete(Paths.get(p).resolve("part-1.parquet"))
      assert(ArtifactCache.collected(p)(readN()) == 7)
      assert(ArtifactCache.collected(p)(readN()) == 8)
    } finally {
      graft.similarity.IvfIndex.deleteDir(dir.toString)
    }
  }
}
