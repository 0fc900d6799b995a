package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex

/** Index compaction (q_s_ivf_compact, r14 verdict order #2): beyond the
  * oracle hash, pin the three claims the maintenance operator makes:
  *   1. LAYOUT — after append every touched cell holds >1 file; after
  *      compact every cell holds exactly one parquet file and the total
  *      row count is unchanged;
  *   2. NO LOGICAL EFFECT — probe results are bit-identical before and
  *      after compaction (deterministic tie-break + exact double
  *      round-trip make file order immaterial);
  *   3. SELECTIVITY — compacting an already-compacted index is a no-op
  *      returning 0 (the scheduled maintenance job must not rewrite a
  *      healthy index).
  */
class CompactIvfSpec extends SparkSpec {

  private val k = 4
  private val nProbe = 4

  private def cellDirs(path: String): Seq[Path] = {
    val st = Files.list(java.nio.file.Paths.get(path, "lists"))
    try st.iterator().asScala.toList
      .filter(d => Files.isDirectory(d) &&
        d.getFileName.toString.startsWith("cell="))
    finally st.close()
  }

  private def parquetCount(d: Path): Int = {
    val st = Files.list(d)
    try st.iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    finally st.close()
  }

  test("compact: fragmented cells collapse to one file each, probe " +
    "results bit-identical, row count preserved") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
    val isDelta = pmod(col("vec_id"), lit(10)) === 7
    val base = e.filter(!isDelta)
    val c = graft.queries.SimilarityCatalog.scaledCellCount(base.count())
    val q = e.filter(col("vec_id") < 5).localCheckpoint(true)
    val stage = Files.createTempDirectory("graft_ivf_compact_spec")
    try {
      IvfIndex.write(base, "vec_id", "embedding", c, stage.toString)
      IvfIndex.append(spark, stage.toString, e.filter(isDelta),
        "vec_id", "embedding")
      val rowsBefore = spark.read.parquet(s"$stage/lists").count()
      val fragBefore = cellDirs(stage.toString).count(parquetCount(_) > 1)
      assert(fragBefore > 0, "append fragmented no cell — test is vacuous")

      val before = IvfIndex.probe(spark, stage.toString, q,
          "vec_id", "embedding", k, nProbe)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq

      val compacted = IvfIndex.compact(spark, stage.toString)
      assert(compacted == fragBefore,
        s"compacted $compacted cells, expected the $fragBefore fragmented")

      val dirs = cellDirs(stage.toString)
      dirs.foreach { d =>
        assert(parquetCount(d) == 1,
          s"${d.getFileName} still holds ${parquetCount(d)} files")
      }
      assert(spark.read.parquet(s"$stage/lists").count() == rowsBefore,
        "compaction changed the inverted-list row count")
      // no scratch residue next to the index
      assert(!Files.exists(stage.resolve("lists_compacting")),
        "compaction left its scratch directory behind")

      val after = IvfIndex.probe(spark, stage.toString, q,
          "vec_id", "embedding", k, nProbe)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq
      assert(after == before,
        s"compaction changed probe results:\n$after\nvs\n$before")
    } finally IvfIndex.deleteDir(stage.toString)
  }

  test("compact: a healthy index is a no-op returning 0") {
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val c = graft.queries.SimilarityCatalog.scaledCellCount(e.count())
    val stage = Files.createTempDirectory("graft_ivf_compact_noop")
    try {
      IvfIndex.write(e, "vec_id", "embedding", c, stage.toString)
      // write may emit several files per cell depending on input splits —
      // normalize first, then assert idempotence of the second pass
      IvfIndex.compact(spark, stage.toString)
      val mtimes = cellDirs(stage.toString)
        .map(d => d -> Files.getLastModifiedTime(d)).toMap
      assert(IvfIndex.compact(spark, stage.toString) == 0,
        "second compaction rewrote a healthy index")
      cellDirs(stage.toString).foreach { d =>
        assert(Files.getLastModifiedTime(d) == mtimes(d),
          s"no-op compaction touched ${d.getFileName}")
      }
    } finally IvfIndex.deleteDir(stage.toString)
  }
}
