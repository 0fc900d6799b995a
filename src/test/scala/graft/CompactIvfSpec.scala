package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex
import graft.sources.ManifestedPartitions

/** Index compaction (q_s_ivf_compact, r14 verdict order #2): beyond the
  * oracle hash, pin the claims the maintenance operator makes under the
  * manifest-committed layout (r16):
  *   1. LAYOUT — after append every touched cell's live rows span >1
  *      file (two generations); after compact every cell is served by
  *      exactly one parquet file and the total row count is unchanged;
  *   2. NO LOGICAL EFFECT — probe results are bit-identical before and
  *      after compaction (deterministic tie-break + exact double
  *      round-trip make file order immaterial);
  *   3. SELECTIVITY — compacting an already-compacted index is a no-op
  *      returning 0, and untouched cells' live files are not rewritten
  *      (the scheduled maintenance job must not rewrite a healthy index);
  *   4. CRASH SAFETY — the pre-compaction snapshot remains fully
  *      readable at its own version (the marker-last commit retired it,
  *      never broke it).
  */
class CompactIvfSpec extends SparkSpec {

  private val k = 4
  private val nProbe = 4

  test("compact: fragmented cells collapse to one file each, probe " +
    "results bit-identical, row count preserved, old snapshot intact") {
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
      val vAppended = ManifestedPartitions.latestVersion(stage.toString).get
      val rowsBefore = ManifestedPartitions.readLatest(
        spark, stage.toString, "lists", "cell").count()
      val filesBefore = ManifestedPartitions.liveFiles(
        spark, stage.toString, "lists", "cell")
      val fragBefore = filesBefore.count(_._2.size > 1)
      assert(fragBefore > 0, "append fragmented no cell — test is vacuous")

      val before = IvfIndex.probe(spark, stage.toString, q,
          "vec_id", "embedding", k, nProbe)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq

      val compacted = IvfIndex.compact(spark, stage.toString)
      assert(compacted == fragBefore,
        s"compacted $compacted cells, expected the $fragBefore fragmented")

      val filesAfter = ManifestedPartitions.liveFiles(
        spark, stage.toString, "lists", "cell")
      filesAfter.foreach { case (cell, fs) =>
        assert(fs.size == 1, s"cell=$cell still served by ${fs.size} files")
      }
      assert(ManifestedPartitions.readLatest(
          spark, stage.toString, "lists", "cell").count() == rowsBefore,
        "compaction changed the inverted-list row count")

      val after = IvfIndex.probe(spark, stage.toString, q,
          "vec_id", "embedding", k, nProbe)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq
      assert(after == before,
        s"compaction changed probe results:\n$after\nvs\n$before")

      // crash safety: the retired pre-compaction snapshot is still fully
      // readable at its own version — a probe pinned there is unaffected
      val pinned = IvfIndex.probe(spark, stage.toString, q,
          "vec_id", "embedding", k, nProbe, version = Some(vAppended))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq
      assert(pinned == before,
        "the pre-compaction snapshot no longer serves its own results")
    } finally IvfIndex.deleteDir(stage.toString)
  }

  test("compact: a healthy index is a no-op returning 0") {
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val c = graft.queries.SimilarityCatalog.scaledCellCount(e.count())
    val stage = Files.createTempDirectory("graft_ivf_compact_noop")
    try {
      // the initial generation is written one-file-per-cell, so a fresh
      // index is already healthy: the scheduled job must not rewrite it
      IvfIndex.write(e, "vec_id", "embedding", c, stage.toString)
      val files = ManifestedPartitions.liveFiles(
        spark, stage.toString, "lists", "cell")
      assert(files.values.forall(_.size == 1),
        "initial build fragmented a cell")
      assert(IvfIndex.compact(spark, stage.toString) == 0,
        "compaction rewrote a healthy index")
      assert(ManifestedPartitions.liveFiles(
          spark, stage.toString, "lists", "cell") == files,
        "no-op compaction changed the live file set")
      assert(ManifestedPartitions.latestVersion(stage.toString).contains(1L),
        "no-op compaction committed a new version")
    } finally IvfIndex.deleteDir(stage.toString)
  }
}
