package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.{IvfIndex, IvfPqIndex}
import graft.sources.{ManifestedPartitions => MP}

/** IVF-PQ delete (q_s_ivfpq_delete, r16 verdict order #2): the gate's
  * oracle proves the post-delete ranking; this spec pins the PHYSICAL
  * claims across BOTH datasets of the storage-bounded family:
  *   - tombstoned ids are gone from the live coded lists AND the live
  *     raw side table, in ONE committed version (no state where one is
  *     purged and the other not);
  *   - untouched cells/buckets keep their identical live files — the
  *     bucketed raw layout bounds the rewrite to the tombstones' buckets
  *     (the r15 verdict's named gap);
  *   - probes never return a deleted id, and retention GC physically
  *     removes the dead generations' bytes (codes and exact vectors).
  */
class IvfPqDeleteSpec extends SparkSpec {

  test("delete purges codes and raw vectors atomically, rewrites only " +
    "affected partitions, and GC removes the bytes") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
      .localCheckpoint(true)
    val stage = Files.createTempDirectory("graft_ivfpq_delete_spec")
    val root = stage.toString
    try {
      IvfPqIndex.write(e, "vec_id", "embedding", 8, 64, 8, 16, root)
      val listsBefore = MP.liveFiles(spark, root, "lists", "cell")
      val rawBefore = MP.liveFiles(spark, root, "raw", "rb")

      val ts = e.filter(pmod(col("vec_id"), lit(9)) === 4)
        .select(col("vec_id").as("id")).localCheckpoint(true)
      val tsIds = ts.collect().map(_.getLong(0)).toSet
      assert(tsIds.nonEmpty)
      val affCells = MP.readLatest(spark, root, "lists", "cell")
        .join(ts, Seq("id")).select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      val affBuckets = MP.readLatest(spark, root, "raw", "rb")
        .join(ts, Seq("id")).select("rb").distinct()
        .collect().map(_.getInt(0)).toSet

      val purged = IvfPqIndex.delete(spark, root, ts)
      assert(purged == tsIds.size,
        s"purged $purged list rows for ${tsIds.size} tombstones")

      // ONE committed version carries both purges
      assert(MP.latestVersion(root).contains(2L))
      val lists = MP.readLatest(spark, root, "lists", "cell")
      val raw = MP.readLatest(spark, root, "raw", "rb")
      assert(lists.filter(col("id").isInCollection(tsIds)).count() == 0,
        "a tombstoned id is still readable from the coded lists")
      assert(raw.filter(col("id").isInCollection(tsIds)).count() == 0,
        "a tombstoned vector is still readable from the raw side table")

      // partition locality in BOTH datasets
      val listsAfter = MP.liveFiles(spark, root, "lists", "cell")
      val rawAfter = MP.liveFiles(spark, root, "raw", "rb")
      listsBefore.keySet.filterNot(affCells).foreach { p =>
        assert(listsAfter.get(p).contains(listsBefore(p)),
          s"unaffected cell $p was rewritten")
      }
      rawBefore.keySet.filterNot(affBuckets).foreach { p =>
        assert(rawAfter.get(p).contains(rawBefore(p)),
          s"unaffected raw bucket $p was rewritten")
      }
      affCells.foreach { p =>
        assert(!listsAfter.get(p).contains(listsBefore(p)),
          s"affected cell $p kept its old files")
      }
      affBuckets.foreach { p =>
        assert(!rawAfter.get(p).contains(rawBefore(p)),
          s"affected raw bucket $p kept its old files")
      }

      // probes never return a deleted id
      val hits = IvfPqIndex.probe(spark, root,
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 4, nProbe = 3, refine = 12)
        .select("nn_id").collect().map(_.getLong(0)).toSet
      assert(hits.nonEmpty)
      assert((hits & tsIds).isEmpty,
        s"probe returned deleted ids: ${hits & tsIds}")

      // GC: the dead bytes (old codes AND old exact vectors) go away
      val deadDirs =
        affCells.map(p => stage.resolve("lists").resolve("g=1")
          .resolve(s"cell=$p")) ++
        affBuckets.map(p => stage.resolve("raw").resolve("g=1")
          .resolve(s"rb=$p"))
      assert(deadDirs.forall(Files.isDirectory(_)),
        "pre-delete generation vanished before GC")
      val (expired, removed) = IvfPqIndex.expire(spark, root, 1)
      assert(expired == Seq(1L) && removed >= deadDirs.size,
        s"expire: versions $expired, $removed partition dirs")
      deadDirs.foreach { d =>
        assert(!Files.exists(d), s"tombstoned bytes survived GC: $d")
      }
      // live snapshot unaffected by GC
      assert(MP.readLatest(spark, root, "lists", "cell").count()
        == lists.count())
    } finally IvfIndex.deleteDir(root)
  }
}
