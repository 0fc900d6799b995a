package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex
import graft.sources.ManifestedPartitions

/** IVF index delete (q_s_ivf_delete): the gate's oracle proves the
  * post-delete ranking; this spec pins the PHYSICAL claims under the
  * manifest-committed layout (r16):
  *   - tombstoned ids are gone from every later snapshot read (and the
  *     purge count is exact);
  *   - cells holding no tombstoned vector keep their IDENTICAL live
  *     files — the delete rewrites only the affected cells;
  *   - no probe can return a deleted id;
  *   - after retention GC passes the horizon, the pre-delete generation
  *     holding the tombstoned bytes is physically gone.
  */
class IvfDeleteSpec extends SparkSpec {

  test("delete purges exactly the tombstoned vectors and rewrites only " +
    "their cells; probes never return a deleted id; GC removes the bytes") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
    val c = graft.queries.SimilarityCatalog.scaledCellCount(e.count())
    val stage = Files.createTempDirectory("graft_ivf_delete_spec")
    try {
      IvfIndex.write(e, "vec_id", "embedding", c, stage.toString)
      val before = ManifestedPartitions.liveFiles(
        spark, stage.toString, "lists", "cell")
      val preRows = ManifestedPartitions.readLatest(
        spark, stage.toString, "lists", "cell").count()

      val ts = e.filter(pmod(col("vec_id"), lit(9)) === 4)
        .select(col("vec_id").as("id")).localCheckpoint(true)
      val tsIds = ts.collect().map(_.getLong(0)).toSet
      assert(tsIds.nonEmpty)
      // the affected cells, read before the delete commits a new version
      val affected = ManifestedPartitions.readLatest(
          spark, stage.toString, "lists", "cell")
        .join(ts, Seq("id")).select("cell").distinct()
        .collect().map(_.getInt(0)).toSet

      val purged = IvfIndex.delete(spark, stage.toString, ts)
      assert(purged == tsIds.size,
        s"purged $purged rows for ${tsIds.size} tombstones")

      val lists = ManifestedPartitions.readLatest(
        spark, stage.toString, "lists", "cell")
      assert(lists.count() == preRows - purged)
      assert(lists.filter(col("id").isInCollection(tsIds)).count() == 0,
        "a tombstoned vector is still readable from the lists")

      val after = ManifestedPartitions.liveFiles(
        spark, stage.toString, "lists", "cell")
      before.keySet.filterNot(affected).foreach { p =>
        assert(after.get(p).contains(before(p)),
          s"unaffected cell $p was rewritten")
      }
      affected.foreach { p =>
        assert(!after.get(p).contains(before(p)),
          s"affected cell $p kept its old files")
      }

      val hits = IvfIndex.probe(spark, stage.toString,
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 4, nProbe = 4)
        .select("nn_id").collect().map(_.getLong(0)).toSet
      assert(hits.nonEmpty)
      assert((hits & tsIds).isEmpty,
        s"probe returned deleted ids: ${hits & tsIds}")

      // the tombstoned BYTES: still present in the affected cells' gen-1
      // directories (time travel to the pre-delete snapshot is still
      // legal) until retention GC passes the horizon — then physically
      // gone, while gen 1 keeps serving the UNTOUCHED cells
      val gen1Affected = affected.map(p =>
        stage.resolve("lists").resolve("g=1").resolve(s"cell=$p"))
      assert(gen1Affected.forall(Files.isDirectory(_)),
        "pre-delete generation vanished before GC")
      val (expired, removed) = IvfIndex.expire(spark, stage.toString, 1)
      assert(expired == Seq(1L) && removed >= affected.size,
        s"expire removed versions $expired / $removed partition dirs")
      gen1Affected.foreach { d =>
        assert(!Files.exists(d), s"tombstoned bytes survived GC: $d")
      }
      // the live snapshot is untouched by GC
      val lists2 = ManifestedPartitions.readLatest(
        spark, stage.toString, "lists", "cell")
      assert(lists2.count() == preRows - purged)
    } finally IvfIndex.deleteDir(stage.toString)
  }
}
