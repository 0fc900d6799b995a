package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex

/** IVF index delete (q_s_ivf_delete): the gate's oracle proves the
  * post-delete ranking; this spec pins the PHYSICAL claims:
  *   - tombstoned ids are gone from the inverted lists (bytes, not a
  *     mask) and the purge count is exact;
  *   - cells holding no tombstoned vector keep their identical files;
  *   - no probe can return a deleted id.
  */
class IvfDeleteSpec extends SparkSpec {

  private def cellFiles(path: String): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    val st = Files.list(java.nio.file.Paths.get(s"$path/lists"))
    val dirs = try st.iterator().asScala.toList.filter(d =>
      Files.isDirectory(d) && d.getFileName.toString.startsWith("cell="))
    finally st.close()
    dirs.map { d =>
      val fs = Files.list(d)
      d.getFileName.toString -> (try fs.iterator().asScala
        .map(_.getFileName.toString).toSet finally fs.close())
    }.toMap
  }

  test("delete purges exactly the tombstoned vectors and rewrites only " +
    "their cells; probes never return a deleted id") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
    val c = graft.queries.SimilarityCatalog.scaledCellCount(e.count())
    val stage = Files.createTempDirectory("graft_ivf_delete_spec")
    try {
      IvfIndex.write(e, "vec_id", "embedding", c, stage.toString)
      val before = cellFiles(stage.toString)
      val preRows = spark.read.parquet(s"${stage.toString}/lists").count()

      val ts = e.filter(pmod(col("vec_id"), lit(9)) === 4)
        .select(col("vec_id").as("id")).localCheckpoint(true)
      val tsIds = ts.collect().map(_.getLong(0)).toSet
      assert(tsIds.nonEmpty)
      // the affected cells, read before the delete mutates the index
      val affected = spark.read.parquet(s"${stage.toString}/lists")
        .join(ts, Seq("id")).select("cell").distinct()
        .collect().map(r => s"cell=${r.getInt(0)}").toSet

      val purged = IvfIndex.delete(spark, stage.toString, ts)
      assert(purged == tsIds.size,
        s"purged $purged rows for ${tsIds.size} tombstones")

      val lists = spark.read.parquet(s"${stage.toString}/lists")
      assert(lists.count() == preRows - purged)
      assert(lists.filter(col("id").isInCollection(tsIds)).count() == 0,
        "a tombstoned vector is still readable from the lists")

      val after = cellFiles(stage.toString)
      before.keySet.filterNot(affected).foreach { d =>
        assert(after.get(d).contains(before(d)),
          s"unaffected cell $d was rewritten")
      }
      affected.foreach { d =>
        assert(!after.get(d).contains(before(d)),
          s"affected cell $d kept its old files")
      }

      val hits = IvfIndex.probe(spark, stage.toString,
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 4, nProbe = 4)
        .select("nn_id").collect().map(_.getLong(0)).toSet
      assert(hits.nonEmpty)
      assert((hits & tsIds).isEmpty,
        s"probe returned deleted ids: ${hits & tsIds}")
    } finally IvfIndex.deleteDir(stage.toString)
  }
}
