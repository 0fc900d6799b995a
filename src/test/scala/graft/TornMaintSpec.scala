package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex
import graft.sources.{ManifestedPartitions => MP}

/** Torn index maintenance (q_s_ivf_torn_compact, r16 verdict order #1):
  * the gate's oracle proves the torn-state probe VALUES; this spec kills
  * the maintenance job between its two halves explicitly and pins the
  * physical claims:
  *   - the staged generation is really on disk (the torn run wrote its
  *     data — the test isn't vacuous) yet the live file set, committed
  *     version, and probe results are all byte-for-byte unchanged;
  *   - no probe ever sees a missing cell: every pre-maintenance cell is
  *     still served (the failure mode of the old two-move swap);
  *   - re-running the same maintenance to completion commits, compacts,
  *     and leaves probe results bit-identical.
  */
class TornMaintSpec extends SparkSpec {

  test("a maintenance job killed between data write and marker leaves " +
    "the index fully intact; the re-run heals it") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
    val isDelta = pmod(col("vec_id"), lit(10)) === 7
    val base = e.filter(!isDelta)
    val c = graft.queries.SimilarityCatalog.scaledCellCount(base.count())
    val q = e.filter(col("vec_id") < 5).localCheckpoint(true)
    val stage = Files.createTempDirectory("graft_torn_maint_spec")
    val root = stage.toString
    try {
      IvfIndex.write(base, "vec_id", "embedding", c, root)
      IvfIndex.append(spark, root, e.filter(isDelta), "vec_id", "embedding")
      def probe() = IvfIndex.probe(spark, root, q,
          "vec_id", "embedding", k = 4, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq
      val liveBefore = MP.liveFiles(spark, root, "lists", "cell")
      val probeBefore = probe()
      assert(probeBefore.nonEmpty)

      // the job "dies" here: generation staged, marker never written
      val frag = MP.fragmentedParts(spark, root, "lists", "cell")
      assert(frag.nonEmpty, "append fragmented nothing — test is vacuous")
      val (gen, _) = MP.stageRewrite(spark, root, "lists", "cell",
        frag, identity)
      assert(Files.isDirectory(stage.resolve("lists").resolve(s"g=$gen")),
        "torn run staged no data — test is vacuous")

      assert(MP.latestVersion(root).contains(2L),
        "torn maintenance moved the committed version")
      assert(MP.liveFiles(spark, root, "lists", "cell") == liveBefore,
        "torn maintenance changed the live file set")
      // every pre-maintenance cell still served — nothing went missing
      assert(MP.liveFiles(spark, root, "lists", "cell").keySet
        == liveBefore.keySet)
      assert(probe() == probeBefore,
        "a probe in the torn state diverged from the pre-maintenance one")

      // recovery: the SAME maintenance re-runs to completion
      val (gen2, merged2) = MP.stageRewrite(spark, root, "lists", "cell",
        frag, identity)
      assert(gen2 == gen, "re-run staged a different generation")
      MP.commitManifests(spark, root, gen2, Map("lists" -> merged2))
      assert(MP.latestVersion(root).contains(gen2))
      assert(MP.fragmentedParts(spark, root, "lists", "cell").isEmpty,
        "healed maintenance left fragmentation")
      assert(probe() == probeBefore,
        "healed maintenance changed probe results")
    } finally IvfIndex.deleteDir(root)
  }
}
