package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex
import graft.sources.{ManifestedPartitions => MP, VersionedView}

/** Optimistic-concurrency maintenance commits (q_s_ivf_occ_maint, r16):
  * the gate proves the serialized end state's VALUES; this spec pins the
  * protocol on a hand-planted dataset:
  *   - exactly one of two racing writers wins the CAS, and the committed
  *     version's manifest is the WINNER's (the loser's staged generation
  *     is never referenced — the lost-update a replace-marker would have
  *     allowed is structurally impossible);
  *   - the loser's retry against the winner's snapshot lands BOTH
  *     writers' effects;
  *   - the abandoned staged generation is garbage: unreferenced by any
  *     committed manifest and physically removed by expire;
  *   - marker-embedded (OCC) and parquet-table (single-writer) manifests
  *     interoperate in one version history — readers are agnostic.
  */
class OccMaintSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Int, Int)*) = rows.toSeq.toDF("x", "p")

  test("racing writers serialize: one CAS wins, loser retries on the " +
    "new snapshot, both effects land, abandoned generation is GC'd") {
    val stage = Files.createTempDirectory("graft_occ_spec")
    val root = stage.toString
    try {
      MP.init(df(1 -> 0, 2 -> 0, 3 -> 1), root, "d", "p") // v1 (parquet)
      MP.append(spark, root, "d", "p", df(4 -> 0))        // v2 (parquet)
      assert(MP.latestVersion(root).contains(2L))

      // W1: compact p=0 (fragmented by the append); W2: delete x=2 —
      // both staged against snapshot v2 with writer-unique generations
      val w1 = MP.stageRewriteAt(spark, root, "d", "p", Seq(0),
        identity, snapshotV = 2L, gen = 101L)
      val w2 = MP.stageRewriteAt(spark, root, "d", "p", Seq(0),
        _.filter(col("x") =!= 2), snapshotV = 2L, gen = 102L)

      assert(MP.tryCommitManifests(root, 3L, Map("d" -> w1)), "W1 lost?")
      assert(!MP.tryCommitManifests(root, 3L, Map("d" -> w2)),
        "W2's conflicting commit was NOT rejected — lost update")

      // v3 is the WINNER's manifest: references gen 101, never 102
      val v3 = MP.readEntries(spark, root, "d", 3L)
      assert(v3.exists(_._2 == 101L) && !v3.exists(_._2 == 102L),
        s"v3 manifest $v3 is not the winner's")
      assert(MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq
        == Seq(1, 2, 3, 4), "winner's snapshot lost rows")

      // loser retries from v3 — both effects in v4
      val w2r = MP.stageRewriteAt(spark, root, "d", "p", Seq(0),
        _.filter(col("x") =!= 2), snapshotV = 3L, gen = 103L)
      assert(MP.tryCommitManifests(root, 4L, Map("d" -> w2r)))
      assert(MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq
        == Seq(1, 3, 4), "retry lost the delete or a compacted row")
      assert(MP.liveFiles(spark, root, "d", "p").values
        .forall(_.size == 1), "compaction effect lost in the retry")

      // the abandoned staged generation is unreferenced garbage…
      val g102 = stage.resolve("d").resolve("g=102")
      assert(Files.isDirectory(g102), "loser staged nothing — vacuous")
      (1L to 4L).foreach { v =>
        assert(!MP.readEntries(spark, root, "d", v).exists(_._2 == 102L),
          s"version $v references the abandoned generation")
      }
      // …and expire removes it while the live snapshot is untouched
      MP.expire(spark, root, Seq(("d", "p")), keepLast = 1)
      assert(!Files.exists(g102), "abandoned generation survived GC")
      assert(MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq
        == Seq(1, 3, 4))
      // mixed history cleaned: below-horizon reads fail loudly
      intercept[IllegalArgumentException] {
        VersionedView.markerBody(root, 2L)
      }
    } finally IvfIndex.deleteDir(root)
  }
}
