package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex
import graft.sources.{ManifestedPartitions => MP, VersionedView}

/** The generic manifest-committed partition layer (r16, verdict order #1)
  * every persisted index family now maintains itself through. Pins the
  * protocol-level claims independent of any one index:
  *   - init/append/rewrite produce the expected snapshots, and a reader
  *     PINNED to an old version keeps serving it bit-exactly while newer
  *     versions commit (snapshot isolation);
  *   - a TORN maintenance run — new generation staged, marker never
  *     written — is invisible: latest version, live entries, and reads
  *     are all unchanged, and re-running the maintenance to completion
  *     heals it (idempotent recommit);
  *   - multi-table commits (manifest + sidecar) resolve at one version:
  *     both visible or neither;
  *   - retention GC deletes dead (generation, partition) directories at
  *     partition granularity — a partially-referenced generation keeps
  *     its live partitions — and below-horizon reads fail LOUDLY.
  */
class ManifestedPartitionsSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Int, Int)*) = rows.toSeq.toDF("x", "p")

  test("init/append: snapshot-isolated reads; pinned version unchanged") {
    val stage = Files.createTempDirectory("graft_mp_basic")
    val root = stage.toString
    try {
      MP.init(df(1 -> 0, 2 -> 0, 3 -> 1), root, "d", "p")
      assert(MP.latestVersion(root).contains(1L))
      assert(MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))

      MP.append(spark, root, "d", "p", df(4 -> 1, 5 -> 2))
      assert(MP.latestVersion(root).contains(2L))
      assert(MP.readLatest(spark, root, "d", "p").count() == 5)
      // a reader pinned to v1 is untouched by the append
      val v1 = MP.read(spark, root, "d", "p", MP.readEntries(spark, root, "d", 1L))
      assert(v1.select("x").collect().map(_.getInt(0)).sorted.toSeq
        == Seq(1, 2, 3), "pinned v1 read saw appended rows")
      // pruned read: only partition 1's dirs are listed
      val p1 = MP.read(spark, root, "d", "p",
        MP.prunedEntries(spark, root, "d", Seq(1)))
      assert(p1.select("x").collect().map(_.getInt(0)).sorted.toSeq
        == Seq(3, 4))
    } finally IvfIndex.deleteDir(root)
  }

  test("torn rewrite is invisible and heals on re-run") {
    val stage = Files.createTempDirectory("graft_mp_torn")
    val root = stage.toString
    try {
      MP.init(df(1 -> 0, 2 -> 0, 3 -> 1), root, "d", "p")
      MP.append(spark, root, "d", "p", df(4 -> 0))
      val liveBefore = MP.liveFiles(spark, root, "d", "p")
      val rowsBefore = MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq

      // TORN compaction: generation 3 staged, marker never written —
      // the crash shape between the two halves of a maintenance op
      val (gen, merged) = MP.stageRewrite(spark, root, "d", "p",
        Seq(0), identity)
      assert(gen == 3L)
      assert(Files.isDirectory(stage.resolve("d").resolve("g=3")),
        "staging wrote nothing — torn test is vacuous")
      // invisible: version, live files, and reads are all unchanged
      assert(MP.latestVersion(root).contains(2L),
        "a torn run changed the committed version")
      assert(MP.liveFiles(spark, root, "d", "p") == liveBefore,
        "a torn run changed the live file set")
      assert(MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq == rowsBefore,
        "a torn run changed read results")

      // healing: the re-run overwrites the staged generation and commits
      val (gen2, merged2) = MP.stageRewrite(spark, root, "d", "p",
        Seq(0), identity)
      assert(gen2 == gen)
      MP.commitManifests(spark, root, gen2, Map("d" -> merged2))
      assert(MP.latestVersion(root).contains(3L))
      assert(MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq == rowsBefore,
        "completed compaction changed logical content")
      assert(MP.liveFiles(spark, root, "d", "p")(0).size == 1,
        "compaction left partition 0 fragmented")
      assert(merged == merged2)
    } finally IvfIndex.deleteDir(root)
  }

  test("sidecar tables commit atomically with the manifest") {
    val stage = Files.createTempDirectory("graft_mp_sidecar")
    val root = stage.toString
    try {
      MP.init(df(1 -> 0, 2 -> 1), root, "d", "p",
        sidecars = Map("stats" -> Seq(2L).toDF("n")))
      // staged v2: manifest AND sidecar data written, marker withheld
      val (gen, merged) = MP.stageAppend(spark, root, "d", "p", df(3 -> 1))
      MP.entriesDf(spark, merged).write.mode("overwrite")
        .parquet(s"$root/d_manifest/v=$gen")
      Seq(3L).toDF("n").write.mode("overwrite").parquet(s"$root/stats/v=$gen")
      // a reader resolves ONE committed version for both tables: v1
      val v = VersionedView.latestVersion(root).get
      assert(v == 1L)
      assert(VersionedView.readTable(spark, root, "stats", v)
        .collect()(0).getLong(0) == 2L)
      // and cannot read the uncommitted v2 sidecar
      intercept[IllegalArgumentException] {
        VersionedView.readTable(spark, root, "stats", gen)
      }
      // marker lands → both flip together
      VersionedView.mark(root, gen)
      val v2 = VersionedView.latestVersion(root).get
      assert(v2 == gen)
      assert(VersionedView.readTable(spark, root, "stats", v2)
        .collect()(0).getLong(0) == 3L)
      assert(MP.readLatest(spark, root, "d", "p").count() == 3)
    } finally IvfIndex.deleteDir(root)
  }

  test("expire: partition-granular GC, loud below-horizon reads") {
    val stage = Files.createTempDirectory("graft_mp_expire")
    val root = stage.toString
    try {
      MP.init(df(1 -> 0, 2 -> 1), root, "d", "p")
      MP.append(spark, root, "d", "p", df(3 -> 0)) // v2: p=0 fragments
      MP.compact(spark, root, "d", "p") // v3: p=0 rewritten to gen 3
      val latest = MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq
      assert(latest == Seq(1, 2, 3))

      val (expired, removed) = MP.expire(spark, root, Seq(("d", "p")), 1)
      assert(expired == Seq(1L, 2L))
      // p=0's dead bytes in gens 1 and 2 are gone; p=1 still lives in gen
      // 1 (partially-referenced generation kept at partition granularity)
      assert(!Files.exists(stage.resolve("d").resolve("g=1").resolve("p=0")))
      assert(!Files.exists(stage.resolve("d").resolve("g=2")))
      assert(Files.isDirectory(stage.resolve("d").resolve("g=1").resolve("p=1")))
      assert(removed == 2)
      // the live snapshot is unaffected
      assert(MP.readLatest(spark, root, "d", "p")
        .select("x").collect().map(_.getInt(0)).sorted.toSeq == latest)
      // below-horizon access fails loudly, not half-served
      intercept[IllegalArgumentException] {
        VersionedView.readTable(spark, root, "d_manifest", 1L)
      }
      intercept[IllegalArgumentException] {
        VersionedView.readVersion(spark, root, 2L)
      }
    } finally IvfIndex.deleteDir(root)
  }
}
