package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex
import graft.sources.VersionedView

/** Manifest-commit protocol (sources.VersionedView, the
  * q_pipeline_mv_timetravel machinery): the marker is the commit point.
  * Pins the crash-shape behaviors the gate's hash can't isolate:
  *   - a torn write (data, no marker) is invisible to latest/read;
  *   - completing a crashed commit (mark alone) makes it visible;
  *   - snapshot reads of old versions survive newer commits;
  *   - reading an uncommitted version fails loudly.
  */
class VersionedViewSpec extends SparkSpec {

  import spark.implicits._

  test("torn commits are invisible, completed ones win, snapshots persist") {
    val stage = Files.createTempDirectory("graft_vview_spec")
    val path = s"${stage.toString}/view"
    try {
      assert(VersionedView.latestVersion(path).isEmpty)
      intercept[IllegalStateException](VersionedView.read(spark, path))

      VersionedView.commit(Seq((1, "a")).toDF("k", "v"), path, 1L)
      assert(VersionedView.latestVersion(path).contains(1L))

      // torn v2: data only — the crash between write and marker
      Seq((2, "TORN")).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$path/v=2")
      assert(VersionedView.latestVersion(path).contains(1L),
        "torn version leaked into latestVersion")
      assert(VersionedView.read(spark, path)
        .select("v").collect().map(_.getString(0)).toSeq == Seq("a"))
      intercept[IllegalArgumentException](
        VersionedView.readVersion(spark, path, 2L))

      // completing the crashed commit = writing its marker
      VersionedView.mark(path, 2L)
      assert(VersionedView.latestVersion(path).contains(2L))
      assert(VersionedView.read(spark, path)
        .select("v").collect().map(_.getString(0)).toSeq == Seq("TORN"))

      // snapshot isolation: v1 still readable under the newer tip
      assert(VersionedView.readVersion(spark, path, 1L)
        .select("v").collect().map(_.getString(0)).toSeq == Seq("a"))

      // a staging dotfile must never count as a commit
      Files.writeString(
        java.nio.file.Paths.get(path, "_commits", ".9.staging"), "9")
      assert(VersionedView.latestVersion(path).contains(2L),
        "staging dotfile counted as a commit")
    } finally IvfIndex.deleteDir(stage.toString)
  }

  test("recommitting a version replaces it idempotently") {
    val stage = Files.createTempDirectory("graft_vview_spec2")
    val path = s"${stage.toString}/view"
    try {
      VersionedView.commit(Seq((1, "first")).toDF("k", "v"), path, 1L)
      VersionedView.commit(Seq((1, "second")).toDF("k", "v"), path, 1L)
      assert(VersionedView.latestVersion(path).contains(1L))
      assert(VersionedView.read(spark, path)
        .select("v").collect().map(_.getString(0)).toSeq == Seq("second"))
    } finally IvfIndex.deleteDir(stage.toString)
  }
}
