package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned, atomically-committed parquet views — the commit protocol a
  * persisted materialized view needs on object storage, where a job can
  * die mid-write and "directory rename" is not atomic across files:
  *
  *   - data for version v lands under `<path>/v=<v>/` FIRST;
  *   - the zero-byte marker `<path>/_commits/<v>` is written LAST, staged
  *     as a dotfile and moved into place atomically — the marker IS the
  *     commit point;
  *   - readers resolve `latestVersion` from the marker directory ONLY, so
  *     a torn write (data files present, no marker — the crash shape) is
  *     invisible, and any still-visible older version remains readable
  *     (time travel / snapshot isolation for long-running jobs).
  *
  * This is the single-table core of a manifest-based table format (same
  * commit-point discipline as Delta/Iceberg's log append); compaction of
  * old versions is the caller's retention policy. VersionedViewSpec pins
  * torn-commit invisibility, marker atomicity, and crashed-commit
  * completion (re-committing a staged version makes it visible).
  */
object VersionedView {

  /** Commit `df` as version `v` of the view at `path`: data first, marker
    * last. Re-running a crashed commit is safe — the data write is an
    * idempotent overwrite of `v=<v>` and the marker move replaces.
    */
  def commit(df: DataFrame, path: String, v: Long): Unit = {
    df.write.mode("overwrite").parquet(s"$path/v=$v")
    mark(path, v)
  }

  /** Commit SEVERAL named tables as one version under ONE marker — each
    * table lands at `<path>/<name>/v=<v>` first; the single marker
    * commits them all atomically. Since r18 this is the FROZEN
    * LEGACY-format writer: the default lifecycle path stages sidecar
    * tables writer-unique and references them from the CAS marker body
    * instead (ManifestedPartitions.commitManifestsCas), because two
    * racing commitTables stagers clobber each other's `v=<v>` files
    * before either marks. Retained for pre-CAS artifacts: readers
    * (readTable / ManifestedPartitions.readSidecarTable) still resolve
    * this layout, and retention GC migrates reachable legacy tables into
    * its enrichment anchor before deleting their versions.
    */
  def commitTables(tables: Map[String, DataFrame], path: String,
      v: Long): Unit = {
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$path/$name/v=$v")
    }
    mark(path, v)
  }

  /** Snapshot read of one table of a [[commitTables]] version. */
  def readTable(spark: SparkSession, path: String, name: String,
      v: Long): DataFrame = {
    require(Files.exists(Paths.get(path, "_commits", v.toString)),
      s"version $v of $path is not committed")
    spark.read.parquet(s"$path/$name/v=$v")
  }

  /** All COMMITTED versions, ascending (marker-backed only). */
  def committedVersions(path: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val commits = Paths.get(path, "_commits")
    if (!Files.isDirectory(commits)) return Nil
    val st = Files.list(commits)
    val vs = try st.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("\\d+"))
      .map(_.toLong).toSeq
    finally st.close()
    vs.sorted
  }

  /** RETENTION GC (r15 verdict order #5): keep the newest `keepLast`
    * committed versions, physically delete everything below the horizon.
    * Order is marker FIRST, data second — the marker delete is the
    * "retire" point, so a reader racing the expiry (or arriving after a
    * crash mid-expiry) fails the [[readVersion]]/[[readTable]] commit
    * check LOUDLY instead of silently serving a half-deleted snapshot.
    * Data dirs are removed for both layouts: `<path>/v=<k>` (single-table
    * [[commit]]) and `<path>/<table>/v=<k>` ([[commitTables]]). Returns
    * the expired versions, ascending.
    */
  def expire(path: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    expireExact(path, committedVersions(path).dropRight(keepLast))
  }

  /** Expire an EXPLICIT version list — the form a caller that planned its
    * GC against a captured snapshot must use: recomputing the horizon
    * here from `committedVersions` would race a concurrent writer's
    * commit, shifting the horizon past the version the caller just
    * pinned carry-forward state into (ManifestedPartitions.expire's
    * enrichment anchor). Plan and deletion share ONE snapshot.
    */
  def expireExact(path: String, dead: Seq[Long]): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    if (dead.isEmpty) return Nil
    // table dirs of the commitTables layout: any child that is neither a
    // version dir nor the marker dir
    val tableDirs = {
      val st = Files.list(Paths.get(path))
      try st.iterator().asScala.toList
        .filter(d => Files.isDirectory(d) &&
          !d.getFileName.toString.startsWith("v=") &&
          d.getFileName.toString != "_commits")
      finally st.close()
    }
    dead.foreach { v =>
      Files.deleteIfExists(Paths.get(path, "_commits", v.toString))
      deleteDir(Paths.get(path, s"v=$v"))
      tableDirs.foreach(t => deleteDir(t.resolve(s"v=$v")))
    }
    dead
  }

  /** Recursive delete, children before parents; missing roots are a no-op. */
  private[sources] def deleteDir(root: java.nio.file.Path): Unit = {
    import java.util.Comparator
    if (Files.exists(root)) {
      val st = Files.walk(root)
      try st.sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach { f =>
          try Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () }
        }
      finally st.close()
    }
  }

  /** Write version `v`'s marker alone — the second half of a commit,
    * usable to complete a crashed one whose data files already landed.
    */
  def mark(path: String, v: Long): Unit = {
    val commits = Paths.get(path, "_commits")
    Files.createDirectories(commits)
    val staging = commits.resolve(s".$v.staging")
    Files.writeString(staging, v.toString)
    Files.move(staging, commits.resolve(v.toString),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** COMPARE-AND-SWAP marker write — the optimistic-concurrency commit
    * point for RACING writers (two maintenance jobs staging against the
    * same snapshot must not lose either's update; marker-replace would
    * silently drop the first winner's commit). The marker is staged as a
    * dotfile and installed with `Files.createLink` — the POSIX link(2)
    * call fails ATOMICALLY with EEXIST if the target exists, the
    * classic lockfile CAS (an object-store deployment uses
    * put-if-absent the same way). Returns true iff THIS writer won
    * version `v`; on false the caller re-reads the new snapshot,
    * re-stages its maintenance on top of it, and retries at v+1 — its
    * staged generation is simply garbage until then. `body` lets an
    * index commit embed its manifest IN the marker, making
    * {data-pointer set, commit point} one atomic object.
    */
  def tryMark(path: String, v: Long, body: String = ""): Boolean = {
    val commits = Paths.get(path, "_commits")
    Files.createDirectories(commits)
    // WRITER-UNIQUE staging file (ADVICE r16): with a single shared
    // staging path, the committed marker is a hard link to the staging
    // INODE — a losing racer's truncating rewrite of that shared path
    // would silently replace the winner's already-committed body (on the
    // OCC path the body IS the manifest: the exact lost update the CAS
    // exists to prevent), and its cleanup delete could race the winner
    // between write and link. Each writer stages under its own nonce and
    // deletes only its own file; the marker name stays the CAS point.
    val staging = commits.resolve(
      s".$v.${java.util.UUID.randomUUID()}.occ.staging")
    Files.writeString(staging, if (body.isEmpty) v.toString else body)
    try {
      Files.createLink(commits.resolve(v.toString), staging)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(staging)
  }

  /** Atomically REPLACE an existing committed marker's body — retention
    * GC's enrichment step only (pinning carry-forward state into the
    * oldest retained version before the older markers are deleted). The
    * replacement must be semantically inert: it resolves to the same
    * snapshot the original did. Never a commit path — commits go through
    * [[mark]]/[[tryMark]].
    */
  def rewriteMarker(path: String, v: Long, body: String): Unit = {
    val commits = Paths.get(path, "_commits")
    val marker = commits.resolve(v.toString)
    require(Files.exists(marker),
      s"cannot rewrite uncommitted version $v at $path")
    val staging = commits.resolve(
      s".$v.${java.util.UUID.randomUUID()}.enrich.staging")
    Files.writeString(staging, body)
    Files.move(staging, marker,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The committed marker's content (empty-bodied markers carry the
    * version number; OCC index commits carry their manifest).
    */
  def markerBody(path: String, v: Long): String = {
    val marker = Paths.get(path, "_commits", v.toString)
    require(Files.exists(marker), s"version $v of $path is not committed")
    Files.readString(marker)
  }

  /** The newest COMMITTED version (marker-backed only; staged dotfiles and
    * torn data dirs are invisible). None if nothing committed yet.
    */
  def latestVersion(path: String): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val commits = Paths.get(path, "_commits")
    if (!Files.isDirectory(commits)) return None
    val st = Files.list(commits)
    val vs = try st.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("\\d+"))
      .map(_.toLong).toSeq
    finally st.close()
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Snapshot read of one committed version. */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame = {
    require(latestVersion(path).exists(_ >= v) &&
      Files.exists(Paths.get(path, "_commits", v.toString)),
      s"version $v of $path is not committed")
    spark.read.parquet(s"$path/v=$v")
  }

  /** Read the latest committed version (the production entry point). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    spark.read.parquet(s"$path/v=$v")
  }
}
