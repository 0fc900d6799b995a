package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MANIFEST-COMMITTED partitioned datasets — the crash-atomic maintenance
  * substrate for every persisted index family (r15 verdict order #1). The
  * previous maintenance primitive swapped live partition directories with
  * two sequential `Files.move` calls; a crash (or a concurrent probe)
  * between the moves observed an index with a partition silently MISSING.
  * Here nothing committed is ever mutated in place:
  *
  *   - data lives in immutable GENERATION directories
  *     `<root>/<dataName>/g=<gen>/<partCol>=<p>/` — append and
  *     rewrite WRITE NEW generations, never touch old ones;
  *   - which generations are live is decided by a tiny MANIFEST table of
  *     (part, gen) rows — a partition's live rows are the union of its
  *     listed generations — committed through [[VersionedView]]'s
  *     marker-last protocol (data first, zero-byte marker last; the
  *     marker IS the commit point), optionally alongside sidecar tables
  *     (e.g. BM25 corpus stats) under the SAME marker so manifest and
  *     sidecar can never diverge;
  *   - readers resolve a committed manifest version and construct the
  *     exact directory list to scan — pruning to a probed partition
  *     subset is path construction, stronger than partition filtering,
  *     and a probe pinned to version v keeps serving v bit-exactly while
  *     maintenance commits v+1 (snapshot isolation, r15 order #3);
  *   - a TORN maintenance run (new generation written, no marker) is
  *     invisible: readers keep resolving the old manifest — the
  *     time-travel discipline `q_pipeline_mv_timetravel` proved for the
  *     funnel view, now applied to index maintenance;
  *   - old generations are garbage-collected only when no retained
  *     manifest references them ([[expire]] — retention GC).
  *
  * This is directory-granularity manifesting — the honest single-table
  * core of what Delta/Iceberg do at file granularity (their manifests
  * list files; ours lists partition-generation directories, which is the
  * same commit-point discipline with a coarser unit). At 100 TB the
  * manifest stays tiny: |partitions| × live generations rows, thousands
  * of rows against billions of data rows, read once per probe and folded
  * into driver-side path construction.
  */
object ManifestedPartitions {

  /** Manifest table name for a dataset. */
  def manifestTable(dataName: String): String = s"${dataName}_manifest"

  /** Write `df` as generation `gen` of the dataset — a NEW immutable
    * directory tree; nothing live is touched. `repartition(partCol)` so
    * one task owns a partition ⇒ one file per partition per generation
    * (the per-partition file count is a deployment knob — a cluster
    * writing TB-scale partitions would repartition(n, partCol)). Returns
    * the distinct partition values actually written (listed from the
    * produced directories — exact, and free of a second scan of `df`).
    */
  def writeGen(df: DataFrame, root: String, dataName: String,
      partCol: String, gen: Long): Seq[Int] = {
    val dir = s"$root/$dataName/g=$gen"
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(dir)
    listParts(dir, partCol)
  }

  /** The `<partCol>=N` partition values present under `dir`. */
  def listParts(dir: String, partCol: String): Seq[Int] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Nil
    val st = Files.list(p)
    try st.iterator().asScala
      .filter(d => Files.isDirectory(d) &&
        d.getFileName.toString.startsWith(s"$partCol="))
      .map(_.getFileName.toString.stripPrefix(s"$partCol=").toInt)
      .toSeq.sorted
    finally st.close()
  }

  /** Entries → the manifest DataFrame committed through VersionedView. */
  def entriesDf(spark: SparkSession, entries: Seq[(Int, Long)]): DataFrame = {
    import spark.implicits._
    entries.toDF("part", "gen")
  }

  /** The committed manifest of `dataName` at version `v` — driver-side,
    * bounded by |partitions| × live generations. Two storage forms: the
    * single-writer path commits the manifest as a parquet table beside
    * the data, while the OCC path ([[tryCommitManifests]]) embeds it in
    * the marker body itself — readers handle both, so probes are
    * agnostic to which writer discipline produced a version.
    */
  def readEntries(spark: SparkSession, root: String, dataName: String,
      v: Long): Seq[(Int, Long)] = {
    val body = VersionedView.markerBody(root, v)
    if (body.startsWith("{")) {
      val pat = ("\"" + java.util.regex.Pattern.quote(dataName) +
        "\":\"([^\"]*)\"").r
      pat.findFirstMatchIn(body) match {
        case Some(m) =>
          val s = m.group(1)
          if (s.isEmpty) Nil
          else s.split(";").toSeq.map { e =>
            val Array(p, g) = e.split(":")
            (p.toInt, g.toLong)
          }.sortBy(identity)
        case None => throw new IllegalStateException(
          s"version $v marker at $root has no manifest for $dataName")
      }
    } else
      VersionedView.readTable(spark, root, manifestTable(dataName), v)
        .select("part", "gen").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(identity)
  }

  /** OPTIMISTIC-CONCURRENCY commit (r16): serialize the manifests INTO
    * the version marker — `{"<dataName>":"part:gen;part:gen;…", …}` —
    * and install it with [[VersionedView.tryMark]]'s atomic
    * link-if-absent. The marker IS both the commit point and the
    * data-pointer set, so two writers racing to version `v` cannot
    * interleave: exactly one link succeeds, the loser gets `false`,
    * re-reads the winner's snapshot, re-stages its maintenance on a
    * fresh generation ([[stageRewriteAt]] with a writer-unique gen),
    * and retries at v+1. Sidecar tables are not supported on this path
    * (a sidecar-carrying family serializes its sidecar into the body
    * the same way if it needs OCC).
    */
  def tryCommitManifests(root: String, v: Long,
      manifests: Map[String, Seq[(Int, Long)]]): Boolean = {
    val body = manifests.toSeq.sortBy(_._1).map { case (dn, es) =>
      "\"" + dn + "\":\"" + es.sortBy(identity)
        .map { case (p, g) => s"$p:$g" }.mkString(";") + "\""
    }.mkString("{", ",", "}")
    VersionedView.tryMark(root, v, body)
  }

  /** Latest committed manifest version of the root (shared by every
    * dataset and sidecar committed under it).
    */
  def latestVersion(root: String): Option[Long] =
    VersionedView.latestVersion(root)

  /** Scan exactly `entries`' directories — version-resolved reading. The
    * basePath option re-attaches `g` and `partCol` from the directory
    * names; `g` is dropped (a physical placement detail). Pruning to a
    * partition subset is done by passing only those partitions' entries:
    * the unlisted directories are never opened, which is static pruning
    * by path construction.
    */
  def read(spark: SparkSession, root: String, dataName: String,
      partCol: String, entries: Seq[(Int, Long)]): DataFrame = {
    require(entries.nonEmpty, s"no live entries to read for $dataName")
    val paths = entries.map { case (p, g) =>
      s"$root/$dataName/g=$g/$partCol=$p"
    }
    spark.read.option("basePath", s"$root/$dataName")
      .parquet(paths: _*)
      .drop("g")
  }

  /** Read the latest committed snapshot of the whole dataset. */
  def readLatest(spark: SparkSession, root: String, dataName: String,
      partCol: String): DataFrame = {
    val v = latestVersion(root).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    read(spark, root, dataName, partCol, readEntries(spark, root, dataName, v))
  }

  /** Latest-committed entries restricted to `parts` — the probe-side
    * pruning helper. Empty result means none of the probed partitions
    * hold live data (legal after deletes).
    */
  def prunedEntries(spark: SparkSession, root: String, dataName: String,
      parts: Seq[Int], version: Option[Long] = None): Seq[(Int, Long)] = {
    val v = version.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val ps = parts.toSet
    readEntries(spark, root, dataName, v).filter(e => ps.contains(e._1))
  }

  /** INIT: write `df` as generation 1 and commit manifest version 1
    * (plus `sidecars`) under one marker. Overwrites any prior index at
    * the root (markers included), matching the families' write()
    * overwrite contract.
    */
  def init(df: DataFrame, root: String, dataName: String, partCol: String,
      sidecars: Map[String, DataFrame] = Map.empty): Unit = {
    VersionedView.deleteDir(Paths.get(root, "_commits"))
    val spark = df.sparkSession
    val parts = writeGen(df, root, dataName, partCol, 1L)
    commitManifests(spark, root, 1L,
      Map(dataName -> parts.map(p => (p, 1L))), sidecars)
  }

  /** Commit one or more datasets' manifests (+ sidecar tables) as version
    * `v` under a single marker — the only mutation point in the whole
    * layout, and it is VersionedView's marker-last atomic move.
    */
  def commitManifests(spark: SparkSession, root: String, v: Long,
      manifests: Map[String, Seq[(Int, Long)]],
      sidecars: Map[String, DataFrame] = Map.empty): Unit = {
    val tables = manifests.map { case (name, es) =>
      manifestTable(name) -> entriesDf(spark, es).coalesce(1)
    } ++ sidecars
    VersionedView.commitTables(tables, root, v)
  }

  /** STAGE an append: write `delta` as generation `latest+1` and return
    * (newVersion, merged entries) WITHOUT committing — the torn-run shape
    * is exactly "staged but never committed". Callers commit via
    * [[commitManifests]]; [[append]] composes the two.
    */
  def stageAppend(spark: SparkSession, root: String, dataName: String,
      partCol: String, delta: DataFrame): (Long, Seq[(Int, Long)]) = {
    val v = latestVersion(root).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val gen = v + 1
    val parts = writeGen(delta, root, dataName, partCol, gen)
    (gen, readEntries(spark, root, dataName, v) ++ parts.map(p => (p, gen)))
  }

  /** APPEND: new generation + manifest commit. Ingest cost ∝ batch (one
    * generation write, no rewrite of live data); re-running a crashed
    * append is safe (the generation write is an idempotent overwrite of
    * `g=<latest+1>` and the commit replaces). Returns the new version.
    */
  def append(spark: SparkSession, root: String, dataName: String,
      partCol: String, delta: DataFrame,
      sidecars: Map[String, DataFrame] = Map.empty): Long = {
    val (gen, merged) = stageAppend(spark, root, dataName, partCol, delta)
    commitManifests(spark, root, gen, Map(dataName -> merged), sidecars)
    gen
  }

  /** STAGE a rewrite of exactly `parts` through `transform` (must be
    * partition-local — filters/projections, which every caller's is):
    * reads ONLY those partitions' live directories, writes the result as
    * generation `latest+1`, and returns (newVersion, merged entries)
    * WITHOUT committing. A partition `transform` empties simply drops out
    * of the new manifest — no retired-directory dance, its old bytes are
    * unreferenced the instant the commit lands and physically removed by
    * [[expire]].
    */
  def stageRewrite(spark: SparkSession, root: String, dataName: String,
      partCol: String, parts: Seq[Int],
      transform: DataFrame => DataFrame): (Long, Seq[(Int, Long)]) = {
    val v = latestVersion(root).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    (v + 1,
      stageRewriteAt(spark, root, dataName, partCol, parts, transform,
        v, v + 1))
  }

  /** The explicit-snapshot form of [[stageRewrite]] for CONCURRENT
    * writers: reads `parts` as of `snapshotV` (not latest — a racing
    * writer may commit between a writer's read and its own commit) and
    * stages the rewrite as generation `gen`, which the caller must make
    * writer-unique (racing writers staging into the same generation
    * directory would clobber each other's files before either commits).
    * Returns the merged entry list to pass to [[tryCommitManifests]];
    * a lost race abandons the staged generation (dead until [[expire]])
    * and re-stages from the winner's snapshot.
    */
  def stageRewriteAt(spark: SparkSession, root: String, dataName: String,
      partCol: String, parts: Seq[Int], transform: DataFrame => DataFrame,
      snapshotV: Long, gen: Long): Seq[(Int, Long)] = {
    val old = readEntries(spark, root, dataName, snapshotV)
    val ps = parts.toSet
    val touched = old.filter(e => ps.contains(e._1))
    require(touched.nonEmpty, s"none of $parts is live in $dataName@$snapshotV")
    val written = writeGen(
      transform(read(spark, root, dataName, partCol, touched)),
      root, dataName, partCol, gen)
    old.filterNot(e => ps.contains(e._1)) ++ written.map(p => (p, gen))
  }

  /** REWRITE: staged rewrite + manifest commit. Returns the new version. */
  def rewrite(spark: SparkSession, root: String, dataName: String,
      partCol: String, parts: Seq[Int], transform: DataFrame => DataFrame,
      sidecars: Map[String, DataFrame] = Map.empty): Long = {
    val (gen, merged) =
      stageRewrite(spark, root, dataName, partCol, parts, transform)
    commitManifests(spark, root, gen, Map(dataName -> merged), sidecars)
    gen
  }

  /** Partitions that are FRAGMENTED at the latest committed version —
    * live rows spread over more than one parquet file (several
    * generations from appends, or a multi-file generation from a
    * parallel initial write). Driver-side directory listing bounded by
    * |partitions|; a cluster deployment would track file counts in the
    * manifest itself.
    */
  def fragmentedParts(spark: SparkSession, root: String, dataName: String,
      partCol: String): Seq[Int] = {
    val v = latestVersion(root).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    readEntries(spark, root, dataName, v)
      .groupBy(_._1)
      .map { case (part, es) =>
        part -> es.map { case (p, g) =>
          parquetFileCount(s"$root/$dataName/g=$g/$partCol=$p")
        }.sum
      }
      .filter(_._2 > 1).keys.toSeq.sorted
  }

  /** The LIVE parquet files per partition at the latest (or pinned)
    * committed version — root-relative paths, so generation placement is
    * visible. Spec/maintenance introspection helper (driver-side listing
    * bounded by |partitions| × live generations).
    */
  def liveFiles(spark: SparkSession, root: String, dataName: String,
      partCol: String,
      version: Option[Long] = None): Map[Int, Set[String]] = {
    val v = version.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    readEntries(spark, root, dataName, v)
      .groupBy(_._1)
      .map { case (part, es) =>
        part -> es.flatMap { case (p, g) =>
          val dir = Paths.get(s"$root/$dataName/g=$g/$partCol=$p")
          if (!Files.isDirectory(dir)) Nil
          else {
            val st = Files.list(dir)
            try st.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .map(f => s"g=$g/$partCol=$p/${f.getFileName}").toList
            finally st.close()
          }
        }.toSet
      }
  }

  private def parquetFileCount(dir: String): Int = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return 0
    val st = Files.list(p)
    try st.iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    finally st.close()
  }

  /** COMPACT: rewrite exactly the fragmented partitions to one file each
    * (identity transform — physical layout only, zero logical effect).
    * Returns the number of compacted partitions.
    */
  def compact(spark: SparkSession, root: String, dataName: String,
      partCol: String,
      sidecars: Map[String, DataFrame] = Map.empty): Int = {
    val frag = fragmentedParts(spark, root, dataName, partCol)
    if (frag.nonEmpty)
      rewrite(spark, root, dataName, partCol, frag, identity, sidecars)
    frag.size
  }

  /** RETENTION GC for a manifested root: expire manifest versions below
    * the keep-horizon (marker-first — below-horizon time travel fails
    * loudly, never serves a half-deleted snapshot), then delete every
    * (generation, partition) directory of `dataNames` that no RETAINED
    * manifest references — (gen, part) granularity, not whole
    * generations, because a rewrite leaves its generation PARTIALLY
    * referenced (untouched partitions keep pointing at it) while the
    * rewritten partitions' old bytes in that same generation are dead:
    * exactly the tombstoned bytes a GDPR vacuum must make go away. An
    * emptied generation directory is removed outright. Returns
    * (expired versions, deleted partition-directory count).
    */
  def expire(spark: SparkSession, root: String,
      dataNames: Seq[(String, String)], // (dataName, partCol) pairs
      keepLast: Int): (Seq[Long], Int) = {
    val dead = VersionedView.expire(root, keepLast)
    val kept = VersionedView.committedVersions(root)
    var removed = 0
    dataNames.foreach { case (dn, partCol) =>
      val referenced: Set[(Long, Int)] =
        kept.flatMap(v => readEntries(spark, root, dn, v))
          .map { case (p, g) => (g, p) }.toSet
      val dnDir = Paths.get(root, dn)
      if (Files.isDirectory(dnDir)) {
        val st = Files.list(dnDir)
        val genDirs = try st.iterator().asScala.toList
          .filter(d => Files.isDirectory(d) &&
            d.getFileName.toString.startsWith("g="))
        finally st.close()
        genDirs.foreach { d =>
          val g = d.getFileName.toString.stripPrefix("g=").toLong
          listParts(d.toString, partCol).foreach { p =>
            if (!referenced.contains((g, p))) {
              VersionedView.deleteDir(d.resolve(s"$partCol=$p"))
              removed += 1
            }
          }
          if (listParts(d.toString, partCol).isEmpty)
            VersionedView.deleteDir(d)
        }
      }
    }
    (dead, removed)
  }
}
