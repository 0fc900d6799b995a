package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VectorFunctions

/** Persisted IVF index lifecycle — build once, probe many (r13 verdict
  * order #3). Every other ANN entry rebuilds its index inside the query;
  * a 100 TB corpus builds the index ONCE (a full-scan job, amortized over
  * every query thereafter) and serves queries from the persisted artifact:
  *
  *   - `<path>/centroids`: (cell INT, c ARRAY<DOUBLE>) — the L2-NORMALIZED
  *     coarse centroids, ≤ nCells rows, read whole and folded into a
  *     broadcast literal at probe time (the probe ranking is a per-query
  *     scan of this tiny table, never a shuffle);
  *   - `<path>/lists`: the inverted lists (id, v) PARTITIONED BY `cell` —
  *     one parquet directory per coarse cell, so a probe-only reader
  *     statically PRUNES the scan to exactly the probed cells' files and
  *     reads ≈ nProbe·√n rows per query off storage instead of rescanning
  *     the corpus.
  *
  * Determinism contract: centroids come from Ann.hashCentroids (exact
  * decimal component sums) and doubles round-trip parquet bit-exactly, so
  * probing the persisted index returns results bit-identical to the
  * in-query Ann.ivfTopK with the same geometry — which is what lets the
  * q_s_ivf_persist gate share q_s_ivf_scaled's DuckDB oracle.
  */
object IvfIndex {

  /** Build + persist the index for `corpus` at `path` (overwrites).
    * `pretrained` supplies RAW (unnormalized) coarse centroids instead of
    * training on `corpus` — the rebuild-with-frozen-quantizer path
    * AppendIvfSpec uses to prove append ≡ rebuild.
    */
  def write(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int,
      path: String,
      pretrained: Option[Seq[(Int, Array[Double])]] = None): Unit = {
    val sp = corpus.sparkSession
    import sp.implicits._
    val centroids = pretrained.getOrElse(
      Ann.hashCentroids(corpus, idCol, vecCol, nCells))
    Ann.normalizeCentroids(centroids)
      .map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // assignCells keeps the cast-to-double vector alongside the cell id;
    // persisting it makes the probe self-contained (no corpus re-read,
    // no re-cast) — the inverted-list file IS the search payload
    Ann.assignCells(corpus, idCol, vecCol, centroids)
      .select(col("id"), col("v"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/lists")
  }

  /** APPEND a vector batch to a persisted index WITHOUT retraining: each
    * new vector is assigned to its nearest STORED centroid (the static
    * coarse quantizer practice — a deployment trains the quantizer once
    * and retrains on a slow cadence, because reassigning the whole corpus
    * on every ingest would be a full rebuild) and its row lands as a new
    * file inside that cell's existing partition directory. Probe-time
    * readers see base + appended rows with no index rewrite — ingest cost
    * is proportional to the BATCH, never the corpus. Assignment goes
    * through Ann.assignCellsNormalized on the stored normalized centroids,
    * bit-matching the build-time assignment (see that method's note).
    */
  def append(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cell", "c").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    Ann.assignCellsNormalized(delta, idCol, vecCol, cents)
      .select(col("id"), col("v"), col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/lists")
  }

  /** COMPACT fragmented inverted lists (r14 verdict order #2): `append`
    * lands one parquet file per batch per cell, so at daily-ingest cadence
    * a hot cell accumulates K small files and probe latency decays (K
    * footer reads + K tiny row groups instead of one sequential scan).
    * This is the maintenance operator a deployment schedules: find the
    * cells holding more than one file, rewrite ONLY those — a
    * partition-PRUNED read of the fragmented cells, `repartition(cell)`
    * so each cell's rows land in one task and therefore ONE output file —
    * and swap each rewritten cell directory into place. Cell-local by
    * construction: rows never move across cells, untouched cells are
    * never read, and probe results are bit-identical before/after (the
    * probe re-ranks with a deterministic tie-break, so file order is
    * immaterial; doubles round-trip parquet exactly — CompactIvfSpec
    * asserts both). Returns the number of compacted cells.
    */
  def compact(spark: SparkSession, path: String): Int =
    compactPartitions(spark, s"$path/lists", "cell")

  /** The generic form of `compact`, shared with the persisted BM25
    * postings index (text.PostingsIndex): compacts any parquet dataset
    * laid out as `<dataDir>/<partCol>=<int>/…` by rewriting exactly the
    * multi-file partitions to one file each.
    */
  def compactPartitions(spark: SparkSession, dataDir: String,
      partCol: String): Int = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    def ls(d: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val st = Files.list(d)
      try st.iterator().asScala.toList finally st.close()
    }
    val fragmented = ls(java.nio.file.Paths.get(dataDir))
      .filter(d => Files.isDirectory(d) &&
        d.getFileName.toString.startsWith(s"$partCol="))
      .filter(d => ls(d).count(_.getFileName.toString.endsWith(".parquet")) > 1)
      .map(_.getFileName.toString.stripPrefix(s"$partCol=").toInt)
    if (fragmented.nonEmpty)
      rewritePartitions(spark, dataDir, partCol, fragmented, identity)
    fragmented.size
  }

  /** Rewrite exactly the `values` partitions of a `<dataDir>/<partCol>=N/`
    * parquet dataset through `transform` — the shared partition-local
    * maintenance primitive behind IVF/postings compaction (identity
    * transform) and the funnel index's tombstone vacuum (anti-join
    * transform). Partition-PRUNED read of only the named partitions,
    * `repartition(partCol)` so each lands as one file, staged write OUTSIDE
    * the dataset dir (partition discovery on a concurrent read never sees a
    * half-written or oddly-named dir), then per-partition directory swap.
    * Rows never move across partitions: `transform` must be
    * partition-local (filters/projections), which every caller's is.
    */
  def rewritePartitions(spark: SparkSession, dataDir: String,
      partCol: String, values: Seq[Int],
      transform: DataFrame => DataFrame): Unit = {
    import java.nio.file.{Files, Paths}
    val rootDir = Paths.get(dataDir)
    val tmp = s"${dataDir}_rewriting"
    transform(spark.read.parquet(dataDir)
        .filter(col(partCol).isInCollection(values))) // static pruning
      .repartition(col(partCol)) // one task owns a partition ⇒ one file
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    values.foreach { c =>
      val dst = rootDir.resolve(s"$partCol=$c")
      val retired = Paths.get(tmp, s"$partCol=$c.retired")
      Files.move(dst, retired)
      // a transform may legitimately empty a partition (e.g. vacuum of a
      // fully-tombstoned bucket): the swap then just retires the old dir
      if (Files.exists(Paths.get(tmp, s"$partCol=$c")))
        Files.move(Paths.get(tmp, s"$partCol=$c"), dst)
    }
    deleteDir(tmp)
  }

  /** DELETE a tombstone batch (vector ids) from the persisted index — the
    * GDPR leg of the ANN lifecycle: the affected cells are discovered by
    * a column-pruned (id, cell) scan joined to the tombstones, and ONLY
    * those cells are rewritten through the partition-local anti-join swap
    * (untouched cells' files are never opened; a fully-emptied cell's
    * directory is retired). Probes afterwards can never return a deleted
    * vector — the bytes are gone, not masked. The coarse quantizer is
    * untouched (centroids retrain on a slow cadence, exactly like
    * append's frozen-quantizer contract). Returns the rows purged.
    */
  def delete(spark: SparkSession, path: String,
      tombstones: DataFrame): Long = {
    val ts = tombstones.select("id").localCheckpoint(true)
    val dead = spark.read.parquet(s"$path/lists")
      .select("id", "cell") // column-pruned: never reads the vectors
      .join(broadcast(ts), Seq("id"))
      .localCheckpoint(true) // cell list + purge count
    val affected = dead.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by the delete batch
    if (affected.isEmpty) return 0L
    rewritePartitions(spark, s"$path/lists", "cell", affected,
      df => df.join(broadcast(ts), Seq("id"), "left_anti"))
    dead.count()
  }

  /** Probe-only search against a persisted index: rank the broadcast
    * centroid table per query (top `nProbe` cells by dot product against
    * the STORED normalized centroids — no re-normalization, so scores
    * match the build-time ranking bit-for-bit), statically prune the
    * inverted-list scan to the batch's probed-cell union, and exact-cosine
    * re-rank inside the probed lists. Never touches the original corpus.
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    // materialize the probed-cell ranking ONCE (ADVICE r14): qCells is
    // consumed twice — collected for the pruning list and broadcast into
    // the re-rank join — and without this the centroids parquet read and
    // the probe-ranking window would re-run on the second consumption
    val qCells = queryCells(spark, path, queries, qidCol, vecCol, nProbe)
      .localCheckpoint(true)
    // the batch's probed-cell union is bounded by min(nCells, Q·nProbe)
    // — a driver collect of at most the coarse-cell count, which becomes
    // the STATIC partition filter that prunes the inverted-list scan to
    // the probed directories (PersistedIvfSpec asserts the pruning)
    val probed = qCells.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val lists = prunedLists(spark, path, probed)
      .select(col("id").as("nn_id"), col("v").as("cv"), col("cell"))
    val scored = lists.join(broadcast(qCells), Seq("cell"))
      .withColumn("cos", Dedup.cosine(col("cv"), col("qv")))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(desc("cos"), col("nn_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cos")
  }

  /** Per-query probed cells: (query_id, qv, cell) — the query batch
    * scored against the broadcast STORED normalized centroids (no
    * re-normalization, so the ranking matches build-time bit-for-bit),
    * top `nProbe` cells each.
    */
  def queryCells(spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, vecCol: String, nProbe: Int): DataFrame = {
    VectorFunctions.register(spark)
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cell", "c").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    // one Literal node per list (same rationale as Ann: an element-wise
    // array(lit…) tree costs cells × dim analysis/codegen nodes)
    val centLit = typedlit(cents.map(_._2))
    val cellLit = typedlit(cents.map(_._1))
    val q = queries.select(col(qidCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qv"))
    q.select(col("query_id"), col("qv"),
        explode(zip_with(centLit, cellLit, (c, cid) => struct(
          call_function("graft_dot", col("qv"), c).as("s"),
          cid.as("c")))).as("sc"))
      .withColumn("probe_rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(desc("sc.s"), col("sc.c"))))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("sc.c").as("cell"))
  }

  /** The inverted-list scan pruned to `probed` cells — `cell` is a
    * partition column, so this is static partition pruning, not a
    * post-scan filter.
    */
  def prunedLists(spark: SparkSession, path: String,
      probed: Seq[Int]): DataFrame =
    spark.read.parquet(s"$path/lists")
      .filter(col("cell").isInCollection(probed))

  /** Recursive delete of a staged index dir (children before parents).
    * Per-file failures are swallowed (ADVICE r14): this runs from `finally`
    * blocks in gated queries, where a stray file landing between walk and
    * delete must not mask the query's real result or exception.
    */
  def deleteDir(p: String): Unit = {
    import java.nio.file.{Files, Paths}
    import java.util.Comparator
    val root = Paths.get(p)
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
}
