package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ManifestedPartitions, VersionedView}

/** Persisted BM25 postings index — the lexical-retrieval twin of the
  * persisted IVF lifecycle (similarity.IvfIndex): a 100 TB corpus does not
  * re-tokenize itself per query (Bm25.topK's shape) — it builds the
  * inverted index ONCE (a full-scan job, amortized over every query
  * thereafter) and serves queries from the persisted artifact:
  *
  *   - `<path>/postings`: one row per (document, term) — (id, w, tf, dl),
  *     the document length DENORMALIZED onto each posting so scoring never
  *     joins a corpus-sized side table — manifest-committed generations
  *     per `tb`, the term's hash bucket (`pmod(xxhash64(w), n_buckets)`),
  *     so a query's term lookups statically PRUNE the scan to exactly the
  *     probed buckets' live directories (≈ |query| of n_buckets buckets)
  *     instead of rescanning the corpus;
  *   - `<path>/stats`: one row (n_docs, total_dl, n_buckets) — the corpus
  *     statistics BM25's idf/avgdl need, persisted so a probe never
  *     recomputes them from the postings (which would be a full scan) —
  *     committed as a SIDECAR TABLE of the postings manifest, under the
  *     SAME marker (r15 verdict order #1: the old staged-move stats swap
  *     had a window with no stats directory at all; now a maintenance
  *     commit lands postings manifest + stats atomically or not at all,
  *     and a torn run leaves the previous snapshot of BOTH fully live).
  *
  * Determinism contract: tf/dl/df and the corpus stats are integers that
  * round-trip parquet exactly, and the probe scores them through the SAME
  * expression tree as the in-query path (Bm25.rankTopK), so probing the
  * persisted index returns results bit-identical to Bm25.topK over the
  * same corpus — which is what lets the q_t_bm25_persist gate share
  * q_t_bm25's DuckDB oracle.
  */
object PostingsIndex {

  private val Postings = "postings"
  private val Tb = "tb"
  private val Stats = "stats"

  /** The (id, w, tf, dl) posting rows for `docs` — tokenization shared
    * with Bm25.topK (empty/whitespace-only documents contribute nothing,
    * keeping both paths' corpus statistics aligned).
    */
  private def postings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = Bm25.tokens(docs, idCol, textCol)
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    toks.groupBy(idCol, "w").agg(count(lit(1)).as("tf"))
      .join(dl, idCol)
      .select(col(idCol).as("id"), col("w"), col("tf"), col("dl"))
  }

  private def withBucket(posts: DataFrame, nBuckets: Int): DataFrame =
    posts.withColumn(Tb,
      pmod(xxhash64(col("w")), lit(nBuckets.toLong)).cast("int"))

  /** Build + persist the index for `docs` at `path` (overwrites): the
    * initial postings generation and the stats sidecar land under ONE
    * manifest commit.
    */
  def write(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, path: String): Unit = {
    val posts = withBucket(postings(docs, idCol, textCol), nBuckets)
      .localCheckpoint(true) // feeds both the postings write and the stats
    ManifestedPartitions.init(posts, path, Postings, Tb,
      Map(Stats -> statsOf(posts, nBuckets)))
  }

  /** n_docs/total_dl derive from the DISTINCT documents (dl is constant
    * within a document's postings, so min == the value).
    */
  private def statsOf(posts: DataFrame, nBuckets: Int): DataFrame =
    posts.groupBy("id").agg(min("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("dl"), lit(0L)).as("total_dl"))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1)

  /** The committed (n_docs, total_dl, n_buckets) row at the latest (or
    * pinned) version.
    */
  def readStats(spark: SparkSession, path: String,
      version: Option[Long] = None): Row = {
    val v = version.orElse(VersionedView.latestVersion(path)).getOrElse(
      throw new IllegalStateException(s"no committed index at $path"))
    VersionedView.readTable(spark, path, Stats, v).collect()(0)
  }

  /** APPEND a document batch WITHOUT rebuilding: the batch's postings are
    * bucketed with the STORED n_buckets and land as a new
    * manifest-committed generation; the stats sidecar is advanced by the
    * batch's own (n_docs, total_dl) — exact because append's contract is
    * NEW document ids (the standard ingest shape; an updated document is
    * a delete + insert) — and commits UNDER THE SAME MARKER as the
    * postings manifest, so scores can never run on stats that diverged
    * from the postings they describe. Ingest cost is proportional to the
    * BATCH, never the corpus.
    */
  def append(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, textCol: String): Unit = {
    val st = readStats(spark, path)
    val (nDocs, totalDl, nBuckets) =
      (st.getLong(st.fieldIndex("n_docs")),
        st.getLong(st.fieldIndex("total_dl")),
        st.getInt(st.fieldIndex("n_buckets")))
    val posts = withBucket(postings(delta, idCol, textCol), nBuckets)
      .localCheckpoint(true)
    val (gen, merged) =
      ManifestedPartitions.stageAppend(spark, path, Postings, Tb, posts)
    ManifestedPartitions.commitManifests(spark, path, gen,
      Map(Postings -> merged),
      Map(Stats -> posts.groupBy("id").agg(min("dl").as("dl"))
        .agg((count(lit(1)) + lit(nDocs)).as("n_docs"),
          (coalesce(sum("dl"), lit(0L)) + lit(totalDl)).as("total_dl"))
        .withColumn("n_buckets", lit(nBuckets)).coalesce(1)))
  }

  /** DELETE a tombstone batch (doc ids) from the index — the GDPR leg of
    * the postings lifecycle, mirroring the funnel index's vacuum: the
    * affected buckets are discovered by a column-pruned (id, tb) scan
    * joined to the tombstones, ONLY those buckets are rewritten
    * (anti-join into a fresh generation; untouched buckets' files are
    * never opened), and the stats row is decremented by exactly the
    * deleted documents' own (n_docs, total_dl) — so idf/avgdl at the next
    * probe reflect the post-delete corpus. New generation, updated
    * manifest, and updated stats commit under ONE marker; the dead
    * generations' bytes are physically removed by [[expire]]. Returns the
    * number of posting rows purged; unmatched tombstones are ignored;
    * tombstones are deduplicated so a repeated id cannot inflate the
    * purge count or double-decrement the stats row (ADVICE r15).
    */
  def delete(spark: SparkSession, path: String,
      tombstones: DataFrame): Long = {
    val ts = tombstones.select("doc_id").distinct().localCheckpoint(true)
    val dead = ManifestedPartitions.readLatest(spark, path, Postings, Tb)
      .select("id", Tb, "dl") // column-pruned: never reads w/tf
      .join(broadcast(ts), col("id") === col("doc_id"))
      .localCheckpoint(true) // buckets + purge count + stats decrement
    val affected = dead.select(Tb).distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by the delete batch
    if (affected.isEmpty) return 0L
    val st = readStats(spark, path)
    val (gen, merged) = ManifestedPartitions.stageRewrite(
      spark, path, Postings, Tb, affected,
      df => df.join(broadcast(ts), df("id") === ts("doc_id"), "left_anti"))
    ManifestedPartitions.commitManifests(spark, path, gen,
      Map(Postings -> merged),
      Map(Stats -> dead.groupBy("id").agg(min("dl").as("dl"))
        .agg((lit(st.getLong(st.fieldIndex("n_docs"))) - count(lit(1)))
            .as("n_docs"),
          (lit(st.getLong(st.fieldIndex("total_dl")))
            - coalesce(sum("dl"), lit(0L))).as("total_dl"))
        .withColumn("n_buckets", lit(st.getInt(st.fieldIndex("n_buckets"))))
        .coalesce(1)))
    dead.count()
  }

  /** COMPACT fragmented bucket partitions (append lands one generation per
    * batch): rewrite exactly the buckets whose live rows span several
    * files back to one file each — bucket-local, partition-pruned, probe
    * results bit-identical before/after, crash-safe (marker-last commit).
    * The stats sidecar is carried over unchanged under the new marker.
    * Returns the number of compacted buckets.
    */
  def compact(spark: SparkSession, path: String): Int = {
    val st = readStats(spark, path)
    val spark2 = spark
    import spark2.implicits._
    val carried = Seq((st.getLong(st.fieldIndex("n_docs")),
        st.getLong(st.fieldIndex("total_dl")),
        st.getInt(st.fieldIndex("n_buckets"))))
      .toDF("n_docs", "total_dl", "n_buckets").coalesce(1)
    ManifestedPartitions.compact(spark, path, Postings, Tb,
      Map(Stats -> carried))
  }

  /** RETENTION GC: expire manifest versions below the keep-horizon and
    * delete unreferenced postings generations — where deleted documents'
    * bytes actually go away. Returns (expired versions, deleted
    * generation count).
    */
  def expire(spark: SparkSession, path: String,
      keepLast: Int): (Seq[Long], Int) =
    ManifestedPartitions.expire(spark, path, Seq((Postings, Tb)), keepLast)

  /** The hash buckets `terms` probe — computed through the same Spark
    * expression that bucketed the postings at write time, collected on
    * the driver (≤ |terms| rows) to become the STATIC pruning list.
    */
  def termBuckets(spark: SparkSession, terms: Seq[String],
      nBuckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("w")
      .select(pmod(xxhash64(col("w")), lit(nBuckets.toLong)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** The postings scan pruned to `terms`' buckets — only the probed
    * buckets' live generation directories are opened (static pruning by
    * path construction); the term equality filter then lands on the
    * pruned files' dictionary-encoded `w` column.
    */
  def prunedPostings(spark: SparkSession, path: String, terms: Seq[String],
      nBuckets: Int, version: Option[Long] = None): DataFrame = {
    val probed = termBuckets(spark, terms, nBuckets)
    val entries = ManifestedPartitions.prunedEntries(
      spark, path, Postings, probed, version)
    val scan =
      if (entries.nonEmpty)
        ManifestedPartitions.read(spark, path, Postings, Tb, entries)
      else {
        val v = version.orElse(VersionedView.latestVersion(path)).get
        val any = ManifestedPartitions.readEntries(spark, path, Postings, v)
        ManifestedPartitions.read(spark, path, Postings, Tb, any.take(1))
          .filter(lit(false))
      }
    scan.filter(col("w").isin(terms: _*))
  }

  /** Probe-only BM25 top-`k` against a persisted index: (rank, idCol,
    * score), bit-identical to Bm25.topK over the same corpus. Reads the
    * 1-row stats sidecar plus only the probed buckets' postings files —
    * never the corpus text.
    */
  def probe(spark: SparkSession, path: String, queryTerms: Seq[String],
      idCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val st = readStats(spark, path)
    val nBuckets = st.getInt(st.fieldIndex("n_buckets"))
    // consumed twice (as the tf rows and for the per-term df counts) —
    // materialize once so the pruned scan doesn't re-run (ADVICE r14
    // pattern)
    val posts = prunedPostings(spark, path, queryTerms, nBuckets)
      .localCheckpoint(true)
    val dfq = posts.groupBy("w").agg(count(lit(1)).as("dfc"))
    val stats = spark.range(1)
      .select(lit(st.getLong(st.fieldIndex("n_docs"))).as("n_docs"),
        lit(st.getLong(st.fieldIndex("total_dl"))).as("total_dl"))
    val perTerm = posts
      .join(broadcast(dfq), "w")
      .crossJoin(broadcast(stats))
      .withColumnRenamed("id", idCol)
    Bm25.rankTopK(perTerm, idCol, k, k1, b)
  }
}
