package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex

/** Persisted BM25 postings index — the lexical-retrieval twin of the
  * persisted IVF lifecycle (similarity.IvfIndex): a 100 TB corpus does not
  * re-tokenize itself per query (Bm25.topK's shape) — it builds the
  * inverted index ONCE (a full-scan job, amortized over every query
  * thereafter) and serves queries from the persisted artifact:
  *
  *   - `<path>/postings`: one row per (document, term) — (id, w, tf, dl),
  *     the document length DENORMALIZED onto each posting so scoring never
  *     joins a corpus-sized side table — PARTITIONED BY `tb`, the term's
  *     hash bucket (`pmod(xxhash64(w), n_buckets)`), so a query's term
  *     lookups statically PRUNE the scan to exactly the probed buckets'
  *     directories (≈ |query| of n_buckets partitions) instead of
  *     rescanning the corpus;
  *   - `<path>/stats`: one row (n_docs, total_dl, n_buckets) — the corpus
  *     statistics BM25's idf/avgdl need, persisted so a probe never
  *     recomputes them from the postings (which would be a full scan).
  *
  * Determinism contract: tf/dl/df and the corpus stats are integers that
  * round-trip parquet exactly, and the probe scores them through the SAME
  * expression tree as the in-query path (Bm25.rankTopK), so probing the
  * persisted index returns results bit-identical to Bm25.topK over the
  * same corpus — which is what lets the q_t_bm25_persist gate share
  * q_t_bm25's DuckDB oracle.
  */
object PostingsIndex {

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
    posts.withColumn("tb",
      pmod(xxhash64(col("w")), lit(nBuckets.toLong)).cast("int"))

  /** Build + persist the index for `docs` at `path` (overwrites). */
  def write(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, path: String): Unit = {
    val posts = withBucket(postings(docs, idCol, textCol), nBuckets)
      .localCheckpoint(true) // feeds both the postings write and the stats
    posts
      .repartition(col("tb")) // one task owns a bucket ⇒ one file each
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
    // n_docs/total_dl derive from the DISTINCT documents (dl is constant
    // within a document's postings, so min == the value)
    posts.groupBy("id").agg(min("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("dl"), lit(0L)).as("total_dl"))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** APPEND a document batch WITHOUT rebuilding: the batch's postings are
    * bucketed with the STORED n_buckets and land as new files inside the
    * existing bucket directories; the stats row is advanced by the batch's
    * own (n_docs, total_dl) — exact because append's contract is NEW
    * document ids (the standard ingest shape; an updated document is a
    * delete + insert). Ingest cost is proportional to the BATCH, never the
    * corpus. The stats swap is staged-then-moved so a concurrent reader
    * sees either the old or the new row, never a half-written directory
    * (a real deployment commits both steps under one manifest; postings
    * land first so a crash between the two leaves scores on stale stats,
    * not missing documents).
    */
  def append(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, textCol: String): Unit = {
    import java.nio.file.{Files, Paths}
    val st = spark.read.parquet(s"$path/stats").collect()(0)
    val (nDocs, totalDl, nBuckets) =
      (st.getLong(st.fieldIndex("n_docs")),
        st.getLong(st.fieldIndex("total_dl")),
        st.getInt(st.fieldIndex("n_buckets")))
    val posts = withBucket(postings(delta, idCol, textCol), nBuckets)
      .localCheckpoint(true)
    posts.write.mode("append").partitionBy("tb").parquet(s"$path/postings")
    swapStats(spark, path,
      posts.groupBy("id").agg(min("dl").as("dl"))
        .agg((count(lit(1)) + lit(nDocs)).as("n_docs"),
          (coalesce(sum("dl"), lit(0L)) + lit(totalDl)).as("total_dl"))
        .withColumn("n_buckets", lit(nBuckets)))
  }

  /** DELETE a tombstone batch (doc ids) from the index — the GDPR leg of
    * the postings lifecycle, mirroring the funnel index's vacuum: the
    * affected buckets are discovered by a column-pruned (id, tb) scan
    * joined to the tombstones, ONLY those buckets are rewritten through
    * the shared partition-local anti-join swap (untouched buckets' files
    * are never opened), and the stats row is decremented by exactly the
    * deleted documents' own (n_docs, total_dl) — so idf/avgdl at the next
    * probe reflect the post-delete corpus. Returns the number of posting
    * rows purged; unmatched tombstones are ignored.
    */
  def delete(spark: SparkSession, path: String,
      tombstones: DataFrame): Long = {
    val ts = tombstones.select("doc_id").localCheckpoint(true)
    val dead = spark.read.parquet(s"$path/postings")
      .select("id", "tb", "dl") // column-pruned: never reads w/tf
      .join(broadcast(ts), col("id") === col("doc_id"))
      .localCheckpoint(true) // buckets + purge count + stats decrement
    val affected = dead.select("tb").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by the delete batch
    if (affected.isEmpty) return 0L
    IvfIndex.rewritePartitions(spark, s"$path/postings", "tb", affected,
      df => df.join(broadcast(ts), df("id") === ts("doc_id"), "left_anti"))
    val st = spark.read.parquet(s"$path/stats").collect()(0)
    swapStats(spark, path,
      dead.groupBy("id").agg(min("dl").as("dl"))
        .agg((lit(st.getLong(st.fieldIndex("n_docs"))) - count(lit(1)))
            .as("n_docs"),
          (lit(st.getLong(st.fieldIndex("total_dl")))
            - coalesce(sum("dl"), lit(0L))).as("total_dl"))
        .withColumn("n_buckets", lit(st.getInt(st.fieldIndex("n_buckets")))))
    dead.count()
  }

  /** Staged-then-moved stats replacement (append/delete share it): a
    * concurrent reader sees either the old or the new row, never a
    * half-written directory.
    */
  private def swapStats(spark: SparkSession, path: String,
      stats: DataFrame): Unit = {
    import java.nio.file.{Files, Paths}
    stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats_staged")
    val retired = Paths.get(s"$path/stats_retired")
    Files.move(Paths.get(s"$path/stats"), retired)
    Files.move(Paths.get(s"$path/stats_staged"), Paths.get(s"$path/stats"))
    IvfIndex.deleteDir(retired.toString)
  }

  /** COMPACT fragmented bucket partitions (append lands one file per batch
    * per touched bucket): rewrite exactly the multi-file buckets back to
    * one file each — bucket-local, partition-pruned, probe results
    * bit-identical before/after. Returns the number of compacted buckets.
    */
  def compact(spark: SparkSession, path: String): Int =
    IvfIndex.compactPartitions(spark, s"$path/postings", "tb")

  /** The hash buckets `terms` probe — computed through the same Spark
    * expression that bucketed the postings at write time, collected on
    * the driver (≤ |terms| rows) to become the STATIC partition filter.
    */
  def termBuckets(spark: SparkSession, terms: Seq[String],
      nBuckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("w")
      .select(pmod(xxhash64(col("w")), lit(nBuckets.toLong)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** The postings scan pruned to `terms`' buckets — `tb` is a partition
    * column, so the bucket filter is static partition pruning; the term
    * equality filter then lands on the pruned files' dictionary-encoded
    * `w` column.
    */
  def prunedPostings(spark: SparkSession, path: String, terms: Seq[String],
      nBuckets: Int): DataFrame =
    spark.read.parquet(s"$path/postings")
      .filter(col("tb").isInCollection(termBuckets(spark, terms, nBuckets)))
      .filter(col("w").isin(terms: _*))

  /** Probe-only BM25 top-`k` against a persisted index: (rank, idCol,
    * score), bit-identical to Bm25.topK over the same corpus. Reads the
    * 1-row stats table plus only the probed buckets' postings files —
    * never the corpus text.
    */
  def probe(spark: SparkSession, path: String, queryTerms: Seq[String],
      idCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val st = spark.read.parquet(s"$path/stats").collect()(0)
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
