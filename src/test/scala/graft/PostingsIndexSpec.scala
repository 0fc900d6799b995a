package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex
import graft.sources.ManifestedPartitions
import graft.text.{Bm25, PostingsIndex}

/** Persisted BM25 postings index (q_t_bm25_persist / q_t_bm25_append) —
  * beyond the shared DuckDB oracle, this pins the four lifecycle claims
  * under the manifest-committed layout (r16 — postings manifest and stats
  * sidecar commit under ONE marker):
  *   1. PARITY — probing the persisted index is bit-identical to the
  *      in-query Bm25.topK over the same corpus (integer tf/dl/df/stats
  *      round-trip parquet exactly; both paths score via Bm25.rankTopK);
  *   2. PRUNING — the probe scan reads ONLY the query terms' buckets'
  *      live directories, never the whole postings file set;
  *   3. MAINTENANCE — base-build + append + compact ≡ full build
  *      bit-for-bit, compaction leaves one live file per bucket, and the
  *      stats row advances exactly by the batch;
  *   4. AMORTIZATION — probe-only wall-clock is well under build+persist.
  */
class PostingsIndexSpec extends SparkSpec {

  private val terms = Seq("join", "vector", "stream")
  private val k = 15
  private val nBuckets = 16

  test("persisted postings: probe-only equals in-query Bm25.topK " +
    "bit-for-bit and the scan is pruned to the probed buckets") {
    val docs = spark.read.parquet(s"$sfCorrect/documents.parquet")
    val stage = Files.createTempDirectory("graft_postings_spec")
    try {
      val t0 = System.nanoTime()
      PostingsIndex.write(docs, "doc_id", "text", nBuckets, stage.toString)
      val buildS = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val persisted = PostingsIndex
        .probe(spark, stage.toString, terms, "doc_id", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      val probeS = (System.nanoTime() - t1) / 1e9
      assert(persisted.nonEmpty, "probe returned nothing")

      val inQuery = Bm25.topK(docs, "doc_id", "text", terms, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      // bit-identical, not tolerance-equal: same doubles, same ranks
      assert(persisted.toSeq == inQuery.toSeq,
        s"persisted probe diverged from in-query BM25:\n" +
          s"${persisted.toSeq}\nvs\n${inQuery.toSeq}")

      // pruning: input_file_name read DIRECTLY over the pruned scan —
      // every file must come from a probed bucket directory, and the
      // probed set must be a strict subset of the index's buckets
      val probed = PostingsIndex.termBuckets(spark, terms, nBuckets)
      val filesRead = PostingsIndex
        .prunedPostings(spark, stage.toString, terms, nBuckets)
        .select(input_file_name().as("f"))
        .collect().map(_.getString(0)).toSet
      val bucketsRead = filesRead.flatMap { f =>
        "tb=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)
      }
      assert(filesRead.forall(_.contains("tb=")),
        s"probe read a non-partitioned path: $filesRead")
      assert(bucketsRead.subsetOf(probed.toSet),
        s"scan touched unprobed buckets: ${bucketsRead -- probed.toSet}")
      assert(probed.size <= terms.size,
        s"${probed.size} buckets probed for ${terms.size} terms")
      assert(bucketsRead.size < nBuckets,
        s"probe read all $nBuckets partitions — no pruning")

      // amortization: same generous 0.8 bound as PersistedIvfSpec — a
      // loaded machine can't flake the suite while a regression to
      // probe-re-tokenizes-the-corpus still fails loudly
      assert(probeS < 0.8 * (buildS + probeS),
        f"probe-only $probeS%.2fs did not amortize build $buildS%.2fs")
    } finally IvfIndex.deleteDir(stage.toString)
  }

  test("postings append + compact: equals full build bit-for-bit, " +
    "one file per bucket after compaction, stats advance by the batch") {
    val docs = spark.read.parquet(s"$sfCorrect/documents.parquet")
    val isDelta = pmod(col("doc_id"), lit(3)) === 0
    val full = Files.createTempDirectory("graft_postings_full")
    val inc = Files.createTempDirectory("graft_postings_inc")
    try {
      PostingsIndex.write(docs, "doc_id", "text", nBuckets, full.toString)
      PostingsIndex.write(docs.filter(!isDelta), "doc_id", "text",
        nBuckets, inc.toString)
      val statsBase = PostingsIndex.readStats(spark, inc.toString)
      PostingsIndex.append(spark, inc.toString, docs.filter(isDelta),
        "doc_id", "text")

      // the stats row advanced EXACTLY by the batch: post-append stats
      // equal the full build's (disjoint id sets, same tokenization) —
      // and it was committed under the SAME marker as the postings
      // manifest (same version resolves both)
      val statsFull = PostingsIndex.readStats(spark, full.toString)
      val statsInc = PostingsIndex.readStats(spark, inc.toString)
      assert(statsInc.getLong(0) == statsFull.getLong(0) &&
        statsInc.getLong(1) == statsFull.getLong(1),
        s"appended stats $statsInc != full-build stats $statsFull")
      assert(statsInc.getLong(0) > statsBase.getLong(0),
        "append did not grow n_docs")

      val compacted = PostingsIndex.compact(spark, inc.toString)
      assert(compacted > 0, "append left no fragmented buckets")
      // one live parquet file per bucket after compaction
      val live = ManifestedPartitions.liveFiles(
        spark, inc.toString, "postings", "tb")
      assert(live.nonEmpty)
      live.foreach { case (tb, fs) =>
        assert(fs.size == 1, s"bucket tb=$tb holds ${fs.size} live files")
      }

      // maintained index ≡ full build, bit-for-bit
      def run(path: String) = PostingsIndex
        .probe(spark, path, terms, "doc_id", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(run(inc.toString) == run(full.toString),
        "append+compact diverged from the full build")
    } finally {
      IvfIndex.deleteDir(full.toString)
      IvfIndex.deleteDir(inc.toString)
    }
  }

  test("postings delete: equals a build over the remaining docs " +
    "bit-for-bit, stats decrement exactly, bytes gone") {
    val docs = spark.read.parquet(s"$sfCorrect/documents.parquet")
    val isDel = pmod(col("doc_id"), lit(7)) === 0
    val full = Files.createTempDirectory("graft_postings_del")
    val rest = Files.createTempDirectory("graft_postings_rest")
    try {
      PostingsIndex.write(docs, "doc_id", "text", nBuckets, full.toString)
      PostingsIndex.write(docs.filter(!isDel), "doc_id", "text",
        nBuckets, rest.toString)
      val ts = docs.filter(isDel).select("doc_id").localCheckpoint(true)
      val posts = ManifestedPartitions.readLatest(
        spark, full.toString, "postings", "tb")
      val deadRows = posts.join(ts, posts("id") === ts("doc_id")).count()
      val purged = PostingsIndex.delete(spark, full.toString, ts)
      assert(purged == deadRows && purged > 0,
        s"purged $purged rows, expected $deadRows")

      // gone from every later snapshot read: no posting row of a deleted
      // doc remains live (the retired generation's bytes go at GC)
      val tsIds = ts.collect().map(_.getLong(0)).toSet
      assert(ManifestedPartitions.readLatest(
          spark, full.toString, "postings", "tb")
        .filter(col("id").isInCollection(tsIds)).count() == 0)

      // stats decremented to exactly the build-over-remaining stats
      val sFull = PostingsIndex.readStats(spark, full.toString)
      val sRest = PostingsIndex.readStats(spark, rest.toString)
      assert(sFull.getLong(0) == sRest.getLong(0) &&
        sFull.getLong(1) == sRest.getLong(1),
        s"post-delete stats $sFull != rebuild stats $sRest")

      // probe bit-identical to the build over remaining docs
      def run(path: String) = PostingsIndex
        .probe(spark, path, terms, "doc_id", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(run(full.toString) == run(rest.toString),
        "post-delete probe diverged from the rebuild over remaining docs")

      // GC: the tombstoned bytes are physically removed past the horizon
      val (expired, removed) = PostingsIndex.expire(spark, full.toString, 1)
      assert(expired.nonEmpty && removed >= 1,
        s"expire removed $expired versions / $removed partition dirs")
      assert(run(full.toString) == run(rest.toString),
        "retention GC changed live probe results")
    } finally {
      IvfIndex.deleteDir(full.toString)
      IvfIndex.deleteDir(rest.toString)
    }
  }
}
