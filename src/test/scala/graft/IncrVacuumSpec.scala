package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.FunnelMv
import graft.similarity.IvfIndex
import graft.sources.ManifestedPartitions

/** Physical tombstone vacuum of the persisted funnel index
  * (q_pipeline_incr_vacuum). The gate pins the funnel arithmetic against
  * the DuckDB oracle; this spec pins the PHYSICAL claims on a hand-planted
  * index whose rows cover the delete shapes, under the manifest-committed
  * layout (r16):
  *   - tombstoned rows are gone from every later snapshot read (and the
  *     purge count is exact, unmatched tombstones ignored);
  *   - keep-first succession falls out for free — after vacuuming an
  *     original whose fp had suppressed a later copy, the copy IS the
  *     keeper of its group;
  *   - only the affected fp-buckets are rewritten: unaffected buckets
  *     keep the identical live files on disk;
  *   - a fully-tombstoned bucket drops out of the manifest, and its dead
  *     bytes are physically removed once retention GC passes the horizon.
  */
class IncrVacuumSpec extends SparkSpec {

  import spark.implicits._

  private val nBuckets = 4

  // (doc_id, batch, fp, n_tok, q, qr): fp A plants the resurface case
  // (base original 1 suppresses batch-1 copy 101), B the group-vanish,
  // C an untouched multi-row group, D an untouched gate-failing single
  private def idx = Seq(
    (1L, 0, "A", 10L, true, true), (101L, 1, "A", 10L, true, true),
    (2L, 0, "B", 5L, true, false),
    (3L, 0, "C", 8L, true, true), (4L, 0, "C", 8L, true, true),
    (5L, 0, "D", 3L, false, false))
    .toDF("doc_id", "batch", "fp", "n_tok", "q", "qr")

  // 999 matches nothing: vacuum must count only rows actually purged
  private def tombstones = Seq(1L, 2L, 999L).toDF("doc_id")

  test("vacuum purges exactly the tombstoned rows, resurfaces the " +
    "suppressed keeper, and rewrites only the affected buckets") {
    val stage = Files.createTempDirectory("graft_vacuum_spec")
    try {
      FunnelMv.writeDocIndex(idx, stage.toString, nBuckets)
      val before = ManifestedPartitions.liveFiles(
        spark, stage.toString, "docindex", "fpb")

      val purged = FunnelMv.vacuum(spark, stage.toString, tombstones)
      assert(purged == 2L, s"purged $purged rows, expected 2")

      val vac = FunnelMv.readDocIndex(spark, stage.toString)
      val ids = vac.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(101L, 3L, 4L, 5L),
        s"post-vacuum ids $ids != expected")

      // keep-first succession: with the original physically gone, the
      // batch-1 copy is the keeper of group A — no special casing
      val keepers = vac.withColumn("rn",
          row_number().over(Window.partitionBy("fp")
            .orderBy(col("batch"), col("doc_id"))))
        .filter(col("rn") === 1)
        .select("fp", "doc_id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(keepers == Map("A" -> 101L, "C" -> 3L, "D" -> 5L),
        s"keepers $keepers != expected")

      // physical locality: buckets holding no tombstoned fp keep the
      // IDENTICAL live files; affected buckets moved to a new generation
      val affected = idx.filter(col("doc_id").isin(1L, 2L))
        .select(pmod(xxhash64(col("fp")), lit(nBuckets.toLong))
          .cast("int")).distinct().collect().map(_.getInt(0)).toSet
      val after = ManifestedPartitions.liveFiles(
        spark, stage.toString, "docindex", "fpb")
      before.keySet.filterNot(affected).foreach { b =>
        assert(after.get(b).contains(before(b)),
          s"unaffected bucket $b was rewritten: ${before(b)} -> ${after.get(b)}")
      }
      affected.foreach { b =>
        assert(!after.get(b).contains(before(b)),
          s"affected bucket $b kept its old files")
      }
    } finally IvfIndex.deleteDir(stage.toString)
  }

  test("vacuuming a fully-tombstoned bucket drops it from the manifest " +
    "and GC removes its bytes") {
    val stage = Files.createTempDirectory("graft_vacuum_spec_empty")
    try {
      // one single-row group per bucket value so one bucket empties out
      FunnelMv.writeDocIndex(idx, stage.toString, nBuckets)
      // tombstone EVERY row of fp D's bucket (doc 5 is its only row,
      // unless a hash collision put another fp there — tombstone those too)
      val dBucket = idx.filter(col("fp") === "D")
        .select(pmod(xxhash64(col("fp")), lit(nBuckets.toLong)).cast("int"))
        .collect()(0).getInt(0)
      val all = idx.withColumn("fpb",
        pmod(xxhash64(col("fp")), lit(nBuckets.toLong)).cast("int"))
      val ts = all.filter(col("fpb") === dBucket).select("doc_id")
      val expected = ts.count()
      val purged = FunnelMv.vacuum(spark, stage.toString, ts)
      assert(purged == expected)
      // the emptied bucket is gone from the live manifest...
      val live = ManifestedPartitions.liveFiles(
        spark, stage.toString, "docindex", "fpb")
      assert(!live.contains(dBucket),
        s"emptied bucket $dBucket still has live manifest entries")
      val rest = FunnelMv.readDocIndex(spark, stage.toString)
      assert(rest.count() == 6 - expected)
      // ...its old bytes remain until GC (time travel to the pre-vacuum
      // snapshot stays legal), then are physically removed
      val oldDir = stage.resolve("docindex").resolve("g=1")
        .resolve(s"fpb=$dBucket")
      assert(Files.isDirectory(oldDir))
      ManifestedPartitions.expire(spark, stage.toString,
        Seq(("docindex", "fpb")), keepLast = 1)
      assert(!Files.exists(oldDir),
        "tombstoned bucket's bytes survived retention GC")
      assert(FunnelMv.readDocIndex(spark, stage.toString).count()
        == 6 - expected)
    } finally IvfIndex.deleteDir(stage.toString)
  }
}
