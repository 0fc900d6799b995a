package graft

/** Streaming funnel-MV ingest (q_pipeline_mv_stream_ingest): the gate's
  * oracle proves the final view lands on the full recompute; this spec
  * pins the cross-gate equivalence and the lifecycle booleans directly:
  * stream-maintained (3 micro-batches + checkpoint restart + explicit
  * batch re-delivery) ≡ the one-shot incremental apply of
  * q_pipeline_incr_mv, row for row — the batch-decomposition-invariance
  * that makes versioned exactly-once commits trustworthy.
  */
class MvStreamIngestSpec extends SparkSpec {

  test("stream-ingested view equals the one-shot incremental apply; " +
    "restart resumed, replay was idempotent, per-batch reads bounded") {
    val byName = graft.queries.DedupCatalog.all.map(q => q.name -> q).toMap
    val streamed =
      byName("q_pipeline_mv_stream_ingest").query(spark, sfCorrect)
    assert(streamed.select("resumed").collect().forall(_.getBoolean(0)),
      "checkpoint restart did not resume")
    assert(streamed.select("replay_idempotent").collect()
      .forall(_.getBoolean(0)), "batch re-delivery was not idempotent")
    assert(streamed.select("bounded_reads").collect()
      .forall(_.getBoolean(0)),
      "per-batch fp assembly is not bounded — the O(V) delta chain is back")
    val sRows = streamed
      .drop("resumed", "replay_idempotent", "bounded_reads")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    val oneShot = byName("q_pipeline_incr_mv").query(spark, sfCorrect)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(sRows.nonEmpty && sRows.length == 4)
    assert(sRows == oneShot,
      s"streamed view diverged from one-shot apply:\n$sRows\nvs\n$oneShot")
  }

  test("VERSION-AXIS scaling: 12 batches at fixed data, compaction every " +
    "2 — per-batch input stays BOUNDED while the r16 layout's grows " +
    "linearly with stream age") {
    // the r16 verdict's one scale-killer was on the version axis (batch
    // count), which the data-axis soaks never exercised: per-batch input
    // assembly unioned fp-delta versions 1..V. This drives 12 ledgered
    // ingests (no streaming engine — the IVM step itself is what scales)
    // against a fixed corpus and pins the structural invariant: after the
    // run, no fp bucket's live rows span more than cadence+1 files, and
    // the MANIFEST (what a batch actually opens) holds at most
    // buckets × (cadence+1) entries — independent of V.
    import graft.dedup.FunnelMv
    import graft.sources.{ManifestedPartitions => MP}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfCorrect/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").localCheckpoint(true)
    val stage = java.nio.file.Files.createTempDirectory("graft_mv_vaxis")
    val root = stage.toString
    val nBuckets = 8
    val cadence = 2
    val batches = 12
    try {
      FunnelMv.writeVersioned(docs, root, nBuckets, 8, 0.9, 0.1, 0.9)
      (0 until batches).foreach { b =>
        val batch = docs.filter(pmod(col("doc_id"), lit(batches)) === b)
          .select((-(col("doc_id") + lit(1))).as("doc_id"),
            concat(col("text"), lit(s" vaxis batch $b")).as("text"))
        val outV = FunnelMv.ingestBatch(spark, root, batch, b.toLong,
          nBuckets, 8, 0.9, 0.1, 0.9)
        assert(MP.latestVersion(root).contains(outV))
        if (b % cadence == cadence - 1) FunnelMv.compactFps(spark, root)
      }
      val stats = MP.liveStats(spark, root, FunnelMv.FpsData)
      assert(stats.values.forall(_._1 <= cadence + 1),
        s"a bucket's live files exceed cadence+1: $stats")
      val entries = MP.readEntries(spark, root, FunnelMv.FpsData,
        MP.latestVersion(root).get)
      assert(entries.size <= nBuckets * (cadence + 1),
        s"manifest grew with stream age: ${entries.size} entries " +
          s"after $batches batches")
      // and the maintained view is still exactly the full recompute
      import graft.sources.VersionedView
      val v = MP.latestVersion(root).get
      val maintained = FunnelMv.readView(spark, root, v)
        .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val all = docs.unionByName((0 until batches).map { b =>
        docs.filter(pmod(col("doc_id"), lit(batches)) === b)
          .select((-(col("doc_id") + lit(1))).as("doc_id"),
            concat(col("text"), lit(s" vaxis batch $b")).as("text"))
      }.reduce(_ unionByName _))
      val scratch = java.nio.file.Files
        .createTempDirectory("graft_mv_vaxis_full").toString
      FunnelMv.writeVersioned(all, scratch, nBuckets, 8, 0.9, 0.1, 0.9)
      val recomputed = FunnelMv.readView(spark, scratch, 1L)
        .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      graft.similarity.IvfIndex.deleteDir(scratch)
      assert(maintained == recomputed,
        s"12-batch maintained view diverged from full recompute:\n" +
          s"$maintained\nvs\n$recomputed")
    } finally graft.similarity.IvfIndex.deleteDir(root)
  }
}
