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
    "restart resumed and replay was idempotent") {
    val byName = graft.queries.DedupCatalog.all.map(q => q.name -> q).toMap
    val streamed =
      byName("q_pipeline_mv_stream_ingest").query(spark, sfCorrect)
    assert(streamed.select("resumed").collect().forall(_.getBoolean(0)),
      "checkpoint restart did not resume")
    assert(streamed.select("replay_idempotent").collect()
      .forall(_.getBoolean(0)), "batch re-delivery was not idempotent")
    val sRows = streamed.drop("resumed", "replay_idempotent")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    val oneShot = byName("q_pipeline_incr_mv").query(spark, sfCorrect)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(sRows.nonEmpty && sRows.length == 4)
    assert(sRows == oneShot,
      s"streamed view diverged from one-shot apply:\n$sRows\nvs\n$oneShot")
  }
}
