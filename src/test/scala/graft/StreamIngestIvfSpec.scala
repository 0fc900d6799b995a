package graft

/** Streaming ingest into the persisted IVF index (q_s_ivf_stream_ingest):
  * per-vector assignment under a frozen coarse quantizer is
  * batch-independent, so the index built by streaming the delta through
  * foreachBatch appends (3 micro-batches) must answer probes BIT-IDENTICAL
  * to the one-shot append gate over the same split — the claim that lets
  * the gate share q_s_ivf_append's oracle replay.
  */
class StreamIngestIvfSpec extends SparkSpec {

  test("stream-ingested index probes bit-identical to one-shot append") {
    val byName = graft.queries.SimilarityCatalog.all
      .map(q => q.name -> q).toMap
    val streamed = byName("q_s_ivf_stream_ingest").query(spark, sfCorrect)
    assert(streamed.columns.contains("multi_batch"))
    assert(streamed.select("multi_batch").collect().forall(_.getBoolean(0)),
      "ingest did not flow through >=2 micro-batches")
    val sRows = streamed.drop("multi_batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq
    val aRows = byName("q_s_ivf_append").query(spark, sfCorrect)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq
    assert(sRows.nonEmpty, "streamed probe returned nothing")
    assert(sRows == aRows,
      s"streamed index diverged from one-shot append:\n$sRows\nvs\n$aRows")
  }
}
