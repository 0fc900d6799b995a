package graft

/** RocksDB state-store gate (q_e_rocksdb_stream): beyond the oracle hash,
  * pin that (1) the RocksDB provider ACTUALLY held the state — the
  * `rocksdb_state` column is computed from the checkpoint's state dir
  * containing `<version>.zip` snapshots, which the default HDFS-backed
  * store never writes — and (2) correctness is provider-independent: the
  * drained results equal the same pipeline run under the default store
  * (q_pipeline_stream_e2e) row for row.
  */
class RocksdbStateSpec extends SparkSpec {

  test("q_e_rocksdb_stream: RocksDB provider held the state and results " +
    "match the default-store pipeline") {
    val rocks = graft.queries.EventsCatalog.eRocksdbStream
      .query(spark, sfSmoke).collect()
    assert(rocks.nonEmpty, "drained sink is empty")
    assert(rocks.forall(_.getAs[Boolean]("rocksdb_state")),
      "no RocksDB snapshot zips in the checkpoint — default store ran")
    // after the gate, the session conf must be back to the default store
    assert(!spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")),
      "gate leaked the RocksDB provider conf into the session")

    val default = graft.queries.EventsCatalog.ePipelineStream
      .query(spark, sfSmoke).collect()
      .map(r => (r.getAs[Long]("hour_us"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n_active")).toMap
    assert(rocks.length == default.size,
      "row cardinality differs between state-store providers")
    rocks.foreach { r =>
      val k = (r.getAs[Long]("hour_us"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_active") == default(k),
        s"provider-dependent result at $k")
    }
  }
}
