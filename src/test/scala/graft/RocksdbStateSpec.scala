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

  test("q_e_rocksdb_changelog_stream: changelog files exist, restart " +
    "resumed, and results match the batch aggregate") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.EventsCatalog.eRocksdbChangelogStream
      .query(spark, sfSmoke).collect()
    assert(rows.nonEmpty, "drained sink is empty")
    assert(rows.forall(_.getAs[Boolean]("changelog_state")),
      "no .changelog files in the checkpoint — changelog mode did not run")
    assert(rows.forall(_.getAs[Boolean]("resumed")),
      "restarted query did not continue the checkpoint's batch numbering")
    // conf restoration: neither the provider nor the changelog flag leaks
    assert(!spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")),
      "gate leaked the RocksDB provider conf into the session")
    assert(!spark.conf
      .getOption("spark.sql.streaming.stateStore.rocksdb" +
        ".changelogCheckpointing.enabled").contains("true"),
      "gate leaked the changelog-checkpointing conf into the session")
    // exactly-once across the restart: equals the batch GROUP BY
    val want = graft.queries.QueryDef.events(spark, sfSmoke)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        graft.queries.QueryDef.sumE(col("value")).as("total"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    assert(rows.length == want.size, "per-type cardinality differs")
    rows.foreach { r =>
      val (n, tot) = want(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n && r.getAs[Double]("total") == tot,
        s"restart lost or replayed rows for ${r.getAs[String]("event_type")}")
    }
  }
}
