package graft

import org.apache.spark.sql.functions._

/** Checkpoint-restart gate (q_e_restart_stream) semantics beyond the
  * oracle hash: the drained aggregate equals the batch GROUP BY exactly
  * once (no replay, no loss across the stop/restart), and the `resumed`
  * flag — which is derived from the restarted run's first data batchId —
  * is TRUE, i.e. the second query object genuinely continued the
  * checkpoint's batch numbering instead of starting fresh.
  */
class StreamRestartSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_e_restart_stream: exactly-once across a checkpoint restart") {
    val rows = graft.queries.EventsCatalog.eRestartStream
      .query(spark, sf).collect()
    assert(rows.nonEmpty, "drained sink is empty")
    assert(rows.forall(_.getAs[Boolean]("resumed")),
      "restarted query did not resume from the checkpoint (batchId 0)")

    val want = graft.queries.QueryDef.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("total"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    assert(rows.length == want.size, "event_type cardinality differs")
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val (n, total) = want(et)
      assert(r.getAs[Long]("n") == n,
        s"$et count ${r.getAs[Long]("n")} != batch $n (replay or loss)")
      assert(math.abs(r.getAs[Double]("total") - total) < 1e-9,
        s"$et sum drifted: ${r.getAs[Double]("total")} vs $total")
    }
  }

  test("q_e_restart_window_stream: watermarked append windows emit " +
    "exactly once across the restart") {
    val rows = graft.queries.EventsCatalog.eRestartWindowStream
      .query(spark, sf).collect()
    assert(rows.nonEmpty, "no windows emitted")
    assert(rows.forall(_.getAs[Boolean]("emitted_once")),
      "a window emitted in both phases (state replay) or twice in one")
    assert(rows.forall(_.getAs[Boolean]("resumed")),
      "restarted query did not resume from the checkpoint")
    // totals equal the batch per-hour per-type counts — no loss at the
    // phase boundary, no late-drop from the time-quartile staging
    val want = graft.queries.QueryDef.events(spark, sf)
      .groupBy(date_format(timestamp_micros(col("ts")), "yyyy-MM-dd HH")
        .as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("hour"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n")).toMap
    assert(rows.length == want.size, "window cardinality differs from batch")
    rows.foreach { r =>
      val k = (r.getAs[String]("hour"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == want(k), s"window $k count differs")
    }
  }

  test("q_e_rocksdb_restart_stream: exactly-once recovery from RocksDB " +
    "snapshots across a checkpoint restart") {
    val rows = graft.queries.EventsCatalog.eRocksdbRestartStream
      .query(spark, sf).collect()
    assert(rows.nonEmpty, "drained sink is empty")
    assert(rows.forall(_.getAs[Boolean]("resumed")),
      "restarted query did not resume from the checkpoint")
    assert(rows.forall(_.getAs[Boolean]("rocksdb_state")),
      "no RocksDB snapshot zips in the checkpoint — default store ran")
    val want = graft.queries.QueryDef.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("total"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    assert(rows.length == want.size, "event_type cardinality differs")
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val (n, total) = want(et)
      assert(r.getAs[Long]("n") == n,
        s"$et count ${r.getAs[Long]("n")} != batch $n (replay or loss)")
      assert(math.abs(r.getAs[Double]("total") - total) < 1e-9,
        s"$et sum drifted after RocksDB recovery")
    }
  }

  test("q_e_restart_reshuffle_stream: exactly-once across a restart with " +
    "a CHANGED shuffle-partitions conf and a late-arriving file") {
    val rows = graft.queries.EventsCatalog.eRestartReshuffleStream
      .query(spark, sf).collect()
    assert(rows.nonEmpty, "no windows emitted")
    assert(rows.forall(_.getAs[Boolean]("emitted_once")),
      "a window emitted twice across the reconfigured restart")
    assert(rows.forall(_.getAs[Boolean]("resumed")),
      "restarted query did not resume from the checkpoint")
    // phase 2 ran with spark.sql.shuffle.partitions = 5, but the state
    // store must rehydrate the CHECKPOINTED 8-partition layout
    assert(rows.forall(_.getAs[Long]("state_parts") == 8L),
      s"restart honored the new conf instead of the checkpointed layout: " +
        s"state_parts = ${rows.head.getAs[Long]("state_parts")}")
    // totals equal the batch per-hour per-type counts over ALL events —
    // the late slice landed after the restart was absorbed, not dropped
    val want = graft.queries.QueryDef.events(spark, sf)
      .groupBy(date_format(timestamp_micros(col("ts")), "yyyy-MM-dd HH")
        .as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("hour"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n")).toMap
    assert(rows.length == want.size, "window cardinality differs from batch")
    rows.foreach { r =>
      val k = (r.getAs[String]("hour"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == want(k),
        s"window $k count differs (late rows lost or replayed)")
    }
  }
}
