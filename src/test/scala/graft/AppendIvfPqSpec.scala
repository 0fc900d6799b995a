package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.{IvfIndex, IvfPqIndex}

/** IVF-PQ index append (q_s_ivfpq_append): the gate's oracle proves
  * append ≡ frozen-parts rebuild over the whole ranking; this spec pins
  * the lifecycle claims the hash can't isolate:
  *   - an appended vector is immediately FINDABLE: a query equal to it
  *     returns it at rank 1 with the top exact cosine;
  *   - the raw side table grows by exactly the batch;
  *   - compaction of the fragmented cells leaves probe results
  *     bit-identical (physical layout only).
  */
class AppendIvfPqSpec extends SparkSpec {

  test("appended vectors are findable and compaction is logically inert") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
    val isDelta = pmod(col("vec_id"), lit(10)) === 7
    val stage = Files.createTempDirectory("graft_ivfpq_append_spec")
    try {
      IvfPqIndex.write(e.filter(!isDelta), "vec_id", "embedding",
        nCells = 8, dim = 64, m = 8, k = 16, stage.toString)
      def rawCount() = graft.sources.ManifestedPartitions.readLatest(
        spark, stage.toString, "raw", "rb").count()
      val rawBefore = rawCount()
      val delta = e.filter(isDelta).localCheckpoint(true)
      IvfPqIndex.append(spark, stage.toString, delta,
        "vec_id", "embedding")
      val rawAfter = rawCount()
      assert(rawAfter - rawBefore == delta.count(),
        "raw side table did not grow by the batch")

      // findability: probe with a fresh query id carrying an APPENDED
      // vector's exact embedding — the appended id must come back first
      // (identical vectors ⇒ cosine 1, the maximum; ties can't displace
      // it below any non-identical vector)
      val probeVec = delta.orderBy("vec_id").limit(1)
        .select(col("vec_id"), col("embedding")).collect()(0)
      val target = probeVec.getLong(0)
      val q = delta.filter(col("vec_id") === target)
        .select(lit(-1L).as("vec_id"), col("embedding"))
      val hits = IvfPqIndex.probe(spark, stage.toString, q,
          "vec_id", "embedding", k = 3, nProbe = 2, refine = 16)
        .orderBy("rank").collect()
      assert(hits.nonEmpty, "probe for an appended vector returned nothing")
      assert(hits(0).getLong(2) == target,
        s"rank-1 hit ${hits(0)} is not the appended vector $target")

      // compaction: rewrite the fragmented cells, probe bit-identical
      def run() = IvfPqIndex.probe(spark, stage.toString,
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 4, nProbe = 2, refine = 16)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq
      val pre = run()
      val compacted = IvfPqIndex.compact(spark, stage.toString)
      assert(compacted > 0, "append left no fragmented partitions")
      assert(run() == pre, "compaction changed probe results")
    } finally IvfIndex.deleteDir(stage.toString)
  }
}
