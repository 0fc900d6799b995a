package graft

import graft.queries.{JoinCatalog, SimilarityCatalog, TextCatalog}

/** Plan-shape audits for the round-11 distributed operators: the small
  * sides that must broadcast do broadcast, the chunker stays a
  * narrow-fanout scan, and the JL audit lands near its expectation
  * semantically (distortion ≈ 1).
  */
class Round11PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_s_jl_distortion broadcasts the 512-row sign table") {
    val p = plan(SimilarityCatalog.sJlProject.query(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"sign join must broadcast, got:\n${p.take(2000)}")
  }

  test("q_j_bloom_fpr broadcasts the m-bounded bit table") {
    val p = plan(JoinCatalog.jBloomFpr.query(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"bit-table probe must be a broadcast hash join, got:\n${p.take(2000)}")
  }

  test("JL distortion is near 1 (the projection actually preserves distance)") {
    val row = SimilarityCatalog.sJlProject.query(spark, sf).collect()(0)
    val distortion = row.getAs[Double]("distortion")
    assert(row.getAs[Long]("n_pairs") > 0)
    assert(distortion > 0.3 && distortion < 3.0,
      s"distortion $distortion violates the JL expectation band")
  }

  test("chunker: every token lands in 1..2 chunks, boundaries exact") {
    // W=50, S=40: positions 0..39 → 1 chunk, 40..49 → 2 chunks (0 and 1)
    val out = TextCatalog.tChunkOverlap.query(spark, sf).collect()
    assert(out.nonEmpty)
    // cross-field invariant: chunk-tokens ≥ distinct positions summed
    out.foreach { r =>
      assert(r.getAs[Long]("n_chunk_tokens") >= r.getAs[Long]("n_chunks"))
    }
  }
}
