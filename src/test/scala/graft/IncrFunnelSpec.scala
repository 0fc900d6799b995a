package graft

/** Incremental-funnel gate (q_pipeline_incr_e2e): beyond the oracle hash,
  * pin that the equality is NOT vacuous — every planted delta class is
  * actually dropped at its stage (strictly decreasing stage counts), and
  * the incremental view equals the full recompute at every stage.
  */
class IncrFunnelSpec extends SparkSpec {

  private def run(sf: String): Unit = {
    val rows = graft.queries.DedupCatalog.dPipelineIncr
      .query(spark, sf).collect().sortBy(_.getAs[Int]("stage_ord"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("input", "exact_dedup", "quality_gate", "repetition_gate"))
    assert(rows.forall(_.getAs[Boolean]("consistent")),
      "incremental view diverged from the full recompute")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_full") == r.getAs[Long]("n_docs_inc"))
      assert(r.getAs[Long]("n_tokens_full") == r.getAs[Long]("n_tokens_inc"))
    }
    val n = rows.map(_.getAs[Long]("n_docs_full"))
    assert(n(0) > n(1), s"exact-dedup dropped nothing: ${n.toSeq} — " +
      "planted copies/twins missing")
    assert(n(1) > n(2), s"quality gate dropped nothing: ${n.toSeq} — " +
      "planted stopword spam missing")
    assert(n(2) > n(3), s"repetition gate dropped nothing: ${n.toSeq} — " +
      "planted single-token spam missing")
  }

  test("q_pipeline_incr_e2e: inc == full at every stage, all planted " +
    "classes dropped (sf0.001)") { run(sfSmoke) }

  test("q_pipeline_incr_e2e: inc == full at every stage, all planted " +
    "classes dropped (sf0.01)") { run(sfCorrect) }
}
