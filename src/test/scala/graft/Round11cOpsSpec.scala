package graft

import graft.queries.{DedupCatalog, MiningCatalog, SimilarityCatalog, TextCatalog}

/** Semantic invariants for the round-11 late-batch operators, beyond
  * their oracle gates: the LSH index must actually SHRINK the candidate
  * set while recalling a nontrivial share of the brute-force truth, the
  * ROUGE-L fold must respect the LCS bounds, RANSAC's consensus can
  * never exceed the series length, and survivorship must keep exactly
  * one doc per cluster (so keeps + drops reconcile with q_d_components'
  * cluster count).
  */
class Round11cOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_s_lsh_recall: bucketing shrinks work and still recalls") {
    val row = SimilarityCatalog.sLshRecall.query(spark, sf).collect()(0)
    val nq = row.getAs[Long]("n_queries")
    val nCand = row.getAs[Long]("n_cand")
    val recall = row.getAs[Double]("recall")
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    // the whole point of LSH: candidates well under the brute-force
    // nq × (corpus − 1) pair count
    assert(nCand < nq * (corpus - 1) / 2,
      s"LSH candidates $nCand do not undercut brute ${nq * (corpus - 1)}")
    assert(recall > 0.0 && recall <= 1.0, s"recall $recall out of range")
    // the signature join must broadcast the 2048-row sign table
    val plan = SimilarityCatalog.sLshRecall.query(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"sign table must broadcast:\n${plan.take(2000)}")
  }

  test("q_t_rouge: LCS bounds hold on every pair") {
    TextCatalog.tRouge.query(spark, sf).collect().foreach { r =>
      val (na, nb, lcs) = (r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Long]("lcs"))
      assert(lcs >= 0 && lcs <= math.min(na, nb),
        s"LCS $lcs violates 0 ≤ lcs ≤ min($na, $nb)")
      val f1 = r.getAs[Double]("rouge_f1")
      assert(f1 >= 0.0 && f1 <= 1.0, s"F1 $f1 out of [0,1]")
    }
  }

  test("q_m36_ransac: consensus bounded by the series, best wins ties") {
    val rows = MiningCatalog.m36Ransac.query(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, in) = (r.getAs[Long]("n_days"), r.getAs[Long]("n_inliers"))
      assert(in >= 2 && in <= n,
        s"inliers $in outside [2, $n] — the 2 sample points always fit")
    }
  }

  test("q_d_survivorship: keeps reconcile with the cluster structure") {
    val rows = DedupCatalog.dSurvivorship.query(spark, sf).collect()
    val totKeep = rows.map(_.getAs[Long]("n_keep")).sum
    val totDocs = rows.map(_.getAs[Long]("n_docs")).sum
    // one keeper per component: total keeps == number of distinct
    // components over all docs (singletons are their own component)
    val comps = DedupCatalog.dComponents.query(spark, sf)
      .select("component").distinct().count()
    assert(totKeep == comps,
      s"keeps $totKeep != distinct components $comps")
    assert(totKeep <= totDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("chars_keep") <= r.getAs[Long]("chars_total"))
    }
  }
}
