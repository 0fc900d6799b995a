package graft

import graft.queries.{FinanceCatalog, MiningCatalog, MiscCatalog,
  MultimodalCatalog, SimilarityCatalog}

/** Semantic invariants for the round-11 eval/privacy/video batch, beyond
  * the oracle gates: AUC/Gini consistency and full-population coverage,
  * the stump's nonnegative gain (convexity of Σ(pos²+neg²)/n), nDCG's
  * [0,1] range against its own ideal, the k-anonymity generalization
  * ladder's monotonicity, shot boundaries landing exactly on the
  * synthesized scene changes, modularity's range, and the min-variance
  * portfolio dominating both single-asset legs.
  */
class Round11dOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_m42_auc: range, Gini identity, full coverage") {
    val r = MiningCatalog.m42Auc.query(spark, sf).collect()(0)
    val (np, nn) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    val (auc, gini) = (r.getAs[Double]("auc"), r.getAs[Double]("gini"))
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(np + nn == total, s"histogram lost rows: $np + $nn != $total")
    assert(auc >= 0.0 && auc <= 1.0, s"AUC $auc out of range")
    assert(math.abs(gini - (2 * auc - 1)) < 1e-12,
      s"Gini $gini != 2·$auc − 1")
  }

  test("q_m43_stump: split partitions the table, gain nonnegative") {
    val r = MiningCatalog.m43Stump.query(spark, sf).collect()(0)
    val (nl, nr) = (r.getAs[Long]("n_left"), r.getAs[Long]("n_right"))
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(nl + nr == total, s"split lost rows: $nl + $nr != $total")
    assert(nl > 0 && nr > 0, "degenerate one-sided split survived filter")
    assert(r.getAs[Double]("gain") >= 0.0,
      "best-split gain negative — convexity violated")
    assert(r.getAs[Long]("pos_left") <= nl &&
      r.getAs[Long]("pos_right") <= nr)
  }

  test("q_s_ndcg: one row per query, ndcg within [0,1] of its ideal") {
    val rows = SimilarityCatalog.sNdcg.query(spark, sf).collect()
    val nq = spark.read.parquet(s"$sf/embeddings.parquet")
      .where("vec_id % 50 = 0").count()
    assert(rows.length == nq, s"${rows.length} rows for $nq queries")
    rows.foreach { r =>
      val nRel = r.getAs[Long]("n_rel")
      assert(nRel >= 0 && nRel <= 10)
      if (!r.isNullAt(r.fieldIndex("ndcg"))) {
        val ndcg = r.getAs[Double]("ndcg")
        assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12,
          s"ndcg $ndcg outside [0,1] — DCG exceeded its own ideal")
      } else assert(nRel == 0, "null ndcg but relevant docs retrieved")
    }
  }

  test("q_p_kanon: generalizing can only shrink the unsafe set") {
    val rows = MiscCatalog.qKanon.query(spark, sf).collect()
      .map(r => r.getAs[Long]("bal_granularity") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_groups"),
          r.getAs[Long]("n_unsafe_rows"))).toMap
    val (fine, coarse) = (rows(100L), rows(1000L))
    assert(fine._1 == coarse._1, "levels disagree on the population")
    assert(coarse._2 <= fine._2, "coarser buckets produced MORE groups")
    assert(coarse._3 <= fine._3,
      s"generalizing increased unsafe rows: ${fine._3} → ${coarse._3}")
  }

  test("q_src_merge_schema: the two schema versions tile the table") {
    val r = MiscCatalog.qMergeSchema.query(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_price") + r.getAs[Long]("n_priority") ==
      r.getAs[Long]("n_rows"),
      "mergeSchema NULL placement lost or duplicated rows")
  }

  test("q_mm_shots: cuts land exactly on the synthesized scene changes") {
    val rows = MultimodalCatalog.mmShots.query(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("media_id")).foreach { case (id, fs) =>
      assert(fs.length == 7, s"media $id: ${fs.length} frame pairs, not 7")
      fs.foreach { r =>
        val fi = r.getAs[Long]("frame_idx")
        val cut = r.getAs[Long]("is_cut")
        val expected = if (fi == 3 || fi == 6) 1L else 0L
        assert(cut == expected,
          s"media $id frame $fi: is_cut $cut, scene math says $expected " +
            s"(sad ${r.getAs[Long]("sad")})")
      }
      val lastShot = fs.maxBy(_.getAs[Long]("frame_idx"))
        .getAs[Long]("shot_id")
      assert(lastShot == 2, s"media $id ended in shot $lastShot, not 2")
    }
  }

  test("q_g_modularity: Q in range, intra arcs bounded") {
    val r = MiscCatalog.qModularity.query(spark, sf).collect()(0)
    val q = r.getAs[Double]("modularity")
    assert(q >= -1.0 && q <= 1.0, s"modularity $q out of range")
    assert(r.getAs[Long]("intra_arcs") <= 2 * r.getAs[Long]("n_edges"))
    assert(r.getAs[Long]("n_comm") <= r.getAs[Long]("n_nodes"))
  }

  test("q_f_minvar: weights sum to 1, portfolio dominates both legs") {
    val r = FinanceCatalog.minVar.query(spark, sf).collect()(0)
    val (wa, wr) = (r.getAs[Double]("w_a"), r.getAs[Double]("w_r"))
    assert(math.abs(wa + wr - 1.0) < 1e-9, s"weights $wa + $wr != 1")
    // at the unconstrained optimum the portfolio variance can never
    // exceed the better single leg (w∈{0,1} IS a feasible portfolio);
    // the rounded weight may give back at most rounding noise
    assert(r.getAs[Double]("var_reduction") >= -1e-6,
      "min-variance portfolio lost to a single leg")
  }

  test("q_j9_theta_bnlj: non-equi join plans as broadcast nested loop") {
    val df = graft.queries.JoinCatalog.jThetaBnlj.query(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"pure-inequality join must broadcast-nested-loop:\n${plan.take(1500)}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("gap") > 0))
  }

  test("q_m44_calibration: bins tile the population, Brier in range") {
    val rows = MiningCatalog.m44Calibration.query(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bin"); b >= 0 && b <= 9
    })
    val brier = rows.map(_.getAs[Double]("brier_part")).sum
    assert(brier >= 0.0 && brier <= 1.0, s"Brier $brier out of range")
    // rank-percentile predictions must be monotone across bins
    val preds = rows.sortBy(_.getAs[Long]("bin"))
      .map(_.getAs[Double]("mean_pred"))
    assert(preds.zip(preds.tail).forall { case (a, b) => a < b },
      s"mean_pred not increasing: ${preds.mkString(", ")}")
  }
}
