package graft

import graft.queries.{MiningCatalog, MiscCatalog, MultimodalCatalog,
  TextCatalog}

/** Invariant audits for the round-11 drift/cluster/retrieval/signal
  * operators: PSI terms are nonnegative by construction, grid-DBSCAN
  * converges (frontier = 0) and accounts for every core point, RRF ranks
  * are consistent and recomputable from the member ranks, and the DFT
  * energy table has the full one-sided bin set with equal frame counts.
  */
class DriftClusterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q_a28_psi: one row per priority, psi >= 0 and finite") {
    val out = MiscCatalog.qPsi.query(spark, sf).collect()
    assert(out.length == 5, s"expected 5 priorities, got ${out.length}")
    out.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= 0.0 && !psi.isNaN && !psi.isInfinite,
        s"PSI must be a nonnegative sum of (a-e)ln(a/e) terms, got $psi")
      assert(r.getAs[Long]("n_exp") > 0 && r.getAs[Long]("n_act") > 0)
    }
  }

  test("q_m33_dbscan: converged components covering the dense cells") {
    val out = MiningCatalog.m33Dbscan.query(spark, sf).collect()
    assert(out.nonEmpty, "sf0.01 gaussian cloud must yield core cells")
    // frontier = 0 proves min-label propagation ran to convergence
    out.foreach(r => assert(r.getAs[Long]("frontier") == 0L))
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val pts = out.map(_.getAs[Long]("n_pts")).sum
    assert(pts <= total && pts > 0)
    out.foreach(r => assert(r.getAs[Long]("n_cells") >= 1))
  }

  test("q_t_rrf: consecutive ranks, monotone scores, recomputable fusion") {
    val out = TextCatalog.tRrf.query(spark, sf).collect()
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    val scores = out.map(_.getAs[Double]("rrf"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "fused scores must be non-increasing in rank")
    out.foreach { r =>
      val expect =
        (Option(r.getAs[java.lang.Long]("r_lex"))
          .map(v => 1.0 / (60.0 + v.toDouble)).getOrElse(0.0)
         + Option(r.getAs[java.lang.Long]("r_sem"))
          .map(v => 1.0 / (60.0 + v.toDouble)).getOrElse(0.0))
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-5,
        s"rrf ${r.getAs[Double]("rrf")} != recomputed $expect")
      assert(!r.isNullAt(r.fieldIndex("r_lex"))
        || !r.isNullAt(r.fieldIndex("r_sem")),
        "a fused doc must appear in at least one ranker's list")
    }
  }

  test("q_s_mmr: 5 distinct picks, first is the most relevant candidate") {
    val out = graft.queries.SimilarityCatalog.sMmr.query(spark, sf).collect()
    assert(out.map(_.getAs[Long]("pick")).toSeq == (1L to 5L))
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == 5, "picks must be distinct")
    // pick 1 is pure relevance: no later pick may have higher rel
    val rels = out.sortBy(_.getAs[Long]("pick")).map(_.getAs[Double]("rel"))
    assert(rels.head >= rels.tail.max,
      s"first pick rel ${rels.head} not maximal among ${rels.toSeq}")
  }

  test("q_m34_chow: slopes match covar/var fits, F nonnegative") {
    import org.apache.spark.sql.functions.{col, covar_samp, var_samp,
      year => yr}
    val out = MiningCatalog.m34Chow.query(spark, sf).collect()
    assert(out.length == 3)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    out.foreach { r =>
      val flag = r.getAs[String]("flag")
      def fit(pre: Boolean): Double = {
        val base = li.filter(col("l_returnflag") === flag)
          .filter(if (pre) yr(col("l_shipdate")) < 1997
            else yr(col("l_shipdate")) >= 1997)
        base.agg(covar_samp(col("l_extendedprice"), col("l_quantity"))
            / var_samp(col("l_quantity"))).first().getDouble(0)
      }
      assert(math.abs(r.getAs[Double]("slope_a") - fit(pre = true)) < 1e-4)
      assert(math.abs(r.getAs[Double]("slope_b") - fit(pre = false)) < 1e-4)
      // pooled SSR >= split SSRs by least-squares optimality
      assert(r.getAs[Double]("f_chow") >= 0.0)
    }
  }

  test("q_mm_dft_energy: full one-sided bin set, equal frames, energy >= 0") {
    val out = MultimodalCatalog.mmDftEnergy.query(spark, sf).collect()
    val byFlag = out.groupBy(_.getAs[String]("flag"))
    assert(byFlag.nonEmpty)
    byFlag.foreach { case (flag, rows) =>
      assert(rows.map(_.getAs[Long]("k")).sorted.toSeq == (0L to 8L),
        s"flag $flag missing DFT bins")
      assert(rows.map(_.getAs[Long]("n_frames")).distinct.length == 1,
        s"flag $flag frame counts differ across bins")
      rows.foreach(r => assert(r.getAs[Double]("avg_energy") >= 0.0))
    }
  }
}
