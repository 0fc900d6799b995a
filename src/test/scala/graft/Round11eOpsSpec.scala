package graft

import org.apache.spark.sql.functions.{call_function, col, levenshtein, lit}

import graft.functions.StringDistance
import graft.queries.{DedupCatalog, EventsCatalog, FinanceCatalog,
  MiningCatalog, MiscCatalog, MultimodalCatalog, TextCatalog}

/** Semantic invariants for the round-11 engagement/eval/fuzzy batch,
  * beyond the oracle gates: the Damerau kernel's textbook values and its
  * dominance relations vs Levenshtein, churn/retention conservation
  * identities, the power-curve partitioning all weekly actives, PRF
  * metric ranges and their confusion-cell identities, Mood's-test cell
  * conservation, boxplot quartile ordering, and Omega's gain/loss
  * decomposition.
  */
class Round11eOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("damerau kernel: textbook values, never exceeds levenshtein") {
    def d(a: String, b: String): Int = StringDistance.damerau(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(d("", "") == 0)
    assert(d("", "abc") == 3 && d("abc", "") == 3)
    assert(d("abc", "abc") == 0)
    assert(d("ab", "ba") == 1) // one transposition (levenshtein: 2)
    assert(d("CA", "ABC") == 2) // UNRESTRICTED DL; OSA would give 3
    assert(d("kitten", "sitting") == 3) // no transpositions: == levenshtein
    assert(d("smtih", "smith") == 1)
    assert(d("abcdef", "badcfe") == 3) // three disjoint transpositions
    // expression registration + dominance over part names
    StringDistance.register(spark)
    val viol = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_name").as("a"),
        org.apache.spark.sql.functions.reverse(col("p_name")).as("b"))
      .select(call_function("graft_damerau", col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
      .where(col("dl") > col("lev") || col("dl") < lit(0))
      .count()
    assert(viol == 0, s"$viol rows where DL exceeds levenshtein")
  }

  test("q_e_churn: actives = retained + new; churned come from last week") {
    val rows = EventsCatalog.eChurn.query(spark, sf).collect()
    assert(rows.nonEmpty)
    var prevActives = -1L
    rows.foreach { r =>
      val (act, ret, nw, ch) = (r.getAs[Long]("actives"),
        r.getAs[Long]("retained"), r.getAs[Long]("new_users"),
        r.getAs[Long]("churned"))
      assert(act == ret + nw, s"actives $act != retained $ret + new $nw")
      if (prevActives >= 0)
        assert(ret + ch == prevActives,
          s"retained $ret + churned $ch != last week's actives $prevActives")
      prevActives = act
    }
  }

  test("q_e_powercurve: histogram partitions each week's actives") {
    val pc = EventsCatalog.ePowercurve.query(spark, sf).collect()
      .groupBy(_.getAs[Long]("wk_us"))
      .view.mapValues(_.map(_.getAs[Long]("n_users")).sum).toMap
    val churnActives = EventsCatalog.eChurn.query(spark, sf).collect()
      .filter(_.getAs[Long]("actives") > 0)
      .map(r => r.getAs[Long]("wk_us") -> r.getAs[Long]("actives")).toMap
    assert(pc == churnActives,
      s"power-curve user totals $pc != weekly actives $churnActives")
  }

  test("q_m48_prf: ranges, F1 harmonic identity, cells partition the table") {
    val rows = MiningCatalog.m48Prf.query(spark, sf).collect()
    assert(rows.length == 3)
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    rows.foreach { r =>
      val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn"))
      assert(tp + fp + fn + tn == total)
      val (p, rec, f1) = (r.getAs[Double]("precision"),
        r.getAs[Double]("recall"), r.getAs[Double]("f1"))
      Seq(p, rec, f1, r.getAs[Double]("accuracy")).foreach(v =>
        assert(v >= 0.0 && v <= 1.0, s"metric $v out of [0,1]"))
      assert(math.abs(r.getAs[Double]("mcc")) <= 1.0 + 1e-12)
      // F1 = harmonic mean of P and R (both nonzero here); r6 rounding
      // on each side bounds the drift
      assert(math.abs(f1 - 2 * p * rec / (p + rec)) < 1e-4,
        s"F1 $f1 != harmonic($p, $rec)")
    }
  }

  test("q_m49_mood: cells conserve rows; chi2 parts nonnegative") {
    val rows = MiningCatalog.m49Mood.query(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_above") + r.getAs[Long]("n_le") ==
        r.getAs[Long]("n"))
      assert(r.getAs[Double]("chi2_part") >= 0.0)
      assert(r.getAs[Double]("exp_above") >= 0.0)
    }
  }

  test("q_a29_boxplot: five numbers are ordered and inside the range") {
    MiscCatalog.qBoxplot.query(spark, sf).collect().foreach { r =>
      val (mn, q1, md, q3, mx) = (r.getAs[Long]("min_cents"),
        r.getAs[Long]("q1_cents"), r.getAs[Long]("med_cents"),
        r.getAs[Long]("q3_cents"), r.getAs[Long]("max_cents"))
      assert(mn <= q1 && q1 <= md && md <= q3 && q3 <= mx,
        s"five-number summary out of order: $mn $q1 $md $q3 $mx")
    }
  }

  test("q_f_omega: one-sided sums nonnegative, omega consistent") {
    FinanceCatalog.omega.query(spark, sf).collect().foreach { r =>
      val (g, l, o) = (r.getAs[Double]("gain_sum"),
        r.getAs[Double]("loss_sum"), r.getAs[Double]("omega"))
      assert(g >= 0.0 && l >= 0.0)
      assert(math.abs(o - g / l) < 1e-4, s"omega $o != $g / $l")
    }
  }

  test("q_m50_levene: row conservation, nonnegative sums of squares") {
    val r = MiningCatalog.m50Levene.query(spark, sf).collect()(0)
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(r.getAs[Long]("n") == total)
    assert(r.getAs[Double]("ssb") >= 0.0, "between-group SS negative")
    assert(r.getAs[Double]("ssw") > 0.0, "within-group SS not positive")
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("q_g_closeness: tree is connected, metrics consistent") {
    val nNodes = spark.read.parquet(s"$sf/customer.parquet").count()
    val rows = MiscCatalog.qCloseness.query(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (nr, sd, ecc) = (r.getAs[Long]("n_reached"),
        r.getAs[Long]("sum_dist"), r.getAs[Long]("eccentricity"))
      assert(nr == nNodes - 1, s"BFS reached $nr of ${nNodes - 1}")
      assert(ecc <= sd && ecc >= 1)
      assert(sd >= nr, "sum of distances below one hop per node")
      val cl = r.getAs[Double]("closeness")
      assert(cl > 0.0 && cl <= 1.0)
      assert(r.getAs[Double]("harmonic") <= nr.toDouble)
    }
  }

  test("q_a30_lorenz: partition of customers, convex cumulative share") {
    val rows = MiscCatalog.qLorenz.query(spark, sf).collect()
      .sortBy(_.getAs[Long]("bin"))
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_cust")).sum == nCust)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
      "cumulative share not monotone")
    assert(math.abs(cums.last - 1.0) < 1e-6)
    // deciles are ordered by revenue → per-customer mean revenue rises
    val means = rows.map(r =>
      r.getAs[Long]("rev_cents").toDouble / r.getAs[Long]("n_cust"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      "mean revenue per decile not monotone — binning broke the order")
  }

  test("q_m51_logrank: counting-process consistency") {
    val r = MiningCatalog.m51Logrank.query(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_times") >= 1 && r.getAs[Long]("n_times") <= 366)
    assert(r.getAs[Long]("o1") >= 0)
    assert(r.getAs[Double]("e1") > 0.0)
    assert(r.getAs[Double]("v") > 0.0)
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("q_m52_somersd: range, sign agreement, tau_b geometric mean") {
    val sd = MiningCatalog.m52SomersD.query(spark, sf).collect()
    val tb = MiningCatalog.m15Kendall.query(spark, sf).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("tau_b")).toMap
    sd.foreach { r =>
      val (dyx, dxy) = (r.getAs[Double]("d_yx"), r.getAs[Double]("d_xy"))
      assert(math.abs(dyx) <= 1.0 && math.abs(dxy) <= 1.0)
      val tau = tb(r.getAs[String]("g"))
      assert(dyx.sign == dxy.sign && (tau == 0.0 || tau.sign == dyx.sign))
      // tau_b² = d_yx · d_xy (both share numerator C−D); r6 bounds drift
      assert(math.abs(tau * tau - dyx * dxy) < 1e-4,
        s"tau_b² ${tau * tau} != d_yx·d_xy ${dyx * dxy}")
    }
  }

  test("q_e_ltv: cohorts complete at week 0, cumulative monotone") {
    val rows = EventsCatalog.eLtv.query(spark, sf).collect()
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_us"))
    byCohort.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("wk_idx"))
      assert(sorted.head.getAs[Long]("wk_idx") == 0L,
        "cohort's first activity week is its own definition — must exist")
      assert(sorted.head.getAs[Long]("n_active") ==
        sorted.head.getAs[Long]("cohort_size"),
        "every cohort member is active in week 0 by construction")
      val cums = sorted.map(_.getAs[Long]("cum_cents"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      sorted.foreach(r => assert(r.getAs[Long]("n_active") <=
        r.getAs[Long]("cohort_size")))
    }
  }

  test("q_t_gopher: counters bounded, clean+flag accounting consistent") {
    val r = TextCatalog.tGopher.query(spark, sf).collect()(0)
    val nDocs = r.getAs[Long]("n_docs")
    assert(nDocs == spark.read.parquet(s"$sf/documents.parquet").count())
    val flags = Seq("n_short", "n_long", "n_wordlen", "n_nostop", "n_repeat")
      .map(r.getAs[Long])
    flags.foreach(f => assert(f >= 0 && f <= nDocs))
    val clean = r.getAs[Long]("n_clean")
    assert(clean <= nDocs && nDocs - clean <= flags.sum,
      "dirty docs exceed the union bound of individual rules")
  }

  test("q_f_amihud: nonnegative, volume conserved") {
    val rows = FinanceCatalog.amihud.query(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("amihud_e12") >= 0.0)
      assert(r.getAs[Long]("sum_vol_cents") > 0)
    }
  }

  test("q_a31_pareto: crossing point dominates 80%, consistent with lorenz") {
    val r = MiscCatalog.qPareto.query(spark, sf).collect()(0)
    val (n, n80) = (r.getAs[Long]("n_customers"), r.getAs[Long]("n80"))
    assert(n80 >= 1 && n80 <= n)
    assert(r.getAs[Double]("share_at_crossing") >= 0.8)
    assert(r.getAs[Double]("pct_customers") > 0.0 &&
      r.getAs[Double]("pct_customers") <= 1.0)
    val lorenzTotal = MiscCatalog.qLorenz.query(spark, sf).collect()
      .map(_.getAs[Long]("rev_cents")).sum
    assert(lorenzTotal == r.getAs[Long]("total_cents"),
      "lorenz and pareto disagree on total revenue")
  }

  test("q_s_kcenter: greedy farthest-point picks distinct, radius shrinks") {
    val rows = graft.queries.SimilarityCatalog.sKcenter.query(spark, sf)
      .collect().sortBy(_.getAs[Long]("sel_order"))
    assert(rows.length == 5)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 5 && !ids.contains(0L))
    val dists = rows.map(_.getAs[Double]("dist"))
    dists.foreach(d => assert(d >= 0.0 && d <= 2.0 + 1e-9))
    // each pick's min-dist to the selected set can only shrink as the
    // set grows (r6 rounding bounds the slack)
    assert(dists.zip(dists.tail).forall { case (a, b) => b <= a + 1e-6 },
      s"selection radius not non-increasing: ${dists.toSeq}")
  }

  test("q_a32_theil: both indices nonnegative (Jensen)") {
    val r = MiscCatalog.qTheil.query(spark, sf).collect()(0)
    assert(r.getAs[Double]("theil_t") >= 0.0)
    assert(r.getAs[Double]("theil_l") >= 0.0)
    assert(r.getAs[Long]("n_customers") > 0)
  }

  test("q_f_parkinson: variance nonnegative, vol consistent") {
    FinanceCatalog.parkinson.query(spark, sf).collect().foreach { r =>
      val (v, s2) = (r.getAs[Double]("parkinson_vol"),
        r.getAs[Double]("parkinson_var"))
      assert(s2 >= 0.0 && v >= 0.0)
      assert(math.abs(v * v - s2) < 1e-4, s"vol² $v² != var $s2")
    }
  }

  test("q_mm_laplacian: interior geometry exact, bounds hold") {
    MultimodalCatalog.mmLaplacian.query(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_interior") == 39L * 30L)
      assert(r.getAs[Long]("n_strong") <= r.getAs[Long]("n_interior"))
      val sharp = r.getAs[Double]("sharpness")
      assert(sharp >= 0.0 &&
        math.abs(sharp - r.getAs[Long]("lap_sq_sum").toDouble /
          r.getAs[Long]("n_interior")) < 1e-4)
    }
  }

  test("q_mm_entropy: Shannon bound, contrast bound") {
    MultimodalCatalog.mmEntropy.query(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_pix") == 41L * 32L)
      val lv = r.getAs[Long]("n_levels")
      assert(lv >= 1 && lv <= 256)
      val e = r.getAs[Double]("entropy")
      assert(e >= 0.0 && e <= math.log(lv.toDouble) + 1e-9,
        s"entropy $e exceeds ln($lv)")
      val c = r.getAs[Double]("rms_contrast")
      assert(c >= 0.0 && c <= 128.0)
    }
  }

  test("q_t_ttr / q_p_ldiversity: ratio ranges") {
    TextCatalog.tTtr.query(spark, sf).collect().foreach { r =>
      Seq("avg_ttr", "avg_hapax").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v > 0.0 && v <= 1.0, s"$c $v out of (0,1]")
      }
    }
    val ld = MiscCatalog.qLdiversity.query(spark, sf).collect()(0)
    assert(ld.getAs[Long]("min_l") >= 1)
    assert(ld.getAs[Long]("rows_at_risk") <= ld.getAs[Long]("n_rows"))
  }
}
