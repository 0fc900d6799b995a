package graft

import org.apache.spark.sql.functions._

/** Property checks for the round-9 operator family, beyond the DuckDB
  * hash gates: statistical identities (normal equations), estimator
  * sanity vs exact answers, streaming/batch agreement, determinism.
  */
class Round9OpsSpec extends SparkSpec {

  private def q(name: String, dir: String = sfSmoke) =
    SparkEntry.queries(name)(spark, dir)

  test("q_f_ar2 coefficients satisfy the normal equations " +
      "(residuals orthogonal to both lagged regressors)") {
    val sp = spark
    import sp.implicits._
    val fit = q("q_f_ar2", sfCorrect)
      .select("l_returnflag", "phi1", "phi2", "intercept")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // rebuild the lagged daily-close series independently via SQL
    spark.read.parquet(s"$sfCorrect/lineitem.parquet")
      .createOrReplaceTempView("li_ar2")
    val rows = spark.sql("""
      WITH r AS (
        SELECT l_returnflag AS g, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY l_shipdate DESC, l_orderkey DESC,
                   l_linenumber DESC) AS rn
        FROM li_ar2),
      cl AS (SELECT g, day, l_extendedprice AS y FROM r WHERE rn = 1),
      l AS (
        SELECT g, y,
               lag(y, 1) OVER (PARTITION BY g ORDER BY day) AS x1,
               lag(y, 2) OVER (PARTITION BY g ORDER BY day) AS x2
        FROM cl)
      SELECT g, y, x1, x2 FROM l WHERE x2 IS NOT NULL""")
      .as[(String, Double, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (g, pts) =>
      val (p1, p2, a) = fit(g)
      val res = pts.map { case (_, y, x1, x2) => (y - a - p1 * x1 - p2 * x2, x1, x2) }
      val scale = pts.map { case (_, y, _, _) => y * y }.sum
      // normal equations: Σe·x1 = Σe·x2 = Σe = 0 (up to the r6 rounding
      // of the published coefficients, which perturbs at ~1e-6·Σ|x|·|x1|)
      val e1 = res.map { case (e, x1, _) => e * x1 }.sum
      val e2 = res.map { case (e, _, x2) => e * x2 }.sum
      assert(math.abs(e1) / scale < 1e-4, s"$g: Σe·x1 = $e1 (scale $scale)")
      assert(math.abs(e2) / scale < 1e-4, s"$g: Σe·x2 = $e2 (scale $scale)")
    }
  }

  test("q_m19_bootstrap CI brackets the point estimate with 32 replicas") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_m19_bootstrap", sfCorrect)
      .select("n_replicas", "point_mean", "ci_lo", "ci_hi")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, pm, lo, hi) =>
      assert(b == 32L)
      assert(lo <= hi, s"CI inverted: [$lo, $hi]")
      assert(lo <= pm && pm <= hi,
        s"point $pm outside bootstrap CI [$lo, $hi]")
      // Poisson-bootstrap noise for a ~60k-row mean is far under 1%
      assert((hi - lo) / pm < 0.05, s"CI implausibly wide: [$lo, $hi]")
    }
  }

  test("q_kmv_jaccard estimates land near the exact Jaccard") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_kmv_jaccard", sfCorrect)
      .select("kmv_jaccard", "exact_jaccard", "kmv_intersect",
        "exact_intersect")
      .as[(Double, Double, Double, Long)].collect()
    assert(rows.length > 0)
    rows.foreach { case (kj, ej, ki, ei) =>
      // k = 256 → se(ρ̂) ≈ √(ρ(1−ρ)/k) ≤ 0.031; allow 5 se
      assert(math.abs(kj - ej) < 0.16, s"jaccard est $kj vs exact $ej")
      if (ei > 50)
        assert(math.abs(ki - ei) / ei < 0.5, s"intersect est $ki vs $ei")
    }
  }

  test("q_g_labelprop is deterministic and sizes stay within node count") {
    val a = q("q_g_labelprop", sfSmoke).collect()
    val b = q("q_g_labelprop", sfSmoke).collect()
    assert(a.toSeq == b.toSeq, "label propagation is not deterministic")
    assert(a.nonEmpty)
  }

  test("streaming funnel equals the batch funnel") {
    val batch = q("q_e_funnel", sfSmoke).collect().head
    val stream = q("q_e_funnel_stream", sfSmoke).collect().head
    assert(batch.toSeq == stream.toSeq,
      s"batch ${batch.toSeq} != stream ${stream.toSeq}")
  }

  test("streaming CUSUM emits a monitor line per post-burn-in day with " +
      "binary alarms") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_e_cusum_stream", sfSmoke)
      .select("event_type", "day_id", "s_pos", "s_neg", "alarm")
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, sPos, sNeg, alarm) =>
      assert(sPos >= 0.0 && sNeg >= 0.0)
      assert(alarm == 0L || alarm == 1L)
    }
    // per type: days are consecutive and unique (one line per day)
    rows.groupBy(_._1).foreach { case (tp, ds) =>
      val days = ds.map(_._2).sorted
      assert(days.distinct.length == days.length, s"$tp: duplicate days")
      assert(days.last - days.head + 1 == days.length,
        s"$tp: non-consecutive monitor days")
    }
  }
}
