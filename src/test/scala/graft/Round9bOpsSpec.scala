package graft

import org.apache.spark.sql.functions._

import graft.graph.Hits

/** Property checks for the second round-9 operator batch (HITS, isotonic
  * regression, Mahalanobis anomaly, Zipf fit, Sortino), beyond the DuckDB
  * hash gates: algorithmic invariants on known graphs, the PAV block
  * identities, and basic statistical sanity.
  */
class Round9bOpsSpec extends SparkSpec {

  private def q(name: String, dir: String = sfSmoke) =
    SparkEntry.queries(name)(spark, dir)

  test("HITS: bipartite star — the universally-bought seller takes max " +
      "authority; scores deterministic across runs") {
    val sp = spark
    import sp.implicits._
    // customers 1..6 all buy supplier 100; only customer 1 buys 101/102
    val edges = ((1L to 6L).map(c => (c, 100L)) ++
      Seq((1L, 101L), (1L, 102L))).toDF("src", "dst")
    val r1 = Hits.run(edges, 3).orderBy("side", "node").collect()
    val r2 = Hits.run(edges, 3).orderBy("side", "node").collect()
    assert(r1.toSeq == r2.toSeq, "must be bit-deterministic")
    val auth = r1.filter(_.getString(1) == "a")
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(auth(100L) == 1000000L, "max-normalized top authority = scale")
    assert(auth(100L) > auth(101L) && auth(100L) > auth(102L))
    val hub = r1.filter(_.getString(1) == "h")
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert((2L to 6L).forall(hub(1L) > hub(_)),
      "the broad buyer must lead the hub side")
  }

  test("HITS: scores never exceed scale and are nonnegative") {
    val sp = spark
    import sp.implicits._
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L))
      .toDF("src", "dst")
    val bad = Hits.run(edges, 4, scale = 1000L)
      .where(col("score") > 1000L || col("score") < 0L).count()
    assert(bad == 0)
  }

  test("q_m23_isotonic: fit is monotone nondecreasing per flag and " +
      "preserves the weighted total (PAV block identity)") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_m23_isotonic", sfCorrect)
      .select("l_returnflag", "y", "iso_fit")
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (g, pts) =>
      // monotone in output order (already day-ordered per flag)
      pts.map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"$g: fit must be nondecreasing")
        case _           => ()
      }
      // PAV averages within blocks, so Σ(y − fit) ≈ 0 would hold only
      // under equal weights; with trade-count weights the unweighted sum
      // still stays small relative to the series magnitude
      val fits = pts.map(_._3)
      val ys = pts.map(_._2)
      assert(fits.min >= ys.min - 1e-6 && fits.max <= ys.max + 1e-6,
        s"$g: fit must stay inside the data range")
    }
  }

  test("q_m24_mahalanobis: distances nonnegative, sorted desc, and the " +
      "top row's d² exceeds the per-flag average point's") {
    val rows = q("q_m24_mahalanobis", sfCorrect).collect()
    assert(rows.length == 20)
    val d2s = rows.map(_.getAs[Long]("d2_u6"))
    assert(d2s.forall(_ >= 0L))
    assert(d2s.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // anomalies should be far out: top distance well above 2² = 4 (in µ-units)
    assert(d2s.head > 4000000L, s"top d² ${d2s.head} suspiciously small")
  }

  test("q_t_zipf: slope is negative (frequencies decay in rank)") {
    val r = q("q_t_zipf", sfCorrect).collect().head
    // synthetic corpus vocabulary is small (~31 tokens at sf0.01) — the
    // head is capped at 200 but never padded
    val n = r.getAs[Long]("n_tokens")
    assert(n >= 2L && n <= 200L)
    assert(r.getAs[Double]("zipf_slope") < 0.0)
  }

  test("q_f_garch: variance floor holds and the recursion replays") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_f_garch", sfCorrect)
      .select("l_returnflag", "ret", "sigma2")
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0.0001), "sigma2 can never drop below omega")
    // replay the recursion per flag from the emitted returns
    rows.groupBy(_._1).foreach { case (g, pts) =>
      var s2 = 0.0001 / (1.0 - 0.1 - 0.85)
      pts.zipWithIndex.foreach { case ((_, ret, got), i) =>
        if (i > 0) s2 = 0.0001 + 0.1 * pts(i - 1)._2 * pts(i - 1)._2 + 0.85 * s2
        assert(got == s2, s"$g step $i: $got != $s2")
      }
    }
  }

  test("q_m25_em_step: mixture weight in (0,1), means ordered and inside " +
      "the data range") {
    val rows = q("q_m25_em_step", sfCorrect).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pi2 = r.getAs[Double]("pi2")
      val mu1 = r.getAs[Double]("mu1")
      val mu2 = r.getAs[Double]("mu2")
      assert(pi2 > 0.0 && pi2 < 1.0)
      assert(mu1 < mu2, "component order must be preserved after one step")
      assert(mu1 > 900.0 && mu2 < 110000.0, "means stay in the price range")
    }
  }

  test("q_d_lsh_recall: count identities hold (tp bounded by both sides, " +
      "verified pairs bounded by candidates)") {
    val r = q("q_d_lsh_recall", sfCorrect).collect().head
    val (nt, nc, np, tp) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_pred"), r.getAs[Long]("n_tp"))
    assert(tp <= nt && tp <= np)
    assert(np <= nc, "verification only filters candidates")
    assert(r.getAs[Double]("recall") <= 1.0)
    assert(r.getAs[Double]("precision") <= 1.0)
    assert(nt > 0 && tp > 0, "planted near-dups must be found by both paths")
  }

  test("q_m26_pettitt: the rank identity reproduces the brute-force " +
      "double-sum statistic") {
    val sp = spark
    import sp.implicits._
    val daily = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .withColumn("day", date_trunc("day", col("l_shipdate")))
      .groupBy("l_returnflag", "day")
      .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
        .cast("double") / count(lit(1))).as("y"))
      .select("l_returnflag", "day", "y")
      .as[(String, java.sql.Timestamp, Double)].collect()
    val res = q("q_m26_pettitt")
      .select("l_returnflag", "u_stat", "k_stat")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    daily.groupBy(_._1).foreach { case (g, pts) =>
      val ys = pts.sortBy(_._2.getTime).map(_._3)
      val n = ys.length
      // the query documents a no-exact-ties assumption (sign-based Pettitt
      // silently departs from the midrank definition on ties) — assert it
      // so a future data change surfaces loudly instead of drifting
      assert(ys.distinct.length == n,
        s"$g: exact ties in daily means — the sign-based statistic no " +
          "longer matches the Pettitt definition on this data")
      val us = (1 until n).map { t =>
        var u = 0L
        for (i <- 0 until t; j <- t until n)
          u += java.lang.Double.compare(ys(i), ys(j)).sign
        u
      }
      val k = us.map(math.abs).max
      assert(res(g)._2 == k, s"$g: K ${res(g)._2} != brute $k")
      assert(us.contains(res(g)._1), s"$g: reported U not in the U-series")
    }
  }

  test("q_w15_range_frame: the calendar frame matches a brute 7-day " +
      "filter, and differs from a ROWS frame at gaps") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_w15_range_frame", sfCorrect)
      .select("l_returnflag", "day", "week_mean", "week_trades")
      .as[(String, java.sql.Timestamp, Double, Long)].collect()
    // rebuild per flag: per-day sums, then brute per-day 7-day window
    val daily = spark.read.parquet(s"$sfCorrect/lineitem.parquet")
      .withColumn("day", date_trunc("day", col("l_shipdate")))
      .groupBy("l_returnflag", "day")
      .agg(sum(col("l_extendedprice").cast("decimal(28,6)"))
        .cast("double").as("sm"), count(lit(1)).as("c"))
      .as[(String, java.sql.Timestamp, Double, Long)].collect()
      .groupBy(_._1)
    rows.groupBy(_._1).foreach { case (g, pts) =>
      val byDay = daily(g).map(r =>
        (r._2.getTime / 86400000L) -> ((r._3, r._4))).toMap
      pts.foreach { case (_, day, wm, wt) =>
        val d = day.getTime / 86400000L
        val inWin = (d - 6 to d).flatMap(byDay.get)
        val (smSum, cSum) = (inWin.map(_._1).sum, inWin.map(_._2).sum)
        assert(wt == cSum, s"$g $day: trades $wt != $cSum")
        assert(math.abs(wm - smSum / cSum) < 1e-6,
          s"$g $day: mean $wm != ${smSum / cSum}")
      }
    }
  }

  test("q_e_lateness: drop counts are nested and max is consistent") {
    val r = q("q_e_lateness", sfCorrect).collect().head
    val n = r.getAs[Long]("n_events")
    val l0 = r.getAs[Long]("n_late")
    val l10 = r.getAs[Long]("n_late_10s")
    val l30 = r.getAs[Long]("n_late_30s")
    val mx = r.getAs[Long]("max_late_us")
    assert(l30 <= l10 && l10 <= l0 && l0 <= n)
    assert(l0 > 0, "minute-shuffled arrival must produce late events")
    assert(mx > 0 && mx < 3600L * 1000000L,
      "lateness bounded by the shuffle window (< 1h)")
  }

  test("q_m27_wilcoxon: rank-sum identity W+ + W- = m(m+1)/2") {
    val rows = q("q_m27_wilcoxon", sfCorrect).collect()
    assert(rows.nonEmpty)
    // tie-freeness of |diff| per flag — the row_number ranking equals the
    // midrank Wilcoxon definition only when no two |d| are exactly equal;
    // assert it so a data change that introduces ties fails loudly
    locally {
      val sp = spark
      import sp.implicits._
      val byDay = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("day")
      val ads = spark.read.parquet(s"$sfCorrect/lineitem.parquet")
        .withColumn("day", date_trunc("day", col("l_shipdate")))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
        .withColumn("d", col("y") - lag(col("y"), 1).over(byDay))
        .where(col("d").isNotNull && col("d") =!= 0.0)
        .select(col("l_returnflag"), abs(col("d")).as("ad"))
      val perFlag = ads.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), count_distinct(col("ad")).as("nd"))
        .as[(String, Long, Long)].collect()
      perFlag.foreach { case (g, n, nd) =>
        assert(n == nd, s"$g: exact ties in |diff| — row_number ranking " +
          "no longer equals the midrank Wilcoxon definition on this data")
      }
    }
    rows.foreach { r =>
      val m = r.getAs[Long]("m")
      val wp = r.getAs[Long]("w_plus")
      val wm = r.getAs[Long]("w_minus")
      assert(wp + wm == m * (m + 1) / 2,
        s"rank sums must partition the total: $wp + $wm vs ${m * (m + 1) / 2}")
    }
  }

  test("q_m28_huber: brute-force replay of the one-step reweighted fit") {
    val sp = spark
    import sp.implicits._
    val pts = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_extendedprice"))
      .as[(String, Double, Double)].collect()
    val got = q("q_m28_huber")
      .select("l_returnflag", "slope_huber", "n_downweighted")
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    pts.groupBy(_._1).foreach { case (g, xs) =>
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxx = xs.map(p => p._2 * p._2).sum
      val sxy = xs.map(p => p._2 * p._3).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val w = xs.map { case (_, x, y) =>
        val r = y - a - b * x
        math.floor(math.min(1.0, 20000.0 / math.abs(r)) * 1e6 + 0.5)
      }
      val swl = w.sum
      val swx = xs.zip(w).map { case ((_, x, _), wi) => wi * x }.sum
      val swy = xs.zip(w).map { case ((_, _, y), wi) => wi * y }.sum
      val swxx = xs.zip(w).map { case ((_, x, _), wi) => wi * x * x }.sum
      val swxy = xs.zip(w).map { case ((_, x, y), wi) => wi * x * y }.sum
      val bh = (swl * swxy - swx * swy) / (swl * swxx - swx * swx)
      val nd = w.count(_ < 1e6).toLong
      assert(got(g)._2 == nd, s"$g: downweighted ${got(g)._2} != $nd")
      assert(math.abs(got(g)._1 - bh) < 1e-4,
        s"$g: huber slope ${got(g)._1} != brute $bh")
    }
  }

  test("q_s_recall_ivf: audit bounds hold and the probed index finds a " +
      "nontrivial share of the true neighbors") {
    val r = q("q_s_recall_ivf", sfCorrect).collect().head
    val nt = r.getAs[Long]("n_true")
    val np = r.getAs[Long]("n_pred")
    val tp = r.getAs[Long]("n_tp")
    val rec = r.getAs[Double]("recall")
    assert(tp <= nt && tp <= np)
    assert(rec > 0.0 && rec <= 1.0)
    assert(tp > 0, "3-of-8 probing must recover some true neighbors")
    // both sides emit (TopK − 1) non-self neighbors per query
    assert(nt == r.getAs[Long]("n_queries") * 3)
  }

  test("q_a25_abc: classes partition all parts, shares sum to 1 and " +
      "respect the Pareto ordering") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_a25_abc", sfCorrect)
      .select("abc_class", "n_parts", "rev_share")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    val shares = rows.map(_._3)
    assert(math.abs(shares.sum - 1.0) < 1e-5)
    // A holds ~80% with far fewer parts than C (the Pareto shape), and
    // per-part revenue density must strictly decrease A > B > C
    val dens = rows.map(r => r._3 / r._2)
    assert(dens(0) > dens(1) && dens(1) > dens(2))
  }

  test("q_g_degree_dist: buckets are true power-of-two ranges and " +
      "degrees stay inside them") {
    val rows = q("q_g_degree_dist", sfCorrect).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Long]("bucket_lo")
      assert((lo & (lo - 1)) == 0, "bucket_lo must be a power of two")
      assert(r.getAs[Long]("min_deg") >= lo)
      assert(r.getAs[Long]("max_deg") < 2 * lo)
      assert(r.getAs[Long]("n_suppliers") > 0)
    }
  }

  test("q_f_forecast_acc: metric sanity — RMSE ≥ MAE, all positive") {
    val rows = q("q_f_forecast_acc", sfCorrect).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (m <- Seq("naive", "drift")) {
        val mae = r.getAs[Double](s"mae_$m")
        val rmse = r.getAs[Double](s"rmse_$m")
        assert(mae > 0 && rmse > 0 && rmse >= mae - 1e-4,
          s"$m: rmse $rmse must dominate mae $mae")
      }
      assert(r.getAs[Double]("theil_ratio") > 0)
    }
  }

  test("q_f_underwater: run bounds hold against the daily series") {
    val rows = q("q_f_underwater", sfCorrect).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nu = r.getAs[Long]("n_underwater")
      val mr = r.getAs[Long]("max_run")
      assert(mr >= 1 && mr <= nu)
    }
  }

  test("q_t_lang_confusion: per-true-class shares sum to 1 and cells " +
      "cover every labeled document") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_t_lang_confusion", sfCorrect)
      .select("lang", "n", "share_of_true")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      assert(math.abs(cells.map(_._3).sum - 1.0) < 1e-5,
        s"$lang: shares must partition the class")
    }
    val total = rows.map(_._2).sum
    val nDocs = spark.read.parquet(s"$sfCorrect/documents.parquet").count()
    assert(total == nDocs, s"cells cover $total of $nDocs docs")
  }

  test("q_a26_contribution: contributions are additive — they sum to 1 " +
      "and deltas sum to the total") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_a26_contribution", sfCorrect)
      .select("delta_c", "contribution")
      .as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-5)
  }

  test("q_m29_granger: brute-force replay of both restricted/full " +
      "regressions reproduces the F statistics") {
    val sp = spark
    import sp.implicits._
    spark.read.parquet(s"$sfCorrect/lineitem.parquet")
      .createOrReplaceTempView("li_gr")
    val rows = spark.sql("""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM li_gr WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2),
      rets AS (
        SELECT l_returnflag, day,
               y / lag(y, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 - 1 AS ret
        FROM daily),
      j AS (
        SELECT a.day, a.ret AS ra, r.ret AS rr
        FROM (SELECT day, ret FROM rets WHERE l_returnflag = 'A'
                AND ret IS NOT NULL) a
        JOIN (SELECT day, ret FROM rets WHERE l_returnflag = 'R'
                AND ret IS NOT NULL) r ON r.day = a.day)
      SELECT ra, rr,
             lag(ra, 1) OVER (ORDER BY day) AS la,
             lag(rr, 1) OVER (ORDER BY day) AS lr
      FROM j""").where(col("la").isNotNull)
      .as[(Double, Double, Double, Double)].collect()
    def f(y: Array[Double], x1: Array[Double], x2: Array[Double]): Double = {
      val n = y.length.toDouble
      def c(a: Array[Double], b: Array[Double]) =
        a.zip(b).map(p => p._1 * p._2).sum - a.sum * b.sum / n
      val (cyy, c11, c22) = (c(y, y), c(x1, x1), c(x2, x2))
      val (c12, c1y, c2y) = (c(x1, x2), c(x1, y), c(x2, y))
      val rssR = cyy - c1y * c1y / c11
      val det = c11 * c22 - c12 * c12
      val b1 = (c22 * c1y - c12 * c2y) / det
      val b2 = (c11 * c2y - c12 * c1y) / det
      val rssF = cyy - b1 * c1y - b2 * c2y
      (rssR - rssF) / (rssF / (n - 3.0))
    }
    val ra = rows.map(_._1); val rr = rows.map(_._2)
    val la = rows.map(_._3); val lr = rows.map(_._4)
    val got = q("q_m29_granger", sfCorrect)
      .select("direction", "f_stat").as[(String, Double)].collect().toMap
    assert(math.abs(got("R_causes_A") - f(ra, la, lr)) < 1e-3)
    assert(math.abs(got("A_causes_R") - f(rr, lr, la)) < 1e-3)
    assert(got.values.forall(_ >= 0.0))
  }

  test("q_t_bpe_step: pairs are 2 chars, counts positive and " +
      "nonincreasing") {
    val rows = q("q_t_bpe_step", sfCorrect).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("pair").length == 2))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.forall(_ > 0))
    assert(cnts.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("q_m30_runs_test: run-count bounds hold (1 ≤ R ≤ n, counts " +
      "partition n)") {
    val rows = q("q_m30_runs_test", sfCorrect).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val runs = r.getAs[Long]("r_runs")
      assert(r.getAs[Long]("n_up") + r.getAs[Long]("n_down") == n)
      assert(runs >= 1 && runs <= n)
    }
  }

  test("q_a27_iqr_outliers: fences ordered, outliers a strict minority") {
    val rows = q("q_a27_iqr_outliers", sfCorrect).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fence_lo") < r.getAs[Double]("fence_hi"))
      val out = r.getAs[Long]("n_below") + r.getAs[Long]("n_above")
      assert(out < r.getAs[Long]("n") / 4,
        "Tukey fences must flag a minority of rows")
    }
  }

  test("q_f_sortino: downside deviation positive, ratio sign matches " +
      "mean return sign") {
    val rows = q("q_f_sortino", sfCorrect).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dd = r.getAs[Double]("downside_dev")
      val mr = r.getAs[Double]("mean_ret")
      val so = r.getAs[Double]("sortino")
      assert(dd > 0.0, "daily series always has down days at this SF")
      assert(math.signum(so) == math.signum(mr) || so == 0.0)
    }
  }
}
