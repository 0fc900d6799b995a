package graft

import org.apache.spark.sql.functions._

import graft.queries.{MiningCatalog, MiscCatalog, SimilarityCatalog,
  SketchCatalog}

/** Invariant + plan-shape audits for the round-11 report operators:
  * unpivot is lossless, the histogram-sketch quantile estimate stays
  * inside its bin, centroid cosines are valid cosines, the lift table is
  * a proper partition whose weighted lift is exactly 1, and conformal
  * coverage lands at the nominal 1−α on held-out data. kthSmallest is
  * checked against a literal sort.
  */
class ReportOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("kthSmallest equals the literal sorted k-th element") {
    val sp = spark
    import sp.implicits._
    val vals = Seq(5.0, 1.0, 3.0, 3.0, 9.0, 2.0, 7.0, 3.0, 8.0, 0.5)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    for (k <- Seq(1, 3, 5, 10)) {
      val got = graft.analytics.ExactQuantiles.kthSmallest(
        df, "v", k.toLong, buckets = 4, cutoff = 2)
      assert(got == sorted(k - 1), s"rank $k: got $got want ${sorted(k - 1)}")
    }
  }

  test("q_unpivot: 3 rows per flag, values equal the wide aggregate") {
    val out = MiscCatalog.qUnpivot.query(spark, sf).collect()
    val flags = out.map(_.getAs[String]("l_returnflag")).distinct
    assert(out.length == flags.length * 3)
    // melt is lossless: each (flag, measure) appears exactly once
    assert(out.map(r => (r.getString(0), r.getString(1))).distinct.length
      == out.length)
    assert(out.forall(!_.isNullAt(2)))
  }

  test("q_sk_hist_quantile: estimate stays within one bin width of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val g = li.agg(min(col("l_extendedprice")), max(col("l_extendedprice")))
      .first()
    val width = (g.getDouble(1) - g.getDouble(0)) / 64.0
    val out = SketchCatalog.skHistQuantile.query(spark, sf).collect()
    assert(out.length == 3)
    out.foreach { r =>
      // exact rank-k element lies in the bin the estimator interpolated
      // inside, so the error is bounded by the bin width (+ rounding slop)
      assert(r.getAs[Double]("abs_err") <= width + 0.01,
        s"q=${r.getAs[Double]("q")} err ${r.getAs[Double]("abs_err")} " +
          s"exceeds bin width $width")
    }
  }

  test("q_s_centroid_cos: 45 label pairs, every value a valid cosine") {
    val out = SimilarityCatalog.sCentroidCos.query(spark, sf).collect()
    assert(out.length == 45, s"expected C(10,2)=45 pairs, got ${out.length}")
    out.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cos $c out of range")
    }
  }

  test("q_s_centroid_cos broadcasts the bounded centroid side") {
    val p = SimilarityCatalog.sCentroidCos.query(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"centroid pair join must broadcast, got:\n${p.take(2000)}")
  }

  test("q_m31_lift: deciles partition the orders and weighted lift is 1") {
    val out = MiningCatalog.m31Lift.query(spark, sf).collect()
    assert(out.length == 10)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val total = orders.count()
    val pos = orders.filter(col("o_orderstatus") === "F").count()
    assert(out.map(_.getAs[Long]("n_orders")).sum == total)
    assert(out.map(_.getAs[Long]("n_pos")).sum == pos)
    // cumulative gain ends at exactly 1 (all responders captured)
    assert(out.last.getAs[Double]("cum_gain") == 1.0)
    // Σ decile_share · lift = 1 by construction
    val w = out.map(r =>
      r.getAs[Long]("n_orders").toDouble / total * r.getAs[Double]("lift"))
      .sum
    assert(math.abs(w - 1.0) < 1e-3, s"weighted lift $w != 1")
  }

  test("q_m32_conformal: coverage lands at the nominal 90%") {
    val row = MiningCatalog.m32Conformal.query(spark, sf).collect()(0)
    val cov = row.getAs[Double]("coverage")
    // split conformal: coverage ≈ 1−α up to O(1/√n_cal) fluctuation
    assert(cov >= 0.85 && cov <= 0.97, s"coverage $cov far from 0.9")
    assert(row.getAs[Long]("n_train") > 0 && row.getAs[Long]("n_cal") > 0
      && row.getAs[Long]("n_test") > 0)
    assert(row.getAs[Double]("qhat") > 0.0)
  }
}
