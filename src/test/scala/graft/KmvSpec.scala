package graft

import org.apache.spark.sql.functions._

import graft.sketches.Kmv

/** KMV sketch properties: the mergeability the salted two-stage selection
  * relies on, estimator sanity against the exact count, and the exact-count
  * degenerate path for groups smaller than k.
  */
class KmvSpec extends SparkSpec {

  private lazy val orders =
    spark.read.parquet(s"$sfCorrect/orders.parquet").cache()

  test("bottom-k of a union equals bottom-k of merged per-part bottom-ks") {
    val k = 64
    val a = orders.filter(col("o_orderkey") % 2 === 0)
    val b = orders.filter(col("o_orderkey") % 2 =!= 0)
    val whole = Kmv.bottomK(orders, Seq("o_orderpriority"),
      col("o_custkey"), k)
    // merge = union the two part-sketches, re-select bottom-k (distinct
    // first: a key can appear in both parts and must collapse to one hash)
    val merged = Kmv.selectBottomK(
      Kmv.bottomK(a, Seq("o_orderpriority"), col("o_custkey"), k)
        .unionByName(
          Kmv.bottomK(b, Seq("o_orderpriority"), col("o_custkey"), k))
        .distinct(),
      Seq("o_orderpriority"), k)
    assertSameData(merged, whole, Seq("o_orderpriority", "h"))
  }

  test("estimate lands within 4 standard errors of the exact count") {
    val k = 256
    val est = Kmv.estimate(
      Kmv.bottomK(orders, Seq("o_orderpriority"), col("o_custkey"), k),
      Seq("o_orderpriority"), k)
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact"))
    val rows = est.join(exact, "o_orderpriority").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Double]("kmv_est")
      val x = r.getAs[Long]("exact").toDouble
      // KMV rse ≈ 1/sqrt(k−2); groups smaller than k are exact
      val rse = 1.0 / math.sqrt(k - 2.0)
      assert(math.abs(e - x) <= 4 * rse * x + 1e-9,
        s"${r.get(0)}: est $e vs exact $x beyond 4·rse")
    }
  }

  test("a group smaller than k reports its exact distinct count") {
    val k = 1 << 20
    val est = Kmv.estimate(
      Kmv.bottomK(orders, Seq("o_orderpriority"), col("o_custkey"), k),
      Seq("o_orderpriority"), k)
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact"))
    est.join(exact, "o_orderpriority").collect().foreach { r =>
      assert(r.getAs[Double]("kmv_est") == r.getAs[Long]("exact").toDouble)
    }
  }
}
