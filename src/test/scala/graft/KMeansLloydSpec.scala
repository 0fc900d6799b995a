package graft

import org.apache.spark.sql.functions._

import graft.queries.MiscCatalog

/** Lloyd-invariant properties for the K-Means fit behind `q_m3_kmeans`.
  *
  * The DuckDB oracle replays the feature pipeline and the nearest-center
  * assignment from the dumped centers, so the Lloyd iterations themselves
  * are the one computation no cross-engine check covers. These properties
  * pin them:
  *
  *  1. Fixed point: each fitted center equals the mean of the points
  *     assigned to it. Exact only at full convergence — spark.ml stops when
  *     center movement < tol (1e-4 default), so the assertion uses a bound
  *     one order above that, far below the inter-center distances (~O(1)
  *     in z-space).
  *  2. WSS (within-cluster sum of squares) recomputed from the assignments
  *     matches the model's own trainingCost.
  *  3. Refitting with the same seed cannot increase WSS (determinism makes
  *     it equal; the assertion allows only fp noise).
  */
class KMeansLloydSpec extends SparkSpec {

  private lazy val assembled = MiscCatalog.kmeansAssembled(spark, sfCorrect)

  test("fitted centers are the Lloyd fixed point (center = assigned mean)") {
    val model = MiscCatalog.kmeansFit(assembled)
    val centers = model.clusterCenters
    val means = model.transform(assembled)
      .groupBy("Cluster")
      .agg(avg("Return_z").as("mr"), avg("Volume_z").as("mv"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(means.size == centers.length, "every cluster must be non-empty")
    centers.zipWithIndex.foreach { case (c, i) =>
      val (mr, mv, n) = means(i)
      assert(n > 0)
      assert(math.abs(c(0) - mr) < 1e-3,
        s"center $i dim0: ${c(0)} vs assigned mean $mr")
      assert(math.abs(c(1) - mv) < 1e-3,
        s"center $i dim1: ${c(1)} vs assigned mean $mv")
    }
  }

  test("WSS from assignments matches trainingCost; refit cannot increase it") {
    val m1 = MiscCatalog.kmeansFit(assembled)
    val bc = spark.sparkContext.broadcast(m1.clusterCenters)
    val wssCol = m1.transform(assembled)
      .select(col("Return_z"), col("Volume_z"), col("Cluster"))
      .collect() // ≤ |customers| rows at sf0.01 — bounded by the op's charter
      .map { r =>
        val c = bc.value(r.getInt(2))
        val d0 = r.getDouble(0) - c(0); val d1 = r.getDouble(1) - c(1)
        d0 * d0 + d1 * d1
      }.sum
    val cost1 = m1.summary.trainingCost
    assert(math.abs(wssCol - cost1) <= 1e-6 * math.max(1.0, cost1),
      s"recomputed WSS $wssCol vs trainingCost $cost1")
    val cost2 = MiscCatalog.kmeansFit(assembled).summary.trainingCost
    assert(cost2 <= cost1 + 1e-9 * math.max(1.0, cost1),
      s"refit with same seed increased WSS: $cost1 -> $cost2")
  }
}
