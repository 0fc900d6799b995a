package graft.mining

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.StockWindows

/** M3 (reference: datamining_analysis.py:105-120): K-Means over per-ticker
  * (mean day-over-day return, mean volume), standardized with population
  * stddev, k=3.
  *
  * Two paths:
  *  - `cluster`: spark.ml KMeans (seeded) — the scale path; at many groups
  *    this is the right distributed algorithm.
  *  - `clusterExact`: global-optimum partition by total within-cluster SSE,
  *    enumerated on the driver — only for tiny point counts (the reference
  *    has 6 tickers; sklearn's k-means++ ×10 restarts finds this optimum).
  *    Labels are assigned in first-appearance order and are comparable only
  *    up to renaming (golden test checks partition equality).
  */
object KMeansStocks {

  /** A9 feature build (datamining_analysis.py:107-108) + W9 scaling. */
  def features(df: DataFrame): DataFrame = {
    val feats = StockWindows.withDoDReturn(df)
      .groupBy("Ticker")
      .agg(avg("DoDReturn").as("Return"), avg("Volume").as("Volume"))
    Scaling.standardize(feats, Seq("Return", "Volume"))
  }

  def cluster(df: DataFrame, k: Int = 3, seed: Long = 42L): DataFrame = {
    val feats = features(df)
    val assembled = new VectorAssembler()
      .setInputCols(Array("Return_z", "Volume_z")).setOutputCol("fv")
      .transform(feats)
    val fitted = new KMeans().setK(k).setSeed(seed).setFeaturesCol("fv")
      .setPredictionCol("Cluster").fit(assembled)
    fitted.transform(assembled)
      .select("Ticker", "Return", "Volume", "Cluster")
      .orderBy("Ticker")
  }

  /** Exact optimal k-partition by SSE for tiny n (driver-side). */
  def clusterExact(df: DataFrame, k: Int = 3): Seq[(String, Double, Double, Int)] = {
    val pts = features(df)
      .select("Ticker", "Return", "Volume", "Return_z", "Volume_z")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        Array(r.getDouble(3), r.getDouble(4))))
      .sortBy(_._1)
    val n = pts.length
    require(n <= 15, s"clusterExact is for tiny n, got $n — use cluster()")
    // enumerate assignments of n points to k labels (canonical: first
    // appearance order), keep the SSE-minimal one with no empty cluster
    var best: Array[Int] = null
    var bestSse = Double.MaxValue
    val assign = new Array[Int](n)
    def sseOf(): Double = {
      var total = 0.0
      for (c <- 0 until k) {
        val members = (0 until n).filter(assign(_) == c)
        if (members.nonEmpty) {
          val dim = pts(0)._4.length
          val mean = Array.ofDim[Double](dim)
          members.foreach(m => for (d <- 0 until dim) mean(d) += pts(m)._4(d))
          for (d <- 0 until dim) mean(d) /= members.length
          members.foreach(m => for (d <- 0 until dim) {
            val diff = pts(m)._4(d) - mean(d); total += diff * diff
          })
        }
      }
      total
    }
    def rec(i: Int, maxUsed: Int): Unit = {
      if (i == n) {
        if (maxUsed + 1 == k) {
          val s = sseOf()
          if (s < bestSse) { bestSse = s; best = assign.clone() }
        }
      } else {
        for (c <- 0 to math.min(maxUsed + 1, k - 1)) {
          assign(i) = c
          rec(i + 1, math.max(maxUsed, c))
        }
      }
    }
    rec(0, -1)
    pts.indices.map(i => (pts(i)._1, pts(i)._2, pts(i)._3, best(i))).toSeq
  }
}
