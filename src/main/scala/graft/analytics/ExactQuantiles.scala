package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT quantiles without a global sort — iterative histogram bisection
  * (the classic distributed selection algorithm: Blum et al.'s selection
  * problem under the MapReduce lens; same family as TDigest/GK but exact).
  *
  * Why not `orderBy(col).limit(rank)` at 100 TB: a total sort shuffles the
  * full column, and `percentile_approx` trades away exactness. Bisection
  * instead runs log_B(n/cutoff) full scans, each producing ONE bounded
  * B-row histogram (map-side combined), then sorts only the final ≤cutoff
  * candidate slice. Each scan filters to the current [lo, hi] value range,
  * so parquet min/max pruning kicks in on later passes.
  *
  * Determinism: the answer is an actual element of the data (the rank-th
  * smallest, rank = floor(q·(n−1)) + 1 — the lower discrete quantile).
  * Bucket boundaries are floats, but bucketing is monotone (equal values →
  * equal bucket) and the refinement range is the chosen bucket's actual
  * data min/max, so FP rounding can shift bucket WIDTHS but never the
  * selected element. Any engine agrees on the value bit-for-bit.
  */
object ExactQuantiles {

  /** Exact discrete quantiles of `valueCol`: one (q, value) row per
    * requested quantile. Driver work is bounded: one `buckets`-row
    * histogram collect per pass (≤ log_B(n/cutoff) + 1 passes per
    * quantile) and one ≤`cutoff`-row top-k for the final slice.
    */
  def quantiles(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double],
      buckets: Int = 1024,
      cutoff: Long = 100000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val spark = df.sparkSession
    val v = col(valueCol)
    val base = df.filter(v.isNotNull).select(v.as("v"))
    val g = base.agg(count(lit(1)), min(col("v")).cast("double"),
      max(col("v")).cast("double")).first()
    val n = g.getLong(0)
    require(n > 0, "quantile of an empty input")
    val (gLo, gHi) = (g.getDouble(1), g.getDouble(2))

    val rows = qs.map { q =>
      val value = selectRank(base, math.floor(q * (n - 1)).toLong + 1,
        gLo, gHi, n, buckets, cutoff)
      (q, value)
    }
    import spark.implicits._
    rows.toDF("q", "value")
  }

  /** The exact rank-th smallest value (1-based) of `valueCol` — the
    * rank-parameterized entry point (conformal calibration wants
    * k = ⌈(1−α)(n+1)⌉, not a [0,1] quantile). Same bisection as
    * `quantiles`; driver work stays one bounded histogram per pass.
    */
  def kthSmallest(
      df: DataFrame,
      valueCol: String,
      rank: Long,
      buckets: Int = 1024,
      cutoff: Long = 100000): Double = {
    val v = col(valueCol)
    val base = df.filter(v.isNotNull).select(v.cast("double").as("v"))
    val g = base.agg(count(lit(1)), min(col("v")).cast("double"),
      max(col("v")).cast("double")).first()
    val n = g.getLong(0)
    require(n > 0 && rank >= 1 && rank <= n,
      s"rank $rank out of range for $n rows")
    selectRank(base, rank, g.getDouble(1), g.getDouble(2), n, buckets, cutoff)
  }

  /** The rank-th smallest value (1-based) among rows of `base` ("v"). */
  private def selectRank(base: DataFrame, rank0: Long, lo0: Double,
      hi0: Double, n0: Long, buckets: Int, cutoff: Long): Double = {
    var (lo, hi, rank, cnt) = (lo0, hi0, rank0, n0)
    while (cnt > cutoff && lo < hi) {
      val w = (hi - lo) / buckets
      if (w == 0.0 || w.isInfinite || w.isNaN) return finish(base, lo, hi, rank)
      // monotone bucketing: equal values always land in the same bucket
      val bk = least(lit(buckets - 1),
        floor((col("v") - lit(lo)) / lit(w))).cast("int")
      val hist = base.filter(col("v") >= lo && col("v") <= hi)
        .groupBy(bk.as("bk"))
        .agg(count(lit(1)).as("c"), min("v").as("bmin"), max("v").as("bmax"))
        .orderBy("bk")
        .collect() // bounded: <= `buckets` rows
      var cum = 0L
      var i = 0
      while (i < hist.length && cum + hist(i).getAs[Long]("c") < rank) {
        cum += hist(i).getAs[Long]("c"); i += 1
      }
      val b = hist(i)
      rank -= cum
      cnt = b.getAs[Long]("c")
      lo = b.getAs[Double]("bmin")
      hi = b.getAs[Double]("bmax")
      if (lo == hi) return lo
    }
    finish(base, lo, hi, rank)
  }

  /** Exact selection on the final small slice: top-`rank` ascending is a
    * TakeOrdered (no full shuffle), its max is the rank-th smallest.
    */
  private def finish(base: DataFrame, lo: Double, hi: Double,
      rank: Long): Double =
    base.filter(col("v") >= lo && col("v") <= hi)
      .orderBy("v").limit(rank.toInt)
      .agg(max("v")).first().getDouble(0)
}
