package graft.sketches

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable approximate quantiles by content-addressed Bernoulli
  * sampling — the quantile member of the sketch family next to
  * [[graft.sketches.Hll]] (distincts), the count-min top-k, and
  * [[graft.sketches.Kmv]]: a deterministic hash condition
  * `h(key) < p·2^60` (first 15 md5 hex digits, the repo's portable
  * uniform) admits each row independently of partitioning, ordering, or
  * engine, so the sample is a well-defined SET.
  *
  * Mergeability is set union: the sample of a union of splits IS the
  * union of the splits' samples (each row's admission depends only on
  * its own key), so per-partition / per-day samples compose exactly like
  * HLL register maxes — the property that makes the sketch a 100 TB
  * primitive (sample shards fold with zero coordination; a rolling
  * corpus keeps per-segment samples and re-estimates without rescans).
  *
  * Estimation: the φ-quantile is the EXACT lower discrete quantile of
  * the sample — rank floor(φ·(m−1))+1 of m sampled values, selected via
  * [[graft.analytics.ExactQuantiles]]' histogram bisection (no global
  * sort at any scale). Classic Bernoulli-sample rank error: the
  * estimate's true rank deviates from φ·n by O(n·√(φ(1−φ)/m)) w.h.p.
  * (binomial concentration); the returned value is a real data element
  * and every step is engine-portable, so results replay bit-for-bit.
  */
object SampleQuantile {

  /** 60-bit content hash of a row key — uniform on [0, 2^60). */
  def keyHash(key: Column): Column =
    graft.functions.Md5Prefix60.md5Prefix60(key)

  /** The admission threshold for rate `p`: keep rows with
    * `keyHash < threshold(p)`. Computed once, exact in both engines.
    */
  def threshold(p: Double): Long = {
    require(p > 0.0 && p <= 1.0, s"sampling rate out of (0,1]: $p")
    math.floor(p * math.pow(2, 60)).toLong
  }

  /** The deterministic Bernoulli sample of `df` at rate `p` keyed by
    * `key` (must be row-unique for an unbiased sample).
    */
  def sample(df: DataFrame, key: Column, p: Double): DataFrame =
    df.filter(keyHash(key) < threshold(p))

  /** Approximate quantiles of `valueCol`: one (q, value, sample_n) row
    * per φ — `value` the sample's exact lower discrete quantile,
    * `sample_n` the sample size the error bound is read from.
    */
  def quantiles(df: DataFrame, valueCol: String, key: Column, p: Double,
      qs: Seq[Double], buckets: Int = 1024,
      cutoff: Long = 100000): DataFrame = {
    // cache the p-fraction sample for the selection passes: bisection
    // re-scans its input log_B(m) times per quantile, and without the
    // cache every pass would re-scan the FULL table and re-hash every
    // key just to re-derive the sample (measured 6× the runtime at
    // sf0.1). Freed before returning — the result is already a
    // materialized driver-side frame.
    val smp = sample(df, key, p).select(col(valueCol)).cache()
    try {
      val m = smp.agg(count(col(valueCol))).first().getLong(0)
      graft.analytics.ExactQuantiles
        .quantiles(smp, valueCol, qs, buckets, cutoff)
        .withColumn("sample_n", lit(m))
    } finally smp.unpersist(blocking = false)
  }
}
