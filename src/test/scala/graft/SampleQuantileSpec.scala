package graft

import org.apache.spark.sql.functions._

import graft.sketches.SampleQuantile

/** Hash-sampled mergeable quantiles (sketches.SampleQuantile): admission
  * determinism under repartitioning, the set-union merge property, and
  * the Bernoulli rank-error bound against the exact quantile.
  */
class SampleQuantileSpec extends SparkSpec {

  private def li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
  private val key = expr("l_orderkey * 8 + l_linenumber")

  test("sample is a set: same rows under any partitioning, admission " +
    "rate near p") {
    val a = SampleQuantile.sample(li, key, 0.2)
      .select(key.as("k")).collect().map(_.getLong(0)).sorted.toSeq
    val b = SampleQuantile.sample(li.repartition(7), key, 0.2)
      .select(key.as("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b, "sample depends on partitioning")
    val n = li.count()
    // binomial 5σ band around p·n
    val sd = math.sqrt(0.2 * 0.8 * n)
    assert(math.abs(a.size - 0.2 * n) <= 5 * sd,
      s"sample size ${a.size} vs expected ${0.2 * n} ± ${5 * sd}")
  }

  test("merge = union: sampling a union equals the union of samples") {
    val lo = li.filter(col("l_orderkey") % 2 === 0)
    val hi = li.filter(col("l_orderkey") % 2 === 1)
    val whole = SampleQuantile.sample(li, key, 0.2)
      .select(key.as("k")).collect().map(_.getLong(0)).toSet
    val parts = SampleQuantile.sample(lo, key, 0.2)
      .select(key.as("k")).collect().map(_.getLong(0)).toSet ++
      SampleQuantile.sample(hi, key, 0.2)
        .select(key.as("k")).collect().map(_.getLong(0)).toSet
    assert(whole == parts)
  }

  test("estimate's true rank lands within the Bernoulli error band") {
    val p = 0.2
    val n = li.count()
    val res = SampleQuantile.quantiles(li, "l_extendedprice", key, p,
      Seq(0.25, 0.5, 0.75), cutoff = 200).collect()
    val m = res.head.getLong(2)
    res.foreach { r =>
      val (q, v) = (r.getDouble(0), r.getDouble(1))
      val trueRank = li.filter(col("l_extendedprice") <= v).count()
      // 5σ binomial band on the sampled rank, scaled back to n
      val band = 5 * n * math.sqrt(q * (1 - q) / m)
      assert(math.abs(trueRank - q * n) <= band,
        s"q=$q: true rank $trueRank vs ${q * n} ± $band (m=$m)")
    }
  }
}
