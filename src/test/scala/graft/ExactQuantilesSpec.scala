package graft

import org.apache.spark.sql.functions._

import graft.analytics.ExactQuantiles

/** Bisection selection must return EXACTLY the rank-th smallest element —
  * cross-checked against a real global sort — including under heavy ties,
  * tiny cutoffs (many bisection passes), and the extreme quantiles.
  */
class ExactQuantilesSpec extends SparkSpec {

  import spark.implicits._

  private def sortedRank(vals: Array[Double], q: Double): Double =
    vals(math.floor(q * (vals.length - 1)).toInt)

  test("matches the sorted-ranks answer on real data, multi-pass") {
    val li = spark.read.parquet(s"$sfCorrect/lineitem.parquet")
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    // cutoff 500 at 60k rows forces >= 2 bisection passes
    val got = ExactQuantiles.quantiles(li, "l_extendedprice", qs,
      buckets = 64, cutoff = 500).orderBy("q").collect()
    val sorted = li.select(col("l_extendedprice").cast("double"))
      .orderBy("l_extendedprice").as[Double].collect()
    qs.zip(got).foreach { case (q, r) =>
      assert(r.getDouble(0) == q)
      assert(r.getDouble(1) == sortedRank(sorted, q),
        s"q=$q: got ${r.getDouble(1)} want ${sortedRank(sorted, q)}")
    }
  }

  test("heavy ties: constant-dominated column") {
    val df = (Seq.fill(5000)(7.0) ++ Seq(1.0, 2.0, 3.0) ++
      Seq.fill(100)(9.0)).toDF("x")
    val got = ExactQuantiles.quantiles(df, "x", Seq(0.5, 0.999),
      buckets = 16, cutoff = 10).orderBy("q").collect()
    assert(got(0).getDouble(1) == 7.0)
    assert(got(1).getDouble(1) == 9.0)
  }

  test("nulls are ignored like sort-based quantiles") {
    val df = Seq[java.lang.Double](null, 1.0, null, 2.0, 3.0, 4.0, 5.0)
      .toDF("x")
    val got = ExactQuantiles.quantiles(df, "x", Seq(0.5), cutoff = 2)
      .first()
    assert(got.getDouble(1) == 3.0)
  }
}
