package graft

import org.apache.spark.sql.functions._

import graft.plans.BloomJoin

/** BloomJoin: no false negatives, real pruning, and exact equality with
  * the plain semi join.
  */
class BloomJoinSpec extends SparkSpec {

  private def lineitem = spark.read.parquet(s"$sfCorrect/lineitem.parquet")
  private def orders96 = spark.read.parquet(s"$sfCorrect/orders.parquet")
    .filter(year(col("o_orderdate")) === 1996)

  test("membership probe never rejects a true dim key") {
    BloomJoin.register(spark)
    val bytes = BloomJoin.buildFilter(orders96, "o_orderkey", 100000L)
    val missed = orders96
      .filter(!BloomJoin.mightContain(bytes, col("o_orderkey")))
      .count()
    assert(missed == 0, s"$missed false negatives")
  }

  test("prefilter prunes a selective fact scan") {
    BloomJoin.register(spark)
    val bytes = BloomJoin.buildFilter(orders96, "o_orderkey", 100000L)
    val total = lineitem.count()
    val kept = lineitem
      .filter(BloomJoin.mightContain(bytes, col("l_orderkey"))).count()
    // 1996 is ~1/7 of the order dates; with fpp=0.01 the kept fraction
    // must stay well under half the scan
    assert(kept < total / 2, s"kept $kept of $total — no pruning happened")
  }

  test("oversized filter build fails loudly instead of bloating the plan") {
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(lineitem, orders96,
        "l_orderkey", "o_orderkey",
        expectedItems = 100000000L, // ~114 MB of filter at fpp 0.01
        maxFilterBytes = 1 << 20)
    }
    assert(e.getMessage.contains("bloom filter"))
  }

  test("bloomSemiJoin equals the plain left-semi join exactly") {
    val got = BloomJoin.bloomSemiJoin(lineitem, orders96,
        "l_orderkey", "o_orderkey", expectedItems = 100000L)
      .select("l_orderkey", "l_linenumber")
    val want = lineitem.join(
        orders96.select(col("o_orderkey").as("l_orderkey")).distinct(),
        Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }
}
