package graft

import graft.plans.AsOfJoin

/** Hand-built as-of semantics: strictly-prior match, equal-timestamp
  * inclusion, no-prior null, key isolation.
  */
class AsOfJoinSpec extends SparkSpec {

  test("as-of join picks latest right row at-or-before left time per key") {
    import spark.implicits._
    val trades = Seq(
      ("A", 100L, 1), ("A", 205L, 2), ("A", 300L, 3),
      ("B", 150L, 4), ("B", 90L, 5)
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", 100L, 10.0), ("A", 200L, 11.0), ("A", 205L, 12.0),
      ("B", 100L, 20.0)
    ).toDF("sym", "t", "px")
    val got = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t",
        Seq("px"))
      .collect().map(r => r.getAs[Int]("trade_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_px"))) None
         else Some(r.getAs[Double]("asof_px")))).toMap
    assert(got(1).contains(10.0))  // equal timestamp included
    assert(got(2).contains(12.0))  // equal ts beats earlier 200→11.0
    assert(got(3).contains(12.0))  // carried forward
    assert(got(4).contains(20.0))
    assert(got(5).isEmpty)         // before any quote → null
  }
}
