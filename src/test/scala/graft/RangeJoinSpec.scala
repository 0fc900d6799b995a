package graft

import graft.plans.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("boundary semantics: lo inclusive, hi exclusive, negatives, spans") {
    import spark.implicits._
    val points = Seq((1, 10.0), (2, 20.0), (3, -5.0), (4, 39.999), (5, 40.0))
      .toDF("pid", "x")
    val intervals = Seq(
      (100, 10.0, 40.0),   // [10, 40): pids 1, 2, 4 — NOT 5
      (200, -10.0, 0.0),   // negative band: pid 3
      (300, 0.0, 200.0)    // spans many buckets: pids 1, 2, 4, 5
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.bucketedRangeJoin(points, "x", intervals,
        "lo", "hi", 25.0)
      .select("pid", "iid").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val want = Set((1, 100), (2, 100), (4, 100), (3, 200),
      (1, 300), (2, 300), (4, 300), (5, 300))
    assert(got == want, s"got $got")
  }
}
