package graft

import graft.etl.SnapshotDiff

/** SnapshotDiff must classify every key into exactly one of the four CDC
  * classes, keyed only on payload equality.
  */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("insert / delete / update / unchanged classification") {
    val a = Seq((1L, "x", "p"), (2L, "y", "q"), (3L, "z", "r"))
      .toDF("k", "v1", "v2")
    val b = Seq((2L, "y", "q"), (3L, "Z", "r"), (4L, "w", "s"))
      .toDF("k", "v1", "v2")
    val got = SnapshotDiff.diff(a, b, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "delete", 2L -> "unchanged", 3L -> "update",
      4L -> "insert"))
  }

  test("payload separator prevents field-boundary ambiguity") {
    // ("ab","c") vs ("a","bc") must NOT fingerprint equal
    val a = Seq((1L, "ab", "c")).toDF("k", "v1", "v2")
    val b = Seq((1L, "a", "bc")).toDF("k", "v1", "v2")
    val got = SnapshotDiff.diff(a, b, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "update"))
  }
}
