package graft

import org.apache.spark.sql.functions._

import graft.etl.Scd2

/** SCD2 invariants under messy CDC batches: one open version per key,
  * latest-wins reduction via seqCol, fail-fast on unreduced duplicates.
  */
class Scd2Spec extends SparkSpec {

  private def dim0 = {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "attr")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
  }

  test("distinct-key batch closes old versions and opens exactly one new") {
    import spark.implicits._
    val changes = Seq((1, "a2"), (4, "d")).toDF("k", "attr")
    val out = Scd2.applyChanges(dim0, changes, Seq("k"), ts = 10L)
    // one-current-row-per-key invariant
    val open = out.filter(col("valid_to").isNull)
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(open == 0)
    assert(out.count() == 5) // 3 original + closed 1 reopened + inserted 4
    val k1 = out.filter(col("k") === 1).orderBy("valid_from").collect()
    assert(k1.length == 2)
    assert(k1(0).getAs[Long]("valid_to") == 10L)
    assert(k1(0).getAs[String]("attr") == "a")
    assert(k1(1).isNullAt(k1(1).fieldIndex("valid_to")))
    assert(k1(1).getAs[String]("attr") == "a2")
  }

  test("multi-row-per-key CDC batch reduces latest-wins via seqCol") {
    import spark.implicits._
    val changes = Seq((1, "v1", 1L), (1, "v2", 2L), (1, "v3", 3L),
        (2, "w2", 7L), (2, "w1", 5L))
      .toDF("k", "attr", "lsn")
    val out = Scd2.applyChanges(dim0, changes, Seq("k"), ts = 10L,
      seqCol = Some("lsn"))
    // exactly one open row per key, carrying the highest-lsn value
    val open = out.filter(col("valid_to").isNull)
    assert(open.groupBy("k").count().filter(col("count") > 1).count() == 0)
    val byKey = open.collect().map(r =>
      r.getAs[Int]("k") -> r.getAs[String]("attr")).toMap
    assert(byKey(1) == "v3" && byKey(2) == "w2" && byKey(3) == "c")
  }

  test("duplicate keys without seqCol fail fast, not silently corrupt") {
    import spark.implicits._
    val changes = Seq((1, "x"), (1, "y")).toDF("k", "attr")
    val e = intercept[IllegalArgumentException] {
      Scd2.applyChanges(dim0, changes, Seq("k"), ts = 10L)
    }
    assert(e.getMessage.contains("seqCol"))
  }
}
