package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedTables

/** The point of bucketing is the PLAN: same-bucketed sides join with no
  * shuffle exchange. Assert it, don't assume it.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed join has no shuffle exchange and matches plain join") {
    val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    BucketedTables.writeBucketed(li, "li_bucketed", 8, Seq("l_orderkey"))
    BucketedTables.writeBucketed(o, "o_bucketed", 8, Seq("o_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.colocatedJoin(spark, "li_bucketed",
        "o_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness: same row count as the plain join
      val expect = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
