package graft

import org.apache.spark.sql.functions._

import graft.plans.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain join on a pathologically skewed key") {
    import spark.implicits._
    // 90% of fact rows share key 1
    val fact = (1 to 10000).map(i =>
      (if (i % 10 == 0) i % 7 + 2 else 1, i.toLong, i * 1.5))
      .toDF("k", "row_id", "v")
    val dim = (1 to 8).map(k => (k, s"name_$k")).toDF("k", "name")
    val got = SkewJoin.saltedJoin(fact, dim, "k", "row_id", 16)
    val want = fact.join(dim, "k")
    assert(got.count() == want.count())
    val gotAgg = got.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val wantAgg = want.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(gotAgg.keySet == wantAgg.keySet)
    gotAgg.foreach { case (k, s) =>
      assert(math.abs(s - wantAgg(k)) < 1e-6, s"key $k")
    }
    // the salt actually spreads the hot key: fact side carries 16 distinct
    // (key=1, salt) combinations
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(col("row_id")), lit(16)).cast("int"))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(spread == 16)
  }
}
