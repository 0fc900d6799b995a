package graft

import org.apache.spark.sql.functions._

import graft.sketches.Hll

/** HLL must estimate within its design error (1/√m ≈ 6.25% rse at m = 256;
  * assert a loose 3σ bound), its register table must stay bounded by m per
  * group, and register tables must MERGE losslessly (the property that
  * makes the sketch distributable: partial sketches max-combine).
  */
class HllSpec extends SparkSpec {

  private val p = 8

  test("estimate within 3-sigma of exact distinct per group") {
    val o = spark.read.parquet(s"$sfCorrect/orders.parquet")
    val est = Hll.approxDistinct(o, Seq("o_orderpriority"), col("o_custkey"), p)
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("ex"))
    val rows = est.join(exact, "o_orderpriority").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (e, x) = (r.getAs[Double]("hll_est"), r.getAs[Long]("ex").toDouble)
      assert(math.abs(e - x) / x < 3.0 / math.sqrt((1 << p).toDouble),
        s"${r.get(0)}: est $e vs exact $x")
    }
  }

  test("register table bounded by m per group") {
    val o = spark.read.parquet(s"$sfCorrect/orders.parquet")
    val regs = Hll.registers(o, Seq("o_orderpriority"), col("o_custkey"), p)
    val worst = regs.groupBy("o_orderpriority").count()
      .agg(max("count")).first().getLong(0)
    assert(worst <= (1 << p), s"group register count $worst exceeds m")
  }

  test("partial register tables max-merge to the full sketch") {
    val o = spark.read.parquet(s"$sfCorrect/orders.parquet")
    val h1 = o.filter(col("o_orderkey") % 2 === 0)
    val h2 = o.filter(col("o_orderkey") % 2 === 1)
    val g = Seq("o_orderpriority")
    val merged = Hll.registers(h1, g, col("o_custkey"), p)
      .unionByName(Hll.registers(h2, g, col("o_custkey"), p))
      .groupBy((g :+ "reg").map(col): _*)
      .agg(max("m_rho").as("m_rho"))
    val full = Hll.registers(o, g, col("o_custkey"), p)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }
}
