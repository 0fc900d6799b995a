package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.EwmaScan

/** EwmaScan must equal the sequential recurrence `y = (1−α)y + αx`
  * (seeded y₁ = x₁ per group) — BIT-exactly when one bucket makes the scan
  * literally sequential, and to stitch-correction tolerance when groups
  * span many buckets. The seeds table must compose segments exactly.
  */
class EwmaScanSpec extends SparkSpec {

  private val alpha = 0.125

  /** Driver-side reference: plain sequential fold per group. */
  private def reference(rows: Seq[(String, Int, Double)]): Map[(String, Int), Double] = {
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      var y = 0.0
      var first = true
      rs.sortBy(_._2).map { case (_, t, x) =>
        y = if (first) { first = false; x } else (1.0 - alpha) * y + alpha * x
        (g, t) -> y
      }
    }
  }

  private def mkDf(rows: Seq[(String, Int, Double)]) = {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("t", IntegerType),
      StructField("x", DoubleType)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
      schema)
  }

  private def pseudoRows(n: Int, groups: Int): Seq[(String, Int, Double)] = {
    var seed = 42L
    (0 until n).map { i =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (s"g${i % groups}", i, ((seed >>> 11) % 10000000L) / 100.0)
    }
  }

  test("single bucket = bit-exact sequential fold") {
    val rows = pseudoRows(5000, 2)
    val got = EwmaScan.ewma(mkDf(rows), Seq("g"), Seq("t"), col("t"), "x",
        alpha, "ewma", buckets = 1)
      .select("g", "t", "ewma").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val want = reference(rows)
    assert(got.size == want.size)
    want.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(got(k)) ==
        java.lang.Double.doubleToLongBits(v), s"bit mismatch at $k")
    }
  }

  test("many buckets equal the sequential fold to stitch tolerance") {
    val rows = pseudoRows(20000, 3)
    val got = EwmaScan.ewma(mkDf(rows), Seq("g"), Seq("t"), col("t"), "x",
        alpha, "ewma", buckets = 16)
      .select("g", "t", "ewma").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val want = reference(rows)
    assert(got.size == want.size)
    want.foreach { case (k, v) =>
      val d = math.abs(got(k) - v) / math.max(1.0, math.abs(v))
      assert(d < 1e-12, s"$k: got ${got(k)} want $v (rel $d)")
    }
  }

  test("seeds compose: replaying each segment from its seed matches the result") {
    val rows = pseudoRows(6000, 2)
    val df = mkDf(rows)
    val (result, seeds) = EwmaScan.ewmaWithSeeds(df, Seq("g"), Seq("t"),
      col("t"), "x", alpha, "ewma", buckets = 8)
    val seedMap = seeds.collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // recompute bucket ids exactly as the operator does
    val ts = rows.map(_._2)
    val lo = ts.min.toLong
    val width = (ts.max.toLong - lo) / 8 + 1
    val bySeg = rows.groupBy(r => (((r._2 - lo) / width).toInt, r._1))
    val got = result.select("g", "t", "ewma").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    bySeg.foreach { case ((b, g), rs) =>
      var y = 0.0
      var first = true
      rs.sortBy(_._2).foreach { case (_, t, x) =>
        y =
          if (first) {
            first = false
            seedMap((b, g)) match {
              case Some(s) => (1.0 - alpha) * s + alpha * x
              case None => x
            }
          } else (1.0 - alpha) * y + alpha * x
        assert(java.lang.Double.doubleToLongBits(got((g, t))) ==
          java.lang.Double.doubleToLongBits(y),
          s"segment ($b,$g) t=$t: replay $y vs ${got((g, t))}")
      }
    }
  }

  test("null value fails loudly; empty input returns typed empty frames") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("t", IntegerType),
      StructField("x", DoubleType)))
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(Row("a", 1, 2.0), Row("a", 2, null)), schema)
    val ex = intercept[org.apache.spark.SparkException] {
      EwmaScan.ewma(withNull, Seq("g"), Seq("t"), col("t"), "x", alpha,
        "ewma").count()
    }
    assert(ex.getMessage.contains("EwmaScan") ||
      Option(ex.getCause).exists(_.getMessage.contains("EwmaScan")))
    val (res, seeds) = EwmaScan.ewmaWithSeeds(
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema),
      Seq("g"), Seq("t"), col("t"), "x", alpha, "ewma")
    assert(res.count() == 0 && seeds.count() == 0)
    assert(res.schema.fieldNames.contains("ewma"))
  }
}
