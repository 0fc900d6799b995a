package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.HoltScan

/** HoltScan must equal the sequential two-state recurrence
  * (l₁ = x₁, b₁ = 0; l' = (1−α)(l+b) + αx, b' = β(l'−l) + (1−β)b)
  * — BIT-exactly when one bucket makes the scan literally sequential, and
  * to stitch-correction tolerance across many buckets. Replaying each
  * segment from its dumped (seed_l, seed_b) must match bit-for-bit (the
  * contract the DuckDB oracle replay relies on).
  */
class HoltScanSpec extends SparkSpec {

  private val alpha = 0.125
  private val beta = 0.25

  private def step(l: Double, b: Double, x: Double): (Double, Double) = {
    val l1 = (1.0 - alpha) * (l + b) + alpha * x
    val b1 = beta * (l1 - l) + (1.0 - beta) * b
    (l1, b1)
  }

  /** Driver-side reference: plain sequential fold per group. */
  private def reference(rows: Seq[(String, Int, Double)])
      : Map[(String, Int), (Double, Double)] = {
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      var l = 0.0; var b = 0.0; var first = true
      rs.sortBy(_._2).map { case (_, t, x) =>
        if (first) { first = false; l = x; b = 0.0 }
        else { val s = step(l, b, x); l = s._1; b = s._2 }
        (g, t) -> ((l, b))
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
    var seed = 7L
    (0 until n).map { i =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (s"g${i % groups}", i, ((seed >>> 11) % 10000000L) / 100.0)
    }
  }

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("single bucket = bit-exact sequential fold (level and trend)") {
    val rows = pseudoRows(5000, 2)
    val got = HoltScan.holt(mkDf(rows), Seq("g"), Seq("t"), col("t"), "x",
        alpha, beta, "l", "b", buckets = 1)
      .select("g", "t", "l", "b").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val want = reference(rows)
    assert(got.size == want.size)
    want.foreach { case (k, (wl, wb)) =>
      assert(bits(got(k)._1) == bits(wl) && bits(got(k)._2) == bits(wb),
        s"bit mismatch at $k")
    }
  }

  test("many buckets equal the sequential fold to stitch tolerance") {
    val rows = pseudoRows(20000, 3)
    val got = HoltScan.holt(mkDf(rows), Seq("g"), Seq("t"), col("t"), "x",
        alpha, beta, "l", "b", buckets = 16)
      .select("g", "t", "l", "b").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val want = reference(rows)
    assert(got.size == want.size)
    want.foreach { case (k, (wl, wb)) =>
      val dl = math.abs(got(k)._1 - wl) / math.max(1.0, math.abs(wl))
      val db = math.abs(got(k)._2 - wb) / math.max(1.0, math.abs(wb))
      assert(dl < 1e-10 && db < 1e-10,
        s"$k: got ${got(k)} want ($wl,$wb)")
    }
  }

  test("seeds compose: replaying each segment from its seed matches bit-for-bit") {
    val rows = pseudoRows(6000, 2)
    val (result, seeds) = HoltScan.holtWithSeeds(mkDf(rows), Seq("g"),
      Seq("t"), col("t"), "x", alpha, beta, "l", "b", buckets = 8)
    val seedMap = seeds.collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None
         else Some((r.getDouble(2), r.getDouble(3))))).toMap
    val ts = rows.map(_._2)
    val lo = ts.min.toLong
    val width = (ts.max.toLong - lo) / 8 + 1
    val bySeg = rows.groupBy(r => (((r._2 - lo) / width).toInt, r._1))
    val got = result.select("g", "t", "l", "b").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    bySeg.foreach { case ((bk, g), rs) =>
      var l = 0.0; var b = 0.0; var first = true
      rs.sortBy(_._2).foreach { case (_, t, x) =>
        if (first) {
          first = false
          seedMap((bk, g)) match {
            case Some((sl, sb)) =>
              val s = step(sl, sb, x); l = s._1; b = s._2
            case None => l = x; b = 0.0
          }
        } else { val s = step(l, b, x); l = s._1; b = s._2 }
        assert(bits(got((g, t))._1) == bits(l) &&
          bits(got((g, t))._2) == bits(b),
          s"segment ($bk,$g) t=$t: replay ($l,$b) vs ${got((g, t))}")
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
      HoltScan.holt(withNull, Seq("g"), Seq("t"), col("t"), "x", alpha,
        beta, "l", "b").count()
    }
    assert(ex.getMessage.contains("HoltScan") ||
      Option(ex.getCause).exists(_.getMessage.contains("HoltScan")))
    val (res, seeds) = HoltScan.holtWithSeeds(
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema),
      Seq("g"), Seq("t"), col("t"), "x", alpha, beta, "l", "b")
    assert(res.count() == 0 && seeds.count() == 0)
    assert(res.schema.fieldNames.contains("l") &&
      res.schema.fieldNames.contains("b"))
  }
}
