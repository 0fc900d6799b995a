package graft

import org.apache.spark.sql.functions._

/** Domain invariants of the finance-indicator family on sf0.001 — the
  * properties a chart consumer relies on, independent of the DuckDB value
  * gates (which prove cross-engine equality, not financial sanity).
  */
class IndicatorSpec extends SparkSpec {

  test("RSI stays in [0, 100]") {
    val bad = SparkEntry.queries("q_f_rsi")(spark, sfSmoke)
      .where(col("rsi") < 0 || col("rsi") > 100)
      .count()
    assert(bad == 0)
  }

  test("OHLC: low <= open/close <= high, positive trade counts") {
    val df = SparkEntry.queries("q_f_ohlc_weekly")(spark, sfSmoke)
    assert(df.where(col("low") > col("high")).count() == 0)
    assert(df.where(col("open") < col("low") ||
      col("open") > col("high")).count() == 0)
    assert(df.where(col("close") < col("low") ||
      col("close") > col("high")).count() == 0)
    assert(df.where(col("n_trades") <= 0).count() == 0)
    // low <= vwap <= high (vwap is a quantity-weighted mean of prices;
    // rounding at r4 stays far inside the price-magnitude band)
    assert(df.where(col("vwap") < col("low") - 0.01 ||
      col("vwap") > col("high") + 0.01).count() == 0)
  }

  test("Bollinger: lower <= mid <= upper once the frame fills; null before") {
    val df = SparkEntry.queries("q_f_bollinger")(spark, sfSmoke)
    assert(df.where(col("mid").isNotNull &&
      (col("lower") > col("mid") || col("mid") > col("upper"))).count() == 0)
    // the first 19 rows of every partition are pre-frame: all-null bands
    assert(df.where(col("mid").isNull && col("upper").isNotNull)
      .count() == 0)
  }

  test("MACD: histogram = macd - signal, exactly") {
    val bad = SparkEntry.queries("q_f_macd")(spark, sfSmoke)
      .where(col("histogram") =!= col("macd") - col("signal"))
      .count()
    assert(bad == 0)
  }

  test("forward fill: no null closes after a flag's first trade day") {
    val df = SparkEntry.queries("q_f_ffill")(spark, sfSmoke)
    // spine starts at each flag's first trade, so close_ff is total
    assert(df.where(col("close_ff").isNull).count() == 0)
    // gap rows exist (the spine is denser than trade days) and carry the
    // previous close forward
    assert(df.where(col("gap_filled")).count() > 0)
  }

  test("checksum audit is partition-order invariant") {
    val a = SparkEntry.queries("q_audit_checksum")(spark, sfSmoke)
      .collect().map(_.toSeq).toSeq
    // same data read with a different partitioning must fingerprint equal
    val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .repartition(7).write.mode("overwrite")
      .parquet("/tmp/graft_checksum_reshuffled/lineitem.parquet")
    val dirs = new java.io.File(sfSmoke).listFiles()
      .map(_.getName).filter(_ != "lineitem.parquet")
    dirs.foreach { n =>
      val src = java.nio.file.Paths.get(sfSmoke, n)
      val dst = java.nio.file.Paths.get("/tmp/graft_checksum_reshuffled", n)
      if (!java.nio.file.Files.exists(dst))
        java.nio.file.Files.createSymbolicLink(dst, src)
    }
    val b = SparkEntry.queries("q_audit_checksum")(
      spark, "/tmp/graft_checksum_reshuffled")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
