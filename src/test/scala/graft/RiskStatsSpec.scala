package graft

import org.apache.spark.sql.functions._

import graft.analytics.{RiskStats, StockWindows}

/** Sanity semantics for the risk/returns analytics (no golden files exist
  * for the reference's notebook outputs, so fixtures are hand-computed).
  */
class RiskStatsSpec extends SparkSpec {

  private lazy val tiny = {
    import spark.implicits._
    // two tickers, LogReturn chosen so stats are hand-checkable
    Seq(
      ("A", "2024-01-01", 0.01, 100L, 1.0),  // Return: +1, -2, +1 (%)
      ("A", "2024-01-02", -0.02, 200L, -2.0),
      ("A", "2024-01-03", 0.01, 300L, 1.0),
      ("B", "2024-01-01", 0.05, 10L, 1.0),
      ("B", "2024-01-02", 0.05, 10L, 2.0),
      ("B", "2024-01-03", 0.05, 10L, 3.0)
    ).toDF("Ticker", "d", "LogReturn", "Volume", "Return")
      .withColumn("Date", to_date(col("d")))
  }

  test("summaryStats: annualized formulas and Sharpe") {
    val r = RiskStats.summaryStats(tiny).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("A")
    val muA = (0.01 - 0.02 + 0.01) / 3
    assert(math.abs(a.getAs[Double]("MeanLogReturn") - muA) < 1e-12)
    assert(math.abs(a.getAs[Double]("AnnualizedReturn")
      - (math.exp(muA * 252) - 1)) < 1e-12)
    val b = r("B")
    // constant returns → zero vol → infinite Sharpe guarded by null/NaN?
    assert(b.getAs[Double]("AnnualizedVol") == 0.0)
    assert(math.abs(b.getAs[Double]("AnnualizedReturn")
      - (math.exp(0.05 * 252) - 1)) < 1e-6 * math.exp(0.05 * 252))
  }

  test("max drawdown: monotone wealth has ~zero drawdown, crash is negative") {
    val dd = StockWindows.maxDrawdown(tiny).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    // A: +1% then −2% then +1% → trough below peak
    assert(dd("A") < 0.0 && dd("A") > -0.05)
    // B: +5% every row → new peak every day → drawdown 0
    assert(math.abs(dd("B")) < 1e-12)
  }

  test("corr matrix: perfectly correlated series → 1") {
    val m = RiskStats.returnCorrMatrix(tiny, Seq("A", "B"))
    val v = m.collect()(0)
    // A's returns (.01,-.02,.01) vs B's (.05,.05,.05): B constant → corr null
    val ab = v.fieldIndex("A_B")
    assert(v.isNullAt(ab) || v.getDouble(ab).isNaN)
    import spark.implicits._
    val corr2 = Seq(
      ("X", "2024-01-01", 0.01), ("X", "2024-01-02", 0.03),
      ("Y", "2024-01-01", 0.02), ("Y", "2024-01-02", 0.06))
      .toDF("Ticker", "d", "LogReturn")
      .withColumn("Date", to_date(col("d")))
    val c = RiskStats.returnCorrMatrix(corr2, Seq("X", "Y")).collect()(0)
    assert(math.abs(c.getDouble(c.fieldIndex("X_Y")) - 1.0) < 1e-12)
  }

  test("statSpikes flags only the outlier volume day") {
    import spark.implicits._
    val rows = (1 to 20).map(i => ("T", s"2024-01-${"%02d".format(i)}", 100L)) :+
      (("T", "2024-01-21", 100000L))
    val df = rows.toDF("Ticker", "d", "Volume")
      .withColumn("Date", to_date(col("d")))
    val spikes = RiskStats.statSpikes(df).filter(col("IsSpike")).collect()
    assert(spikes.length == 1 && spikes(0).getAs[Long]("Volume") == 100000L)
  }
}
