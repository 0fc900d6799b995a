package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The one window spec that rules the reference (SURVEY §2.6): PARTITION BY
  * Ticker ORDER BY Date, plus its whole-partition and trailing-frame
  * variants. All derived time-series columns (W1–W8) live here.
  *
  * The reference's dual `Return` semantics (§2.6 note) are kept as distinct
  * columns: the ETL's intraday percent `Return` vs the mining path's
  * day-over-day fraction `DoDReturn`.
  */
object StockWindows {

  val w = Window.partitionBy("Ticker").orderBy("Date")
  val wAll = Window.partitionBy("Ticker")
  def trailing(n: Int) = w.rowsBetween(-(n - 1), 0)
  val cum = w.rowsBetween(Window.unboundedPreceding, 0)

  /** W1 (datamining_analysis.py:70): next-day close target. */
  def withNextDayClose(df: DataFrame): DataFrame =
    df.withColumn("Target_NextDay", lead(col("Close"), 1).over(w))

  /** W2 (datamining_analysis.py:107): day-over-day fractional return. */
  def withDoDReturn(df: DataFrame): DataFrame =
    df.withColumn("DoDReturn", col("Close") / lag(col("Close"), 1).over(w) - 1)

  /** W3 (datamining_analysis.py:127): per-ticker z-score of Close (sample
    * stddev, whole-partition).
    */
  def withZScore(df: DataFrame, src: String = "Close"): DataFrame =
    df.withColumn("Z_Score",
      (col(src) - avg(col(src)).over(wAll)) / stddev_samp(col(src)).over(wAll))

  /** W4 (datavisualization.py:411-417): trailing rolling volatility of
    * LogReturn with pandas min_periods=window null semantics.
    */
  def withRollingVolatility(df: DataFrame, n: Int): DataFrame = {
    val f = trailing(n)
    df.withColumn(s"RollingVolatility$n",
      when(count(col("LogReturn")).over(f) === n,
        stddev_samp(col("LogReturn")).over(f)))
  }

  /** W5 (datavisualization.py:640-644): trailing volume moving average. */
  def withVolumeMA(df: DataFrame, n: Int): DataFrame = {
    val f = trailing(n)
    df.withColumn(s"Volume_MA$n",
      when(count(col("Volume")).over(f) === n, avg(col("Volume")).over(f)))
  }

  /** W6 (datavisualization.py:277-280): cumulative log return and its
    * exponentiated cumulative return.
    */
  def withCumulativeReturns(df: DataFrame): DataFrame =
    df.withColumn("CumulativeLogReturn", sum(col("LogReturn")).over(cum))
      .withColumn("CumulativeReturn", exp(col("CumulativeLogReturn")))

  /** W7 (datavisualization.py:606-610): per-ticker max drawdown of the
    * (1 + Return/100) wealth curve — cumprod via exp∘sum∘log1p, running max,
    * then the per-group minimum of (wealth − peak)/peak.
    */
  def maxDrawdown(df: DataFrame, returnCol: String = "Return",
      pct: Boolean = true): DataFrame = {
    val r = if (pct) col(returnCol) / 100.0 else col(returnCol)
    val wealth = exp(sum(log(r + 1)).over(cum))
    val withDd = df
      .withColumn("wealth", wealth)
      .withColumn("peak", max(col("wealth")).over(cum))
      .withColumn("dd", (col("wealth") - col("peak")) / col("peak"))
    withDd.groupBy("Ticker").agg(min(col("dd")).as("MaxDrawdown"))
  }

  /** W8 (datavisualization.py:724-741): trailing rolling correlation of two
    * tickers' log returns — pivot to columns, then corr over a global
    * date-ordered frame.
    */
  def rollingPairCorr(df: DataFrame, t1: String, t2: String, n: Int): DataFrame = {
    val piv = df.filter(col("Ticker").isin(t1, t2))
      .groupBy("Date").pivot("Ticker", Seq(t1, t2)).agg(first(col("LogReturn")))
    val f = Window.orderBy("Date").rowsBetween(-(n - 1), 0)
    piv.withColumn(s"RollingCorr$n",
        when(count(col(s"`$t1`")).over(f) === n,
          corr(col(s"`$t1`"), col(s"`$t2`")).over(f)))
      .orderBy("Date")
  }

  /** W10 (datamining_analysis.py:84): chronological 80/20 split flag —
    * sklearn puts ceil(0.2·n) rows in test.
    */
  def withTrainTestSplit(df: DataFrame, testFrac: Double = 0.2): DataFrame =
    df.withColumn("rn", row_number().over(w))
      .withColumn("n_rows", count(lit(1)).over(wAll))
      .withColumn("is_train",
        col("rn") <= col("n_rows") - ceil(col("n_rows") * testFrac))
      .drop("rn", "n_rows")
}
