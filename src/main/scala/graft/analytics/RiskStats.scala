package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Returns/risk analytics (SURVEY §2.5 A8, A10–A14; §2.3 F13): correlation
  * and covariance matrices, volume-spike detection, and the per-ticker
  * summary-statistics table (annualized return/vol, Sharpe, max drawdown).
  *
  * Matrices are computed as pairwise aggregates in ONE groupBy pass (all
  * pairs as columns) — no per-pair jobs, no driver-side loops over data.
  */
object RiskStats {

  val TradingDays = 252
  val RiskFreeRate = 0.03 // datavisualization.py:583

  /** A11 (datavisualization.py:694-698): cross-ticker correlation matrix of
    * log returns. Output: one row per ticker pair (i < j).
    */
  def returnCorrMatrix(df: DataFrame, ts: Seq[String]): DataFrame = {
    val piv = df.groupBy("Date").pivot("Ticker", ts).agg(first(col("LogReturn")))
    val pairs = for {
      i <- ts.indices; j <- ts.indices if i < j
    } yield corr(col(s"`${ts(i)}`"), col(s"`${ts(j)}`"))
      .as(s"${ts(i)}_${ts(j)}")
    piv.agg(pairs.head, pairs.tail: _*)
  }

  /** A12 (datavisualization.py:713): cross-ticker covariance matrix. */
  def returnCovMatrix(df: DataFrame, ts: Seq[String]): DataFrame = {
    val piv = df.groupBy("Date").pivot("Ticker", ts).agg(first(col("LogReturn")))
    val pairs = for {
      i <- ts.indices; j <- ts.indices if i <= j
    } yield covar_samp(col(s"`${ts(i)}`"), col(s"`${ts(j)}`"))
      .as(s"${ts(i)}_${ts(j)}")
    piv.agg(pairs.head, pairs.tail: _*)
  }

  /** A13 (datavisualization.py:640-675): MA-relative volume spikes —
    * Volume > mult × MA(n) — and the spike-vs-normal mean |Return| summary.
    */
  def spikeSummary(df: DataFrame, n: Int = 20, mult: Double = 2.5): DataFrame = {
    val withMa = StockWindows.withVolumeMA(df, n)
    withMa
      .withColumn("Is_Spike_Day",
        col("Volume") > col(s"Volume_MA$n") * mult)
      .filter(col("Is_Spike_Day").isNotNull)
      .groupBy("Is_Spike_Day")
      .agg(avg(abs(col("Return"))).as("mean_abs_return"),
        count(lit(1)).as("n_days"))
      .orderBy("Is_Spike_Day")
  }

  /** A13b (datavisualization.py:760-799): stat-relative spikes via the J1
    * broadcast join — Volume > mean + 2·std per ticker.
    */
  def statSpikes(df: DataFrame): DataFrame = {
    val stats = df.groupBy("Ticker").agg(
      avg("Volume").as("vol_mean"), stddev_samp(col("Volume")).as("vol_std"))
    df.join(broadcast(stats), Seq("Ticker"), "left")
      .withColumn("IsSpike", col("Volume") > col("vol_mean") + col("vol_std") * 2)
  }

  /** A14/F13 (datavisualization.py:582-631): per-ticker summary statistics.
    * Annualized return exp(μ·252)−1, annualized vol σ·√252 (sample std),
    * Sharpe (annRet − rf)/annVol, max drawdown (W7), mean volume.
    */
  def summaryStats(df: DataFrame): DataFrame = {
    val dd = StockWindows.maxDrawdown(df)
    val agg = df.groupBy("Ticker").agg(
      avg("LogReturn").as("MeanLogReturn"),
      stddev_samp(col("LogReturn")).as("StdLogReturn"),
      avg("Volume").as("AvgVolume"))
    agg.join(broadcast(dd), Seq("Ticker"))
      .withColumn("AnnualizedReturn",
        exp(col("MeanLogReturn") * TradingDays) - 1)
      .withColumn("AnnualizedVol",
        col("StdLogReturn") * math.sqrt(TradingDays))
      .withColumn("Sharpe",
        (col("AnnualizedReturn") - RiskFreeRate) / col("AnnualizedVol"))
      .select("Ticker", "MeanLogReturn", "AnnualizedReturn", "AnnualizedVol",
        "Sharpe", "MaxDrawdown", "AvgVolume")
      .orderBy("Ticker")
  }
}
