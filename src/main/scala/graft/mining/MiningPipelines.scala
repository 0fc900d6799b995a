package graft.mining

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.StockWindows

/** The reference's four mining result tables (datamining_analysis.py),
  * composed from the building blocks.
  */
object MiningPipelines {

  val SameDayFeatures = Seq("Open", "High", "Low", "Volume")

  /** 01_regression_same_day.csv: in-sample OLS Close ~ O,H,L,Vol per ticker
    * on all rows of groups with ≥ 20 rows (P9 guard).
    */
  def regressionSameDay(spark: SparkSession, df: DataFrame): DataFrame = {
    val eligible = df.groupBy("Ticker").count().filter(col("count") >= 20)
    val d = df.join(broadcast(eligible.select("Ticker")), Seq("Ticker"))
    val fits = Ols.fit(d, "Ticker", SameDayFeatures, "Close")
    Ols.fitTable(spark, fits, "Ticker")
  }

  /** 02_regression_next_day.csv: globally scaled features (population std),
    * next-day target, chronological 80/20 split, fit train / score test.
    */
  def regressionNextDay(spark: SparkSession, df: DataFrame): DataFrame = {
    val withTarget = StockWindows.withNextDayClose(df)
      .na.drop(Seq("Target_NextDay") ++ SameDayFeatures :+ "Close")
    val scaled = Scaling.standardize(
      withTarget, SameDayFeatures :+ "Close")
    val featuresZ = (SameDayFeatures :+ "Close").map(_ + "_z")
    val split = StockWindows.withTrainTestSplit(scaled)
    val fits = Ols.fitSplit(split, "Ticker", featuresZ, "Target_NextDay",
      col("is_train"))
    Ols.fitTable(spark, fits, "Ticker")
  }

  /** 03_kmeans_clusters.csv: per-ticker (mean DoD return, mean volume),
    * scaled, k=3.
    */
  def kmeansClusters(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    KMeansStocks.clusterExact(df, 3)
      .toDF("Ticker", "Return", "Volume", "Cluster")
  }

  /** 04_anomalies.csv: |z(Close)| > 2 per ticker, full row + score.
    *
    * The reference's script OVERWRITES the ETL's intraday-% `Return` with
    * the day-over-day fraction before this step (datamining_analysis.py:107
    * runs before :127 on the same frame — the §2.6 semantics trap), so the
    * golden file's `Return` column holds pct_change values. Reproduced here
    * without losing the engine's own two-column distinction.
    */
  def anomalies(df: DataFrame): DataFrame =
    Anomalies.detect(
      StockWindows.withDoDReturn(df)
        .withColumn("Return", col("DoDReturn"))
        .drop("DoDReturn"))
}
