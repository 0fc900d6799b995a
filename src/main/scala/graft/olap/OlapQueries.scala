package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's four OLAP result tables (SURVEY §2.5 A1–A4) plus the
  * chart-feed aggregates (A5–A8, A15), on the cleaned stock fact table.
  *
  * All are single hash-aggregates; pivots pass explicit ticker lists so the
  * plan needs no value-discovery pass and column order is deterministic.
  */
object OlapQueries {

  /** Binary-halfway rounding (matches numpy/pandas round-on-binary closely
    * enough for golden compare; see queries.QueryDef.r2 for rationale).
    */
  private def rN(c: org.apache.spark.sql.Column, n: Int) = {
    val m = math.pow(10, n)
    floor(c * m + lit(0.5)) / m
  }

  def tickers(df: DataFrame): Seq[String] =
    df.select("Ticker").distinct().collect().map(_.getString(0)).sorted.toSeq

  /** A1 (olap_analysis.py:43-44): quarterly mean close × ticker, 2dp. */
  def quarterlyPrice(df: DataFrame, ts: Seq[String]): DataFrame =
    df.groupBy("Year", "Quarter")
      .pivot("Ticker", ts)
      .agg(avg("Close"))
      .select(col("Year") +: col("Quarter") +: ts.map(t => rN(col(s"`$t`"), 2).as(t)): _*)
      .orderBy("Year", "Quarter")

  /** A2 (olap_analysis.py:46-49): yearly mean close pivot + growth %. */
  def yearlyGrowth(df: DataFrame): DataFrame =
    df.groupBy("Ticker")
      .pivot("Year", Seq(2024, 2025))
      .agg(avg("Close"))
      .withColumn("Growth 24-25 (%)", (col("2025") / col("2024") - 1) * 100)
      .orderBy("Ticker")

  /** A3 (olap_analysis.py:51-52): monthly mean volume pivot, int, fillna 0. */
  def monthlyVolume(df: DataFrame, ts: Seq[String]): DataFrame =
    df.groupBy("Year", "Month")
      .pivot("Ticker", ts)
      .agg(avg("Volume"))
      // pandas .round(0) is numpy half-even ("banker's") rounding — bround
      // matches it (x.5 → nearest even), unlike floor(x+0.5)
      .select(col("Year") +: col("Month") +: ts.map(t =>
        coalesce(bround(col(s"`$t`"), 0).cast("long"), lit(0L)).as(t)): _*)
      .orderBy("Year", "Month")

  /** A4 (olap_analysis.py:54-63): one year's per-ticker stats, sorted by
    * mean volume desc. pandas .std() is sample stddev.
    */
  def stats(df: DataFrame, yearFilter: Int): DataFrame =
    df.filter(col("Year") === yearFilter)
      .groupBy("Ticker")
      .agg(
        avg("Close").as("Gia_TB"),
        avg("Volume").as("Volume_TB"),
        stddev_samp(col("Close")).as("Bien_Dong_Std"))
      .withColumn("Bien_Dong_Pct (%)", col("Bien_Dong_Std") / col("Gia_TB") * 100)
      .orderBy(desc("Volume_TB"))

  /** A7 (olap_analysis.py:152): monthly mean close × ticker (trend feed). */
  def monthlyTrend(df: DataFrame, ts: Seq[String]): DataFrame =
    df.groupBy("YearMonth").pivot("Ticker", ts).agg(avg("Close"))
      .orderBy("YearMonth")

  /** A5/A6 (olap_analysis.py:84,99,116): per-ticker chart feeds. */
  def quarterlyMeanStd(df: DataFrame, ticker: String): DataFrame =
    df.filter(col("Ticker") === ticker)
      .groupBy("Year", "Quarter")
      .agg(avg("Close").as("mean_close"),
        stddev_samp(col("Close")).as("std_close"),
        (avg("Volume") / 1e6).as("volume_m"))
      .orderBy("Year", "Quarter")
}
