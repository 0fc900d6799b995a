package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The ETL: raw strings → typed fact table with derived columns
  * (reference: preprocess_stocks.py clean_file/process_all, :121-230).
  *
  * Everything is a single narrow projection over the scan — no shuffle at all
  * until the final (optional) sort, so at 100 TB this is one embarrassingly
  * parallel pass whose parsers live inside whole-stage codegen.
  */
object CleanPipeline {

  /** Typed parse of the renamed raw columns (F1–F4). */
  def parse(raw: DataFrame): DataFrame =
    raw.select(
      Parsers.parseDate(col("Date")).as("Date"),
      Parsers.parseNumber(col("Close")).as("Close"),
      Parsers.parseNumber(col("Open")).as("Open"),
      Parsers.parseNumber(col("High")).as("High"),
      Parsers.parseNumber(col("Low")).as("Low"),
      Parsers.parseVolume(col("Volume")).as("Volume"),
      Parsers.parsePercent(col("ChangePercent")).as("ChangePercent"),
      col("Ticker")
    )

  /** F5–F8 derived columns, with the reference's null/zero guards
    * (preprocess_stocks.py:165-176).
    */
  def derive(df: DataFrame): DataFrame = {
    val open = col("Open")
    val close = col("Close")
    val openOk = open.isNotNull && close.isNotNull && open =!= 0.0
    df
      .withColumn(
        "Return",
        when(openOk, (close - open) / open * 100.0).cast(DoubleType))
      .withColumn("Average", (col("High") + col("Low")) / 2.0)
      .withColumn("Volatility", col("High") - col("Low"))
      .withColumn(
        "LogReturn",
        when(openOk && close > 0.0 && open > 0.0, log(close) - log(open))
          .cast(DoubleType))
  }

  /** Full pipeline: raw dir → cleaned fact table (sorted by Ticker, Date —
    * reference sorts each per-ticker frame by Date, preprocess_stocks.py:180).
    */
  def clean(spark: SparkSession, rawDir: String): DataFrame =
    derive(parse(RawStockReader.readRaw(spark, rawDir)))
      .filter(col("Date").isNotNull)
      .orderBy("Ticker", "Date")

  /** S5–S6 sinks: per-ticker files + the unified table. On a cluster this is
    * one partitioned write, not N driver-side loops.
    */
  def writeCleaned(df: DataFrame, outDir: String): Unit = {
    // partitionBy drops the partition column from the data files, but the
    // reference's per-ticker CSVs keep Ticker as a data column
    // (preprocess_stocks.py:183-184) — partition on a duplicate so each
    // per-ticker file carries the full reference schema
    df.withColumn("__ticker_dir", col("Ticker"))
      .write.mode("overwrite")
      .partitionBy("__ticker_dir")
      .option("header", "true")
      .csv(s"$outDir/per_ticker")
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .csv(s"$outDir/all")
  }
}
