package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the engine.
  *
  * The reference normalizes inferred pandas dtypes into one fact-table shape
  * (reference: preprocess_stocks.py:141-176); here that normalization IS the
  * schema — applied explicitly, never inferred (SURVEY §1.4).
  */
object Schemas {

  /** Raw stock CSV columns after the Vietnamese→English rename
    * (reference: preprocess_stocks.py:86-99 COL_MAP). Everything is read as
    * string; typed parsing is a separate, testable stage (etl.Parsers).
    */
  val rawRenamed: Seq[(String, String)] = Seq(
    "Ngày"        -> "Date",
    "Lần cuối"    -> "Close",
    "Mở"          -> "Open",
    "Cao"         -> "High",
    "Thấp"        -> "Low",
    "KL"          -> "Volume",
    "% Thay đổi"  -> "ChangePercent"
  )

  /** `events` testdata table. `ts` is declared LongType so the raw INT64
    * payload reads unchanged whatever timestamp unit the file carries
    * (testdata generations have shipped both TIMESTAMP(NANOS) and
    * timestamp[us]); the actual unit is read from the parquet footer and
    * normalized to epoch MICROSECONDS at the read boundary by
    * [[graft.sources.EventsTs]] — never assumed from a comment. All code
    * past the read boundary sees `ts` as epoch-µs.
    */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Cleaned fact table (reference: cleaned/All.csv; SURVEY §1.2). */
  val stockFact: StructType = StructType(Seq(
    StructField("Date", DateType, nullable = true),
    StructField("Close", DoubleType, nullable = true),
    StructField("Open", DoubleType, nullable = true),
    StructField("High", DoubleType, nullable = true),
    StructField("Low", DoubleType, nullable = true),
    StructField("Volume", LongType, nullable = true),
    StructField("ChangePercent", DoubleType, nullable = true),
    StructField("Ticker", StringType, nullable = true),
    StructField("Return", DoubleType, nullable = true),
    StructField("Average", DoubleType, nullable = true),
    StructField("Volatility", DoubleType, nullable = true),
    StructField("LogReturn", DoubleType, nullable = true)
  ))
}

/** Typed view of a cleaned stock bar — optional sugar at the ETL boundary
  * (SURVEY §1.4); analytics stay in untyped DataFrame + Column algebra.
  */
case class StockBar(
    Date: java.sql.Date,
    Close: Option[Double],
    Open: Option[Double],
    High: Option[Double],
    Low: Option[Double],
    Volume: Option[Long],
    ChangePercent: Option[Double],
    Ticker: String,
    Return: Option[Double],
    Average: Option[Double],
    Volatility: Option[Double],
    LogReturn: Option[Double]
)
