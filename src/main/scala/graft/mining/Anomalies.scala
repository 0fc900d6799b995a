package graft.mining

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.StockWindows

/** M4 (reference: datamining_analysis.py:125-131): per-ticker z-score
  * anomaly flagging — pure window + filter, fully oracle-checkable.
  */
object Anomalies {

  /** Rows whose |z(src)| exceeds `threshold` per ticker, with the score
    * appended, sorted by (Ticker, Date) like the golden 04_anomalies.csv.
    */
  def detect(df: DataFrame, threshold: Double = 2.0,
      src: String = "Close"): DataFrame =
    StockWindows.withZScore(df, src)
      .filter(abs(col("Z_Score")) > threshold)
      .orderBy("Ticker", "Date")
}
