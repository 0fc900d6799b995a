package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F9–F10 (reference: olap_analysis.py:32-35, streamlit.py:50-53): derived
  * time dimensions on the fact table — plain columns, no dimension tables.
  */
object TimeDims {
  def withTimeDims(df: DataFrame): DataFrame =
    df.withColumn("Year", year(col("Date")))
      .withColumn("Month", month(col("Date")))
      .withColumn("Quarter", quarter(col("Date")))
      .withColumn("YearMonth", date_format(col("Date"), "yyyy-MM"))

  /** P3 (olap_analysis.py:30): the warehouse's observation-window filter. */
  def fromYear(df: DataFrame, y: Int): DataFrame =
    df.filter(year(col("Date")) >= y)
}
