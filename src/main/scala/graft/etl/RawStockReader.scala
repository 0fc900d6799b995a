package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** S1–S4: messy-CSV scan of the raw stock files.
  *
  * Reads the whole directory in one distributed scan (one task per file split,
  * no per-ticker driver loop — the reference's per-ticker glob,
  * preprocess_stocks.py:189-207, becomes partition parallelism) and derives
  * the ticker from the file name (reference: preprocess_stocks.py:131-138).
  */
object RawStockReader {

  /** Read every CSV under `dir` as all-string columns with original headers, adding a
    * `Ticker` column from the file base name. BOM + quoted fields handled by
    * the Spark CSV reader (reference: preprocess_stocks.py:124-127).
    */
  def readRaw(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(s"$dir/*.csv")
      .withColumn(
        "Ticker",
        regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1))
      // skip the merged All.csv if present (reference: datavisualization.py:38-39)
      .filter(col("Ticker") =!= "All")
    renameColumns(df)
  }

  /** P1: Vietnamese→English header rename (reference: preprocess_stocks.py:86-118).
    * Unknown columns pass through unchanged.
    */
  def renameColumns(df: DataFrame): DataFrame = {
    val map = Schemas.rawRenamed.toMap
    val cleaned = df.columns.map { c =>
      val k = c.replace("﻿", "").replace("\n", " ").trim
      col(df.schema(c).name).as(map.getOrElse(k, k))
    }
    df.select(cleaned.toSeq: _*)
  }
}
