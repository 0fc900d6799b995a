package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One catalog entry: a Spark query over the testdata star schema plus (where
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver hash-compares
  * against (SURVEY §5 item 3). Column names/ordering must match exactly.
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Load one testdata table. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Load the events table with `ts` normalized to epoch MICROSECONDS —
    * the footer-driven read (sources.EventsTs) that survives testdata
    * unit changes instead of trusting a declared unit.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    graft.sources.EventsTs.read(spark, dir)

  /** Cross-engine deterministic rounding. Spark's round() goes through
    * BigDecimal.valueOf (decimal-string semantics) while DuckDB rounds the
    * binary double — they disagree on values like 2.675. floor(x*1eN+0.5)/1eN
    * is the same IEEE op sequence in both engines, so results are
    * bit-identical as long as the unrounded inputs agree to well below the
    * rounding granularity. Pick N so granularity stays ≥ ~1e6× the expected
    * cross-engine error: r2 for price-magnitude values (~1e4), r4/r6 for
    * O(1) ratios.
    *
    * Domain: |x|·10^N must stay below ~9.2e18 — Spark's floor returns LONG
    * and saturates there, while DuckDB's floor stays double (observed on an
    * exp() blow-up at sf0.001). Keep rounded expressions numerically
    * bounded.
    */
  def r2(c: Column): Column = floor(c * 1e2 + lit(0.5)) / 1e2
  def r4(c: Column): Column = floor(c * 1e4 + lit(0.5)) / 1e4
  def r6(c: Column): Column = floor(c * 1e6 + lit(0.5)) / 1e6

  /** Same rounding, DuckDB spelling. */
  def sqlR2(e: String): String = s"floor(($e)*1e2+0.5)/1e2"
  def sqlR4(e: String): String = s"floor(($e)*1e4+0.5)/1e4"
  def sqlR6(e: String): String = s"floor(($e)*1e6+0.5)/1e6"

  /** Order-independent exact sum: per-row doubles are bit-identical across
    * engines, casting them to DECIMAL(28,6) is deterministic, and decimal
    * addition is exact — so the sum is bit-identical no matter how either
    * engine partitions/orders the data. Cast back to double at the end.
    */
  def sumE(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double")
  def sqlSumE(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  /** Exact average: exact sum ÷ count, one double division in both engines. */
  def avgE(c: Column): Column = sumE(c) / count(c)
  def sqlAvgE(e: String): String = s"(${sqlSumE(e)} / count($e))"

  /** High-precision variant for O(1) ratio values, where DECIMAL(28,6)'s
    * 1e-6 granularity would visibly truncate: DECIMAL(38,18) keeps the
    * order-independence (decimal addition is exact) with 1e-18 granularity,
    * far below any rounding the result feeds.
    */
  def avgE18(c: Column): Column =
    sum(c.cast("decimal(38,18)")).cast("double") / count(c)
  def sqlAvgE18(e: String): String =
    s"(CAST(sum(CAST(($e) AS DECIMAL(38,18))) AS DOUBLE) / count($e))"
}
