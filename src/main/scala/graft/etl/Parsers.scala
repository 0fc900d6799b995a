package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The reference's per-cell Python parsers (its entire "UDF surface"),
  * re-expressed as built-in, codegen-friendly Column expressions — no UDFs,
  * so Catalyst folds/pushes them and whole-stage codegen applies at 100 TB.
  *
  * Semantics pinned to the reference:
  *  - parse_volume   (reference: preprocess_stocks.py:19-45)
  *  - parse_percent  (reference: preprocess_stocks.py:48-57)
  *  - parse_number   (reference: preprocess_stocks.py:60-69)
  *  - parse_date     (reference: preprocess_stocks.py:72-83)
  */
object Parsers {

  /** Null tokens shared by every parser: "", "-", "—" (em dash), "nan". */
  private def nullToken(trimmed: Column): Column =
    trimmed.isNull || trimmed.isin("", "-", "—", "nan", "NaN", "null", "None")

  private def stripped(c: Column): Column =
    regexp_replace(trim(c), "[,\\s]", "")

  /** F1: "903.30K" → 903300L, "1.95M" → 1950000L, "2.90K" → 2900L (truncate
    * toward zero, matching Python int()), "—" → null, garbage → null.
    * K/k=1e3, M/m=1e6, B/b=1e9.
    */
  def parseVolume(c: Column): Column = {
    val s = stripped(c)
    val num = regexp_extract(s, "^(-?[0-9.]+)([KkMmBb]?)$", 1)
    val suffix = upper(regexp_extract(s, "^(-?[0-9.]+)([KkMmBb]?)$", 2))
    val mult = when(suffix === "K", 1e3)
      .when(suffix === "M", 1e6)
      .when(suffix === "B", 1e9)
      .otherwise(1.0)
    // cast(double) of a malformed number yields null (matches except→None);
    // cast(long) truncates toward zero (matches Python int()).
    val value = (when(num === "", lit(null).cast(DoubleType))
      .otherwise(num.cast(DoubleType)) * mult).cast(LongType)
    when(nullToken(trim(c)), lit(null).cast(LongType)).otherwise(value)
  }

  /** F2: "-2.41%" → -2.41, null tokens → null, garbage → null. */
  def parsePercent(c: Column): Column = {
    val s = regexp_replace(stripped(c), "%", "")
    when(nullToken(trim(c)), lit(null).cast(DoubleType))
      .otherwise(s.cast(DoubleType))
  }

  /** F3: "36,500.0" → 36500.0, null tokens → null, garbage → null. */
  def parseNumber(c: Column): Column =
    when(nullToken(trim(c)), lit(null).cast(DoubleType))
      .otherwise(stripped(c).cast(DoubleType))

  /** F4: day-first date parse. The data is uniformly dd/MM/yyyy; accept a few
    * robustness fallbacks like the reference's dateutil path.
    */
  def parseDate(c: Column): Column = {
    val t = trim(c)
    when(nullToken(t), lit(null).cast("date")).otherwise(coalesce(
      try_to_date(t, "dd/MM/yyyy"),
      try_to_date(t, "d/M/yyyy"),
      try_to_date(t, "yyyy-MM-dd"),
      try_to_date(t, "dd-MM-yyyy")
    ))
  }
}
