package graft

import org.apache.spark.sql.functions._

import graft.etl.{CleanPipeline, Parsers}
import graft.model.Schemas

/** Golden E2E: raw stock_data CSVs → cleaned fact table must match the
  * reference's checked-in cleaned/All.csv (SURVEY §5 test plan, item 1).
  */
class EtlGoldenSpec extends SparkSpec {

  test("ETL output matches golden cleaned/All.csv") {
    val got = CleanPipeline.clean(spark, s"$refDir/stock_data")
    val want = spark.read
      .option("header", "true")
      .schema(Schemas.stockFact)
      .csv(s"$refDir/cleaned/All.csv")
    assertSameData(got, want, Seq("Ticker", "Date"))
  }

  test("parser unit semantics (FIXTURES §5)") {
    import spark.implicits._
    val df = Seq(
      ("1.5M", "-2.41%", "36,500.0", "26/09/2025"),
      ("903.30K", "0.00%", "59,700", "01/01/2024"),
      ("2.90K", "—", "—", "31/12/2024"),
      ("—", "-", "-", "—"),
      ("1.95M", "6.94%", "17,200.00", "2/1/2024")
    ).toDF("vol", "pct", "num", "date")
    val r = df.select(
      Parsers.parseVolume($"vol").as("v"),
      Parsers.parsePercent($"pct").as("p"),
      Parsers.parseNumber($"num").as("n"),
      Parsers.parseDate($"date").as("d")
    ).collect()
    assert(r(0).getLong(0) == 1500000L)
    assert(r(0).getDouble(1) == -2.41)
    assert(r(0).getDouble(2) == 36500.0)
    assert(r(0).getDate(3).toString == "2025-09-26")
    assert(r(1).getLong(0) == 903300L)
    assert(r(1).getDouble(1) == 0.0)
    assert(r(1).getDouble(2) == 59700.0)
    assert(r(2).getLong(0) == 2900L)
    assert(r(2).isNullAt(1) && r(2).isNullAt(2))
    assert(r(2).getDate(3).toString == "2024-12-31")
    assert(r(3).isNullAt(0) && r(3).isNullAt(1) && r(3).isNullAt(2) && r(3).isNullAt(3))
    assert(r(4).getLong(0) == 1950000L)
    assert(r(4).getDate(3).toString == "2024-01-02")
  }

  test("Open==0 guards Return/LogReturn to null") {
    import spark.implicits._
    val df = Seq((0.0, 10.0), (10.0, 11.0)).toDF("Open", "Close")
      .withColumn("High", lit(1.0)).withColumn("Low", lit(1.0))
    val r = CleanPipeline.derive(df).orderBy("Open").collect()
    assert(r(0).isNullAt(r(0).fieldIndex("Return")))
    assert(r(0).isNullAt(r(0).fieldIndex("LogReturn")))
    assert(math.abs(r(1).getAs[Double]("Return") - 10.0) < 1e-12)
  }
}
