package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.CleanPipeline
import graft.mining.MiningPipelines
import graft.olap.{OlapQueries, TimeDims}

/** Golden E2E (SURVEY §5 item 1): every OLAP + mining result table must
  * match the reference's checked-in CSVs from olap_results/ and
  * datamining_results/.
  */
class GoldenResultsSpec extends SparkSpec {

  lazy val fact: DataFrame = {
    val f = TimeDims.withTimeDims(
      TimeDims.fromYear(CleanPipeline.clean(spark, s"$refDir/stock_data"), 2024))
    f.cache()
    f
  }
  lazy val ts: Seq[String] = OlapQueries.tickers(fact)

  private def golden(name: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(s"$refDir/$name")

  test("01_quarterly_price") {
    val want = golden("olap_results/01_quarterly_price.csv", StructType(
      Seq(StructField("Year", IntegerType), StructField("Quarter", IntegerType)) ++
        ts.map(t => StructField(t, DoubleType))))
    assertSameData(OlapQueries.quarterlyPrice(fact, ts), want,
      Seq("Year", "Quarter"))
  }

  test("02_growth_24_25") {
    val want = golden("olap_results/02_growth_24_25.csv", StructType(Seq(
      StructField("Ticker", StringType), StructField("2024", DoubleType),
      StructField("2025", DoubleType),
      StructField("Growth 24-25 (%)", DoubleType))))
    assertSameData(OlapQueries.yearlyGrowth(fact), want, Seq("Ticker"))
  }

  test("03_monthly_volume") {
    val want = golden("olap_results/03_monthly_volume.csv", StructType(
      Seq(StructField("Year", IntegerType), StructField("Month", IntegerType)) ++
        ts.map(t => StructField(t, LongType))))
    assertSameData(OlapQueries.monthlyVolume(fact, ts), want,
      Seq("Year", "Month"))
  }

  test("04_stats_2025") {
    val want = golden("olap_results/04_stats_2025.csv", StructType(Seq(
      StructField("Ticker", StringType), StructField("Gia_TB", DoubleType),
      StructField("Volume_TB", DoubleType),
      StructField("Bien_Dong_Std", DoubleType),
      StructField("Bien_Dong_Pct (%)", DoubleType))))
    assertSameData(OlapQueries.stats(fact, 2025), want, Seq("Ticker"))
  }

  val regSchema = StructType(Seq(
    StructField("Ticker", StringType), StructField("R2_Score", DoubleType),
    StructField("MSE", DoubleType), StructField("Intercept", DoubleType)))

  test("01_regression_same_day") {
    val want = golden("datamining_results/01_regression_same_day.csv", regSchema)
    assertSameData(MiningPipelines.regressionSameDay(spark, fact), want,
      Seq("Ticker"), tol = 1e-6)
  }

  test("02_regression_next_day") {
    val want = golden("datamining_results/02_regression_next_day.csv", regSchema)
    assertSameData(MiningPipelines.regressionNextDay(spark, fact), want,
      Seq("Ticker"), tol = 1e-6)
  }

  test("03_kmeans_clusters partition equality") {
    val want = golden("datamining_results/03_kmeans_clusters.csv",
      StructType(Seq(
        StructField("Ticker", StringType), StructField("Return", DoubleType),
        StructField("Volume", DoubleType), StructField("Cluster", IntegerType))))
      .collect().map(r => r.getString(0) -> r.getInt(3)).toMap
    val got = MiningPipelines.kmeansClusters(spark, fact)
      .collect().map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(got.keySet == want.keySet)
    // same partition up to label renaming
    val mapping = scala.collection.mutable.Map[Int, Int]()
    got.foreach { case (t, c) =>
      val w = want(t)
      assert(mapping.getOrElseUpdate(c, w) == w,
        s"cluster partition mismatch at $t: got label $c ↦ ${mapping(c)}, want $w")
    }
    assert(mapping.values.toSet.size == mapping.size, "labels not bijective")
  }

  test("03_kmeans feature values") {
    val want = golden("datamining_results/03_kmeans_clusters.csv",
      StructType(Seq(
        StructField("Ticker", StringType), StructField("Return", DoubleType),
        StructField("Volume", DoubleType), StructField("Cluster", IntegerType))))
      .select("Ticker", "Return", "Volume")
    assertSameData(
      MiningPipelines.kmeansClusters(spark, fact).select("Ticker", "Return", "Volume"),
      want, Seq("Ticker"))
  }

  test("04_anomalies") {
    val want = golden("datamining_results/04_anomalies.csv", StructType(
      graft.model.Schemas.stockFact.fields.toSeq :+
        StructField("Z_Score", DoubleType)))
    val got = MiningPipelines.anomalies(fact)
      .drop("Year", "Month", "Quarter", "YearMonth")
    assertSameData(got, want, Seq("Ticker", "Date"))
  }
}
