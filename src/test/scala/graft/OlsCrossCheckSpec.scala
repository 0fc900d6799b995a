package graft

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.functions._

import graft.etl.CleanPipeline
import graft.mining.{MiningPipelines, Ols}

/** Cross-validation of the closed-form OLS (exact decimal moment sums +
  * normal-equation solve) against spark.ml's iterative LinearRegression —
  * two entirely different algorithms must land on the same coefficients.
  */
class OlsCrossCheckSpec extends SparkSpec {

  test("closed-form OLS == spark.ml LinearRegression on HVN") {
    val fact = CleanPipeline.clean(spark, s"$refDir/stock_data")
      .filter(col("Ticker") === "HVN").cache()
    val closed = Ols.fit(fact, "Ticker",
      MiningPipelines.SameDayFeatures, "Close").head

    val assembled = new VectorAssembler()
      .setInputCols(MiningPipelines.SameDayFeatures.toArray)
      .setOutputCol("fv").transform(fact.na.drop())
    val ml = new LinearRegression()
      .setFeaturesCol("fv").setLabelCol("Close")
      .setRegParam(0.0).setElasticNetParam(0.0)
      .setSolver("normal") // exact least squares, no SGD noise
      .fit(assembled)

    assert(math.abs(closed.intercept - ml.intercept)
      <= 1e-6 * math.max(1.0, math.abs(ml.intercept)),
      s"intercept ${closed.intercept} vs ${ml.intercept}")
    closed.coefs.zip(ml.coefficients.toArray).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(1e-6, math.abs(b)),
        s"coef $a vs $b")
    }
    val mlR2 = ml.summary.r2
    assert(math.abs(closed.r2 - mlR2) < 1e-9, s"r2 ${closed.r2} vs $mlR2")
  }
}
