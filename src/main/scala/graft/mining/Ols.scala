package graft.mining

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** M1/M2/M5 (reference: datamining_analysis.py:43-100): per-group
  * multi-feature OLS, computed Spark-first as ONE distributed aggregation of
  * exact moment sums (Σxᵢxⱼ, Σxᵢy, Σy, Σy², n — accumulated in DECIMAL so
  * they are order-independent and cancellation-free), followed by a tiny
  * (p+1)×(p+1) normal-equation solve per group on the driver.
  *
  * Scale: the shuffle carries G×O(p²) doubles (G = #groups) — at 100 TB the
  * heavy lifting (the moment sums) stays fully distributed and map-side
  * combined; only the p³ solve per group runs on the driver, which holds to
  * ~10⁵ groups. (A `TypedImperativeAggregate` could move the solve into the
  * reduce step; unnecessary at the reference's G=6.)
  */
object Ols {

  final case class Fit(
      group: String, coefs: Array[Double], intercept: Double,
      r2: Double, mse: Double, n: Long)

  // scale 16: quantizes O(1) z-scaled products near machine epsilon (a
  // coarser scale measurably perturbs the Gram matrix → test-MSE drift),
  // while 22 integer digits still hold price-scale product sums.
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(38,16)")).cast("double")

  /** Compute per-group OLS of `target ~ features`. Returns one Fit per
    * group, ordered by r2 desc (reference sorts results by R²,
    * datamining_analysis.py:62).
    */
  def fit(df: DataFrame, groupCol: String, features: Seq[String],
      target: String, filterExpr: Option[Column] = None): Seq[Fit] = {
    val d = filterExpr.map(df.filter).getOrElse(df)
      .na.drop(features :+ target)
    val p = features.length
    // moment columns: upper triangle of X'X (with intercept col), X'y, y'y
    val cols = scala.collection.mutable.ArrayBuffer[Column](
      count(lit(1)).as("n"))
    for (i <- 0 until p) cols += dsum(col(features(i))).as(s"sx$i")
    for (i <- 0 until p; j <- i until p)
      cols += dsum(col(features(i)) * col(features(j))).as(s"sxx${i}_$j")
    for (i <- 0 until p) cols += dsum(col(features(i)) * col(target)).as(s"sxy$i")
    cols += dsum(col(target)).as("sy")
    cols += dsum(col(target) * col(target)).as("syy")
    val rows = d.groupBy(groupCol).agg(cols.head, cols.tail.toSeq: _*).collect()
    rows.map(solveRow(_, p)).sortBy(f => (-f.r2, f.group)).toSeq
  }

  private def solveRow(r: Row, p: Int): Fit = {
    val group = r.get(0).toString
    var k = 1
    val n = r.getLong(k); k += 1
    val sx = Array.fill(p) { val v = r.getDouble(k); k += 1; v }
    val sxx = Array.ofDim[Double](p, p)
    for (i <- 0 until p; j <- i until p) {
      sxx(i)(j) = r.getDouble(k); sxx(j)(i) = sxx(i)(j); k += 1
    }
    val sxy = Array.fill(p) { val v = r.getDouble(k); k += 1; v }
    val sy = r.getDouble(k); k += 1
    val syy = r.getDouble(k)
    // centered normal equations: C β = c, intercept = ȳ − β·x̄
    val nn = n.toDouble
    val c = Array.tabulate(p, p)((i, j) => sxx(i)(j) - sx(i) * sx(j) / nn)
    val cv = Array.tabulate(p)(i => sxy(i) - sx(i) * sy / nn)
    val beta = solve(c, cv)
    val xbar = sx.map(_ / nn)
    val ybar = sy / nn
    val intercept = ybar - (0 until p).map(i => beta(i) * xbar(i)).sum
    // SSE from centered moments: Syy_c − 2β·c + β'Cβ
    val syyC = syy - sy * sy / nn
    val bc = (0 until p).map(i => beta(i) * cv(i)).sum
    val bcb = (for (i <- 0 until p; j <- 0 until p)
      yield beta(i) * c(i)(j) * beta(j)).sum
    val sse = math.max(0.0, syyC - 2 * bc + bcb)
    val r2 = 1.0 - sse / syyC
    Fit(group, beta, intercept, r2, sse / nn, n)
  }

  /** M2 variant: fit on each group's chronological train rows, score on its
    * test rows (reference: datamining_analysis.py:67-100). `isTrain` must
    * already be present (analytics.StockWindows.withTrainTestSplit) and
    * features already scaled (Scaling.standardize). Still ONE distributed
    * aggregation: train and test moment sums side by side via conditional
    * aggregation; per-group solve + closed-form test SSE on the driver.
    */
  def fitSplit(df: DataFrame, groupCol: String, features: Seq[String],
      target: String, isTrain: Column): Seq[Fit] = {
    val d = df.na.drop(features :+ target)
    val p = features.length
    def tsum(cond: Column, c: Column) = dsum(when(cond, c))
    val tr = isTrain
    val te = !isTrain
    val cols = scala.collection.mutable.ArrayBuffer[Column](
      sum(when(tr, 1L).otherwise(0L)).as("n_tr"),
      sum(when(te, 1L).otherwise(0L)).as("n_te"))
    // train moments (centered solve happens driver-side)
    for (i <- 0 until p) cols += tsum(tr, col(features(i))).as(s"tr_sx$i")
    for (i <- 0 until p; j <- i until p)
      cols += tsum(tr, col(features(i)) * col(features(j))).as(s"tr_sxx${i}_$j")
    for (i <- 0 until p) cols += tsum(tr, col(features(i)) * col(target)).as(s"tr_sxy$i")
    cols += tsum(tr, col(target)).as("tr_sy")
    // test moments for SSE(γ) = Σy² − 2γ'v + γ'Mγ on augmented (1,x)
    for (i <- 0 until p) cols += tsum(te, col(features(i))).as(s"te_sx$i")
    for (i <- 0 until p; j <- i until p)
      cols += tsum(te, col(features(i)) * col(features(j))).as(s"te_sxx${i}_$j")
    for (i <- 0 until p) cols += tsum(te, col(features(i)) * col(target)).as(s"te_sxy$i")
    cols += tsum(te, col(target)).as("te_sy")
    cols += tsum(te, col(target) * col(target)).as("te_syy")
    val rows = d.groupBy(groupCol).agg(cols.head, cols.tail.toSeq: _*).collect()
    rows.map { r =>
      val group = r.get(0).toString
      var k = 1
      val nTr = r.getLong(k); k += 1
      val nTe = r.getLong(k); k += 1
      def take(): Double = { val v = r.getDouble(k); k += 1; v }
      val sx = Array.fill(p)(take())
      val sxx = Array.ofDim[Double](p, p)
      for (i <- 0 until p; j <- i until p) {
        sxx(i)(j) = take(); sxx(j)(i) = sxx(i)(j)
      }
      val sxy = Array.fill(p)(take())
      val sy = take()
      val teSx = Array.fill(p)(take())
      val teSxx = Array.ofDim[Double](p, p)
      for (i <- 0 until p; j <- i until p) {
        teSxx(i)(j) = take(); teSxx(j)(i) = teSxx(i)(j)
      }
      val teSxy = Array.fill(p)(take())
      val teSy = take()
      val teSyy = take()
      // fit on train (centered)
      val nn = nTr.toDouble
      val cM = Array.tabulate(p, p)((i, j) => sxx(i)(j) - sx(i) * sx(j) / nn)
      val cv = Array.tabulate(p)(i => sxy(i) - sx(i) * sy / nn)
      val beta = solve(cM, cv)
      val a = sy / nn - (0 until p).map(i => beta(i) * sx(i) / nn).sum
      // score on test
      val m = nTe.toDouble
      var sse = teSyy + m * a * a - 2 * a * teSy
      for (i <- 0 until p) {
        sse += 2 * a * beta(i) * teSx(i) - 2 * beta(i) * teSxy(i)
        for (j <- 0 until p) sse += beta(i) * teSxx(i)(j) * beta(j)
      }
      val sst = teSyy - teSy * teSy / m
      Fit(group, beta, a, 1.0 - sse / sst, sse / m, nTe)
    }.sortBy(f => (-f.r2, f.group)).toSeq
  }

  /** Gaussian elimination with partial pivoting — p is tiny (≤ ~10). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val p = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (i <- 0 until p) {
      val piv = (i until p).maxBy(r => math.abs(a(r)(i)))
      val (ta, tb) = (a(piv), b(piv)); a(piv) = a(i); b(piv) = b(i)
      a(i) = ta; b(i) = tb
      for (r <- i + 1 until p) {
        val f = a(r)(i) / a(i)(i)
        for (cI <- i until p) a(r)(cI) -= f * a(i)(cI)
        b(r) -= f * b(i)
      }
    }
    val x = new Array[Double](p)
    for (i <- p - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until p) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }

  /** Fits as a DataFrame shaped like the golden regression tables:
    * (group, R2_Score, MSE, Intercept) ordered by R² desc.
    */
  def fitTable(spark: org.apache.spark.sql.SparkSession, fits: Seq[Fit],
      groupName: String): DataFrame = {
    import spark.implicits._
    fits.map(f => (f.group, f.r2, f.mse, f.intercept))
      .toDF(groupName, "R2_Score", "MSE", "Intercept")
  }
}
