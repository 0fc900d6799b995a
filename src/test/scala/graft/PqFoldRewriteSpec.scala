package graft

import org.apache.spark.sql.functions._

import graft.functions.{AdcFold, PqFoldRewrite, SqDistFold}

/** Optimizer-rule coverage (functions.PqFoldRewrite): the PQ family's two
  * per-row higher-order folds — squared-L2 and the ADC table lookup —
  * rewrite to the native codegen'd SqDistFold/AdcFold with bit-identical
  * results on every null/shape edge case (the property that keeps the
  * oracle hashes of every PQ gate unchanged).
  */
class PqFoldRewriteSpec extends SparkSpec {

  private def hofSqDist = aggregate(
    zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
    lit(0.0), _ + _)

  private def hofAdc = aggregate(
    zip_with(col("codes"), col("dtab"),
      (code, ds) => element_at(ds, code + 1)),
    lit(0.0), _ + _)

  private lazy val sqDf = {
    import spark.implicits._
    Seq[(Int, Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])](
      (0, Some(Seq(Some(1.5), Some(2.5))), Some(Seq(Some(2.0), Some(4.0)))),
      (1, Some(Seq(Some(1.0))), Some(Seq(Some(2.0), Some(3.0)))), // len diff
      (2, Some(Seq(Some(1.0), None)), Some(Seq(Some(2.0), Some(3.0)))), // ∅ el
      (3, Some(Seq.empty), Some(Seq.empty)), // empty → 0.0
      (4, None, Some(Seq(Some(1.0)))) // null array
    ).toDF("id", "a", "b")
      .repartition(2) // keep expressions out of ConvertToLocalRelation
  }

  private lazy val adcDf = {
    import spark.implicits._
    Seq[(Int, Option[Seq[Option[Int]]], Option[Seq[Option[Seq[Double]]]])](
      (0, Some(Seq(Some(1), Some(0))),
        Some(Seq(Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))))), // 2.0 + 3.0
      (1, Some(Seq(Some(2))), Some(Seq(Some(Seq(1.0))))), // OOB → null
      (2, Some(Seq(Some(0), None)),
        Some(Seq(Some(Seq(1.0)), Some(Seq(2.0))))), // null code → null
      (3, Some(Seq.empty), Some(Seq.empty)), // empty → 0.0
      (4, None, Some(Seq(Some(Seq(1.0))))), // null array → null
      (5, Some(Seq(Some(0))), Some(Seq(Some(Seq(1.0)), Some(Seq(2.0))))),
      // len diff → null
      (6, Some(Seq(Some(-2), Some(-4))),
        Some(Seq(Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))))
      // negative index = from the end: code -2 → element_at(-1) →
      // ds[last] = 2.0; code -4 → element_at(-3) → out of bounds → null
      // (code -1 → element_at(0) throws in BOTH forms — unreachable from
      // PQ codes, which are ≥ 0 by construction)
    ).toDF("id", "codes", "dtab")
      .repartition(2)
  }

  private def withoutRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ eq PqFoldRewrite)
    try body finally spark.experimental.extraOptimizations = prev
  }

  test("rewrites the sqdist and ADC folds to the native expressions") {
    PqFoldRewrite.install(spark)
    val q1 = sqDf.select(hofSqDist.as("d"))
    assert(q1.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: SqDistFold => d }).size == 1)
    assert(q1.queryExecution.analyzed.expressions
      .flatMap(_.collect { case d: SqDistFold => d }).isEmpty)
    val q2 = adcDf.select(hofAdc.as("s"))
    assert(q2.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: AdcFold => d }).size == 1)
    assert(q2.queryExecution.analyzed.expressions
      .flatMap(_.collect { case d: AdcFold => d }).isEmpty)
  }

  test("rewritten results are bit-identical to the interpreted HOF folds") {
    PqFoldRewrite.install(spark)
    def bits(rows: Array[org.apache.spark.sql.Row]): Seq[Option[Long]] =
      rows.sortBy(_.getInt(0)).map(r =>
        if (r.isNullAt(1)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1)))).toSeq
    val sqGot = bits(sqDf.select(col("id"), hofSqDist.as("d")).collect())
    val sqExp = withoutRule(
      bits(sqDf.select(col("id"), hofSqDist.as("d")).collect()))
    assert(sqGot == sqExp, s"sqdist: $sqGot vs $sqExp")
    assert(sqGot(0) ==
      Some(java.lang.Double.doubleToRawLongBits(0.25 + 2.25)))
    assert(sqGot(1).isEmpty && sqGot(2).isEmpty && sqGot(4).isEmpty)
    assert(sqGot(3) == Some(0L))
    val adcGot = bits(adcDf.select(col("id"), hofAdc.as("s")).collect())
    val adcExp = withoutRule(
      bits(adcDf.select(col("id"), hofAdc.as("s")).collect()))
    assert(adcGot == adcExp, s"adc: $adcGot vs $adcExp")
    assert(adcGot(0) == Some(java.lang.Double.doubleToRawLongBits(5.0)))
    assert(adcGot(1).isEmpty && adcGot(2).isEmpty && adcGot(4).isEmpty &&
      adcGot(5).isEmpty)
    assert(adcGot(3) == Some(0L))
  }

  test("Pq.encode is value-identical with and without the rule") {
    PqFoldRewrite.install(spark)
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j => (i * 31 + j * 7 % 13) / 3.0))
    }.toDF("vid", "v").repartition(2)
    val cb = graft.similarity.Pq.trainCodebooks(vecs, "vid", "v", 8, 2, 4)
    def run() = graft.similarity.Pq.encode(vecs, "vid", "v", 8, cb, 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1).toSeq
    assert(run() == withoutRule(run()))
  }

  test("install is idempotent and GraftExtensions wires the rule") {
    PqFoldRewrite.install(spark)
    PqFoldRewrite.install(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ eq PqFoldRewrite) == 1)
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
