package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, DotProductRewrite}

/** Optimizer-rule coverage (functions.DotProductRewrite): the HOF dot
  * product and self-product norm rewrite to the native codegen'd
  * DotProduct, with bit-identical results on every null/shape edge case;
  * config-based injection via graft.GraftExtensions plans the same way.
  */
class DotRewriteSpec extends SparkSpec {

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), _ + _)
  private def hofNorm2 = aggregate(
    transform(col("a"), x => x * x), lit(0.0), _ + _)

  private lazy val edgeDf = {
    import spark.implicits._
    Seq[(Int, Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])](
      (0, Some(Seq(Some(1.5), Some(2.5))), Some(Seq(Some(2.0), Some(4.0)))),
      (1, Some(Seq(Some(1.0))), Some(Seq(Some(2.0), Some(3.0)))), // len diff
      (2, Some(Seq(Some(1.0), None)), Some(Seq(Some(2.0), Some(3.0)))), // ∅ el
      (3, Some(Seq.empty), Some(Seq.empty)), // empty → 0.0
      (4, None, Some(Seq(Some(1.0)))) // null array
    ).toDF("id", "a", "b")
      // a bare local Seq would be CONSTANT-FOLDED by ConvertToLocalRelation
      // before the optimizer batch runs, leaving no expressions to inspect
      .repartition(2)
  }

  test("rewrites the HOF dot product and self-product norm to DotProduct") {
    DotProductRewrite.install(spark)
    val q = edgeDf.select(hofDot.as("dot"), hofNorm2.as("n2"))
    val dots = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: DotProduct => d })
    assert(dots.size == 2, s"expected 2 DotProducts, got: $dots")
    // the analyzed (pre-optimizer) plan still carries the HOF form — the
    // rule, not the parser, performs the substitution
    val pre = q.queryExecution.analyzed.expressions
      .flatMap(_.collect { case d: DotProduct => d })
    assert(pre.isEmpty)
  }

  test("rewritten results are bit-identical to the HOF fold on every " +
    "edge case") {
    DotProductRewrite.install(spark)
    val got = edgeDf.select(col("id"), hofDot.as("dot"), hofNorm2.as("n2"))
      .collect().sortBy(_.getInt(0)).map(r =>
        org.apache.spark.sql.Row(r.get(1), r.get(2)))
    assert(got(0).getDouble(0) == 13.0 && got(0).getDouble(1) == 8.5)
    assert(got(1).isNullAt(0)) // length mismatch → null
    assert(got(2).isNullAt(0) && got(2).isNullAt(1)) // null element → null
    assert(got(3).getDouble(0) == 0.0 && got(3).getDouble(1) == 0.0)
    assert(got(4).isNullAt(0) && got(4).isNullAt(1)) // null array → null
    // and against the native expression called directly
    val direct = edgeDf.select(col("id"),
      graft.functions.VectorFunctions.dotProduct(spark, col("a"), col("b"))
        .as("dot")).collect().sortBy(_.getInt(0)).map(r =>
        org.apache.spark.sql.Row(r.get(1)))
    got.zip(direct).foreach { case (g, d) =>
      assert(g.isNullAt(0) == d.isNullAt(0))
      if (!g.isNullAt(0)) assert(
        java.lang.Double.doubleToRawLongBits(g.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(d.getDouble(0)))
    }
  }

  test("install is idempotent and GraftExtensions wires the rule") {
    DotProductRewrite.install(spark)
    DotProductRewrite.install(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ eq DotProductRewrite) == 1)
    // config-path wiring: applying the extensions class must register
    // cleanly on a fresh SparkSessionExtensions (a second session with
    // spark.sql.extensions can't be built here — getOrCreate would hand
    // back the suite-shared session and silently ignore the config)
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("the rule leaves non-matching folds alone") {
    DotProductRewrite.install(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .repartition(2) // keep the projection out of ConvertToLocalRelation
    // sum seed 1.0 and a sum-of-sums fold must both survive
    val q = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(1.0),
        _ + _).as("seeded"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y), lit(0.0),
        _ + _).as("sums"))
    val dots = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: DotProduct => d })
    assert(dots.isEmpty, s"over-eager rewrite: $dots")
    val r = q.head
    assert(r.getDouble(0) == 12.0 && r.getDouble(1) == 10.0)
  }
}
