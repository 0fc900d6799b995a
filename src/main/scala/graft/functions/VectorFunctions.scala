package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the similarity hot path: the sequential
  * dot product of two double arrays.
  *
  * The higher-order form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` builds
  * per-row intermediate arrays and evaluates lambda closures per element;
  * this expression compiles to one fused loop in whole-stage codegen.
  * Fold-order is the same left-to-right sequence, so results are
  * BIT-IDENTICAL to the higher-order form (VectorFunctionsSpec asserts
  * exact equality) — oracle-checked queries can switch freely.
  *
  * Charter preference (b): a custom Expression where built-ins can't give
  * the per-row kernel, well before any custom physical plan.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL literal
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
        int $n = $a.numElements();
        boolean $bad = ($n != $b.numElements());
        double $sum = 0.0;
        if (!$bad) {
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            $sum += $a.getDouble($i) * $b.getDouble($i);
          }
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for the PQ hot path: the sequential squared
  * L2 distance between two double arrays — `sum += (x-y)*(x-y)` left to
  * right, the exact op sequence of the higher-order form
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, _+_)` (and of
  * DuckDB's ordered `list_sum` replay), so results are BIT-IDENTICAL and
  * oracle-checked queries can switch freely. Null semantics mirror the
  * HOF chain: null array, length mismatch, or any null element → null;
  * empty arrays → 0.0.
  */
case class SqDistFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sqdist expects (array<double>, array<double>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val d = ctx.freshName("d")
      s"""
        int $n = $a.numElements();
        boolean $bad = ($n != $b.numElements());
        double $sum = 0.0;
        if (!$bad) {
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            double $d = $a.getDouble($i) - $b.getDouble($i);
            $sum += $d * $d;
          }
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistFold =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for the ADC scan: the per-row asymmetric
  * distance `sum_i dtab[i][codes[i]]` — the fused form of
  * `aggregate(zip_with(codes, dtab, (code, ds) -> element_at(ds, code+1)),
  * 0.0, _+_)`. Per-element lookup semantics replicate non-ANSI
  * `element_at(ds, code+1)` exactly (1-based, negative = from the end,
  * out-of-bounds → null) and the fold replicates the HOF chain's null
  * semantics (null array / length mismatch / any null element or lookup
  * → null; empty → 0.0), so results are BIT-IDENTICAL — addition order
  * is the same left-to-right sequence.
  */
case class AdcFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def okCodes(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    def okTab(t: DataType) = t match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (okCodes(left.dataType) && okTab(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_adc expects (array<int>, array<array<double>>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tab = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != tab.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || tab.isNullAt(i)) return null
      val ds = tab.getArray(i)
      val idx = codes.getInt(i) + 1 // element_at's 1-based index
      if (idx == 0) throw new IllegalArgumentException(
        "SQL array indices start at 1") // element_at(_, 0) errors even non-ANSI
      val len = ds.numElements()
      val j = if (idx > 0) idx - 1 else len + idx // negative = from end
      if (j < 0 || j >= len || ds.isNullAt(j)) return null
      sum += ds.getDouble(j)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val ds = ctx.freshName("ds")
      val idx = ctx.freshName("idx")
      val len = ctx.freshName("len")
      val jj = ctx.freshName("jj")
      s"""
        int $n = $a.numElements();
        boolean $bad = ($n != $b.numElements());
        double $sum = 0.0;
        if (!$bad) {
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            org.apache.spark.sql.catalyst.util.ArrayData $ds =
              $b.getArray($i);
            int $idx = $a.getInt($i) + 1;
            if ($idx == 0) throw new IllegalArgumentException(
              "SQL array indices start at 1");
            int $len = $ds.numElements();
            int $jj = ($idx > 0) ? ($idx - 1) : ($len + $idx);
            if ($jj < 0 || $jj >= $len || $ds.isNullAt($jj)) {
              $bad = true; break;
            }
            $sum += $ds.getDouble($jj);
          }
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcFold =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Idempotent per-session registration of the native functions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sqdist", exprs => SqDistFold(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adc", exprs => AdcFold(exprs(0), exprs(1)), "built-in")
  }

  /** Column API for the native dot product (requires register()). */
  def dotProduct(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }
}
