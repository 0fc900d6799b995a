package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering index for two-column data layout — the
  * locality-preserving alternative to [[ZOrder]] that lakehouse engines
  * (Delta "liquid", Iceberg sort orders) offer for multi-dimensional
  * clustering. Unlike the Morton z-value, whose path teleports across the
  * key space at power-of-two boundaries, consecutive Hilbert indexes are
  * always MANHATTAN-ADJACENT cells, so every contiguous index range is a
  * tighter rectangle in key space ⇒ tighter per-file min/max statistics ⇒
  * fewer files read per selective scan (the only thing that matters for a
  * 100 TB layout decision). HilbertCurveSpec proves the adjacency
  * property exhaustively on a full grid — the property Z-order fails.
  *
  * Algorithm: the classic bitwise xy→d walk (Wikipedia "Hilbert curve",
  * public-domain snippet; also Hamilton's compact-Hilbert-indices TR) —
  * per bit level: take the quadrant, add `s²·((3·rx) XOR ry)` to the
  * index, then rotate/reflect the remaining low bits into the quadrant's
  * frame. The loop is UNROLLED into a static expression chain — `bits`
  * rounds of shift/mask/CASE over longs, no UDF, fully inside whole-stage
  * codegen, and spelled IDENTICALLY for DuckDB from the same constants
  * (the [[ZOrder.sqlZValue]] dual-spelling discipline), so both engines
  * compute the same index bit-for-bit.
  *
  * Scale: a pure projection — zero shuffles here; layout jobs
  * range-partition on the index exactly like [[ZOrder.cluster]].
  */
object HilbertCurve {

  /** Plain-Scala mirror of the unrolled expression — the spec oracle and
    * the documentation of record for the recurrence. Inputs must sit in
    * [0, 2^bits); callers min-max-rank first (the q_zorder_tiles recipe).
    */
  def indexScala(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      val q = if (rx == 1L) 3L - ry else ry // == (3·rx) XOR ry for bits
      d += s * s * q
      val m = s - 1L
      val xm = x & m
      val ym = y & m
      if (ry == 0L) {
        if (rx == 1L) { x = m - ym; y = m - xm }
        else { x = ym; y = xm }
      } else { x = xm; y = ym }
      i -= 1
    }
    d
  }

  /** The Hilbert index of (x, y) as ONE Column expression. Each unrolled
    * round re-reads the previous round's x and y several times, and a
    * Column is an expression TREE, not a DAG — so the tree grows ~3^bits
    * and anything past ~8 bits OOMs the planner. Production callers use
    * [[withIndex]] (a projection CHAIN, the Spark twin of the SQL CTE
    * chain); this form exists for small-grid tests and tiny domains.
    */
  def index(xCol: Column, yCol: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 8,
      s"bits=$bits: the single-expression form blows up ~3^bits — " +
        "use withIndex for wider domains")
    val top = (1L << bits) - 1L
    var x = least(xCol.cast("long"), lit(top))
    var y = least(yCol.cast("long"), lit(top))
    var d = lit(0L)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = shiftright(x, i).bitwiseAND(lit(1L))
      val ry = shiftright(y, i).bitwiseAND(lit(1L))
      val q = when(rx === 1L, lit(3L) - ry).otherwise(ry)
      d = d + lit(s * s) * q
      val m = s - 1L
      val xm = x.bitwiseAND(lit(m))
      val ym = y.bitwiseAND(lit(m))
      val nx = when(ry === 1L, xm)
        .otherwise(when(rx === 1L, lit(m) - ym).otherwise(ym))
      val ny = when(ry === 1L, ym)
        .otherwise(when(rx === 1L, lit(m) - xm).otherwise(xm))
      x = nx
      y = ny
      i -= 1
    }
    d
  }

  /** The Hilbert index as a chained projection: one `withColumns` per bit
    * level over three running columns, every level referencing the
    * previous level's ATTRIBUTES — constant expression size per level,
    * `bits` nested projects total (Catalyst keeps them separate: each
    * alias is non-cheap and multiply-referenced, so CollapseProject
    * leaves the chain alone and codegen evaluates each level once).
    * Appends `out` and leaves `df`'s columns untouched.
    */
  def withIndex(df: org.apache.spark.sql.DataFrame, xExpr: Column,
      yExpr: Column, bits: Int, out: String): org.apache.spark.sql.DataFrame = {
    require(bits >= 1 && bits * 2 <= 62, s"bits out of range: $bits")
    val top = (1L << bits) - 1L
    var d = df
      .withColumn("__hx", least(xExpr.cast("long"), lit(top)))
      .withColumn("__hy", least(yExpr.cast("long"), lit(top)))
      .withColumn("__hd", lit(0L))
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val m = s - 1L
      val rx = shiftright(col("__hx"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("__hy"), i).bitwiseAND(lit(1L))
      val q = when(rx === 1L, lit(3L) - ry).otherwise(ry)
      val xm = col("__hx").bitwiseAND(lit(m))
      val ym = col("__hy").bitwiseAND(lit(m))
      d = d.withColumns(Map(
        "__hd" -> (col("__hd") + lit(s * s) * q),
        "__hx" -> when(ry === 1L, xm)
          .otherwise(when(rx === 1L, lit(m) - ym).otherwise(ym)),
        "__hy" -> when(ry === 1L, ym)
          .otherwise(when(rx === 1L, lit(m) - xm).otherwise(xm))))
      i -= 1
    }
    d.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** DuckDB spelling: a chain of CTEs (one per bit level — a nested
    * single expression would blow up exponentially, since each level
    * reads the previous level's x and y several times). Returns
    * `(cteChain, finalCteName)`; the chain starts from `srcCte` (which
    * must expose `xExpr`/`yExpr` and any passthrough columns) and the
    * final CTE carries the index as `hd` plus `srcCte`'s columns.
    */
  def sqlCtes(srcCte: String, xExpr: String, yExpr: String, bits: Int,
      prefix: String = "h"): (String, String) = {
    require(bits >= 1 && bits * 2 <= 62, s"bits out of range: $bits")
    val top = (1L << bits) - 1L
    val sb = new StringBuilder
    sb.append(
      s"""$prefix${bits} AS (
         |  SELECT *, least(CAST(($xExpr) AS BIGINT), $top) AS hx,
         |         least(CAST(($yExpr) AS BIGINT), $top) AS hy,
         |         CAST(0 AS BIGINT) AS hd
         |  FROM $srcCte)""".stripMargin)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val m = s - 1L
      val cur = s"$prefix${i + 1}"
      val nxt = s"$prefix$i"
      sb.append(
        s""",
           |$nxt AS (
           |  SELECT * EXCLUDE (hx, hy, hd),
           |    CASE WHEN ((hy >> $i) & 1) = 1 THEN hx & $m
           |         WHEN ((hx >> $i) & 1) = 1 THEN $m - (hy & $m)
           |         ELSE hy & $m END AS hx,
           |    CASE WHEN ((hy >> $i) & 1) = 1 THEN hy & $m
           |         WHEN ((hx >> $i) & 1) = 1 THEN $m - (hx & $m)
           |         ELSE hx & $m END AS hy,
           |    hd + ${s * s} * (CASE WHEN ((hx >> $i) & 1) = 1
           |      THEN 3 - ((hy >> $i) & 1)
           |      ELSE ((hy >> $i) & 1) END) AS hd
           |  FROM $cur)""".stripMargin)
      i -= 1
    }
    (sb.toString, s"${prefix}0")
  }
}
