package graft.sketches

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog approximate distinct counting (Flajolet et al., "HyperLogLog:
  * the analysis of a near-optimal cardinality estimation algorithm", 2007),
  * built from first principles on codegen'd built-ins — no UDFs, no sketch
  * objects riding the shuffle.
  *
  * Scale design (the whole point of a cardinality sketch at 100 TB):
  *
  *  - the per-row work is one xxhash64 + mask/shift + an integer-compare
  *    CASE chain, all inside whole-stage codegen;
  *  - the only shuffle is the register aggregation on (group, register):
  *    at most |groups| × 2^p keys regardless of input rows, with map-side
  *    combine doing the register `max` partially — the classic mergeable
  *    sketch property, expressed as a plain aggregate;
  *  - the estimate is a second |groups|-wide aggregate over 2^p-row
  *    register tables.
  *
  * Cross-engine determinism (what the DuckDB oracle replay relies on):
  * rho (leading-zero rank) is an exact integer CASE chain over powers of
  * two — no floating log/clz, so any engine computes it identically from
  * the same hash; the indicator sum Σ 2^(−M_j) is scaled by 2^62 into
  * EXACT integers accumulated in DECIMAL(38,0) (order-independent), and
  * only the final one-division estimate (plus `ln` in the linear-counting
  * branch) is floating point — rounding-stable at any output granularity
  * coarser than ~1e-12 relative.
  *
  * The 64-bit-hash formulation needs no large-range correction (the 2^32
  * collision regime of the original 32-bit sketch is unreachable below
  * ~2^57 distinct items — Heule et al., HyperLogLog++, 2013).
  */
object Hll {

  /** Bias constant α_m · m² · 2^62 for the scaled-integer indicator sum:
    * estimate = [[alphaScale]] / Σ 2^(62−M_j). Double, computed once —
    * interpolate the SAME constant into any external replay.
    */
  def alphaScale(p: Int): Double = {
    val m = (1 << p).toDouble
    val alphaM = 0.7213 / (1.0 + 1.079 / m)
    alphaM * m * m * (1L << 62).toDouble
  }

  /** rho = rank of the leftmost 1-bit of the (64−p)-bit hash remainder
    * (1-based; all-zero remainder → 64−p+1), as a chained integer compare —
    * exact in any engine.
    */
  def rho(w: Column, wBits: Int): Column =
    (1 to wBits).foldRight(lit(wBits + 1): Column) { (r, els) =>
      when(w >= lit(1L << (wBits - r)), lit(r)).otherwise(els)
    }

  /** The SAME rho chain rendered as ANSI SQL over an expression string. */
  def rhoSql(w: String, wBits: Int): String =
    "CASE " + (1 to wBits).map(r =>
      s"WHEN ($w) >= ${1L << (wBits - r)} THEN $r").mkString(" ") +
      s" ELSE ${wBits + 1} END"

  /** Per-(group, register) state: `reg` = low p bits of xxhash64(value),
    * `m_rho` = max rho of the remainder. ≤ |groups| × 2^p rows out.
    */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    val wBits = 64 - p
    val h = xxhash64(valueCol)
    val w = shiftright(h, p).bitwiseAND(lit((1L << wBits) - 1))
    df.select(
        groupCols.map(col) :+
          h.bitwiseAND(lit(((1 << p) - 1).toLong)).as("reg") :+
          rho(w, wBits).as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("m_rho"))
  }

  /** Per-group HLL cardinality estimate (double, unrounded) with the
    * standard small-range linear-counting switch. Input: [[registers]]
    * output. Absent registers count as zero automatically (2^62 per
    * missing register in the scaled sum).
    */
  def estimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val two62 = lit(1L << 62).cast("decimal(38,0)")
    val agg = regs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("__npres"),
      // 2^(62−M) is an exact long for M in [1, 64−p]; decimal sum is exact
      sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 62 - m_rho) AS DECIMAL(38,0))"))
        .as("__sumi"))
    val zeros = (lit(m) - col("__npres")).cast("int")
    val sumAll = col("__sumi") + zeros.cast("decimal(38,0)") * two62
    val raw = lit(alphaScale(p)) / sumAll.cast("double")
    val lc = lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double"))
    agg
      .withColumn("zeros", zeros)
      .withColumn("hll_est",
        when(raw <= lit(2.5 * m) && col("zeros") > 0, lc).otherwise(raw))
      .select(groupCols.map(col) :+ col("hll_est"): _*)
  }

  /** One-call per-group approximate distinct count. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      p: Int = 8): DataFrame =
    estimate(registers(df, groupCols, valueCol, p), groupCols, p)
}
