package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data layout — the
  * data-skipping primitive lakehouse table formats expose as `ZORDER BY` /
  * `sort_order`: interleaving the bits of several key columns gives a
  * single sort key whose contiguous ranges are small hyper-rectangles in
  * the original key space, so per-file min/max statistics prune scans on
  * ANY of the clustered columns, not just the leading sort column.
  *
  * Scale design: the z-value is a pure codegen'd projection (no UDF, no
  * shuffle); `cluster` then range-partitions on it — one shuffle, the
  * same cost as any global sort — and sorts within partitions so each
  * output file covers one z-range. Fixed-width z-PREFIX buckets (the top
  * bits of the z-value) are the deterministic stand-in for file
  * boundaries: prefix `p` of a z-value pins every interleaved column to a
  * fixed bit-prefix, i.e. each bucket IS a quadtree tile.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (column i's bit b lands
    * at position `b * n + i`): a sum of shift/mask terms, fully inside
    * whole-stage codegen. Columns must be non-negative integers (callers
    * rank or offset first); values above 2^bits fold into the top tile,
    * keeping the value total-ordered per tile rather than throwing.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"${cols.size} cols x $bits bits exceeds a long")
    val n = cols.size
    val capped = cols.map(c => least(c.cast("long"), lit((1L << bits) - 1)))
    val terms = for {
      b <- 0 until bits
      (c, i) <- capped.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** The identical computation as DuckDB SQL, unrolled from the same
    * constants so the two engines can never drift.
    */
  def sqlZValue(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val capped = cols.map(c => s"least(CAST($c AS BIGINT), ${(1L << bits) - 1})")
    val terms = for {
      b <- 0 until bits
      (c, i) <- capped.zipWithIndex
    } yield s"((($c >> $b) & 1) << ${b * n + i})"
    terms.mkString("(", " + ", ")")
  }

  /** Cluster `df` for layout: add the z-value, range-partition on it and
    * sort within partitions — ready for a partitioned write where every
    * file covers one tight z-range.
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue(cols.map(col), bits)
    df.withColumn("z", z)
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions("z")
  }
}
