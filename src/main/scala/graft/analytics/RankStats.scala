package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-based statistics without a global sort — the histogram +
  * distributed-prefix-sum formulation that survives data too large for one
  * sorter. Ranks are carried as 2×-SCALED INTEGERS (rank2 = 2·cumBefore +
  * n + 1 is the tie-averaged midrank doubled), so rank sums, U, and the
  * tie-correction Σ(t³−t) stay exact integer arithmetic at any size; only
  * the final normal-approximation z is floating point.
  */
object RankStats {

  /** Mann–Whitney U (two-sided normal approximation, tie-corrected) of
    * `valCol` (an integral column — quantize floats first) between
    * `groupA` and every other row. Returns one row:
    * (n_a, n_b, u_a DOUBLE, z DOUBLE, raw — no rounding).
    *
    * Plan: value histogram (one groupBy, ≤|distinct values| rows) →
    * plans.SequenceOps.runningSum for the cumulative count
    * (range-partitioned exact prefix sum — no single-partition window) →
    * one reduction.
    */
  def mannWhitney(df: DataFrame, valCol: String, groupCol: String,
      groupA: String): DataFrame = {
    val h = df.groupBy(col(valCol).as("__v")).agg(
      sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("na"),
      count(lit(1)).as("n"))
    val cum = graft.plans.SequenceOps.runningSum(
      h, Seq(), Seq("__v"), "n", "cum")
    val ranks = cum.withColumn("rank2",
      lit(2L) * (col("cum") - col("n")) + col("n") + 1L)
    val agg = ranks.agg(
      sum(col("na") * col("rank2")).as("rs2a"),
      sum(col("na")).as("n_a"),
      sum(col("n") - col("na")).as("n_b"),
      sum(col("n") * col("n") * col("n") - col("n")).as("sum_t"))
    val nTot = col("n_a") + col("n_b")
    val uA = (col("rs2a") - col("n_a") * (col("n_a") + 1L))
      .cast("double") / 2.0
    val meanU = (col("n_a") * col("n_b")).cast("double") / 2.0
    val sigma = sqrt((col("n_a") * col("n_b")).cast("double") / 12.0 *
      ((nTot + 1L).cast("double")
        - col("sum_t").cast("double")
          / (nTot * (nTot - 1L)).cast("double")))
    agg.select(col("n_a"), col("n_b"), uA.as("u_a"),
      ((uA - meanU) / sigma).as("z"))
  }

  /** Per-group Gini coefficient of `valCol` (integral — quantize floats
    * first; values must be non-negative) via the sorted-rank identity
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n, computed WITHOUT a global sort:
    * value histogram per group → one range-partitioned prefix sum of the
    * counts ([[graft.plans.SequenceOps.runningSum]]) → tie blocks
    * contribute x_v·(2·c·b + c·(c+1)) to the doubled rank-weighted sum
    * (b = count strictly below, c = tie count — the consecutive-integers
    * closed form), kept in DECIMAL(38,0) so the accumulation is exact at
    * any size. Only the final two divisions are floating point — fixed
    * expression order, identical operands in any engine. Returns one row
    * per group: (groupCol, n BIGINT, gini DOUBLE bit-exact).
    */
  def gini(df: DataFrame, valCol: String, groupCol: String): DataFrame = {
    val h = df.groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("c"))
    val cum = graft.plans.SequenceOps.runningSum(
      h, Seq(groupCol), Seq("__v"), "c", "cum")
    val term2 = lit(2L) * (col("cum") - col("c")) * col("c") +
      col("c") * (col("c") + 1L)
    // DECIMAL(18)×DECIMAL(19) → DECIMAL(38) exactly (wider operand casts
    // are rejected by engines that cap multiply width at 38); values fit:
    // __v and the tie term are each well under 1e18
    val agg = cum.groupBy(groupCol).agg(
      sum(col("__v").cast("decimal(18,0)") * term2.cast("decimal(19,0)"))
        .as("s1x2"),
      sum(col("__v") * col("c")).as("s"),
      sum(col("c")).as("n"))
    agg.select(col(groupCol), col("n"),
      (col("s1x2").cast("double") /
        (col("n").cast("double") * col("s").cast("double")) -
        (col("n") + 1L).cast("double") / col("n").cast("double"))
        .as("gini"))
  }

  /** Per-group Spearman rank correlation of two integral columns
    * (quantize floats first) WITHOUT a global sort: each variable's
    * tie-averaged midranks come from its value histogram + one
    * range-partitioned prefix sum ([[graft.plans.SequenceOps.runningSum]]),
    * carried 2×-scaled so they stay integers; rows pick their ranks up via
    * two histogram-sized equi-joins (the rank tables are |distinct values|
    * rows, not |rows| — broadcast-sized for discrete variables); then
    * ρ = Pearson over the rank pairs from one aggregation of exact
    * DECIMAL(38,0) moments (the 2× scaling cancels). Only the final
    * ratio/sqrt compose in double — fixed operand order, identical in any
    * engine, so ρ is bit-exact given exact integer moments.
    *
    * Returns one row per group: (groupCol, n BIGINT, rho DOUBLE).
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      groupCol: String): DataFrame = {
    def rank2(vCol: String, out: String): DataFrame = {
      val h = df.groupBy(col(groupCol), col(vCol).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val cum = graft.plans.SequenceOps.runningSum(
        h, Seq(groupCol), Seq("__v"), "__c", "__cum")
      cum.select(col(groupCol), col("__v").as(vCol),
        (lit(2L) * (col("__cum") - col("__c")) + col("__c") + 1L).as(out))
    }
    val joined = df.select(col(groupCol), col(xCol), col(yCol))
      .join(rank2(xCol, "__rx2"), Seq(groupCol, xCol))
      .join(rank2(yCol, "__ry2"), Seq(groupCol, yCol))
    // decimal widths: rank2 ≤ 2n+1; squares/products ≤ ~4n², so the
    // 19×19→38 products and their sums stay exact for any realistic group
    val agg = joined.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(col("__rx2").cast("decimal(28,0)")).cast("double").as("__sx"),
      sum(col("__ry2").cast("decimal(28,0)")).cast("double").as("__sy"),
      sum(col("__rx2").cast("decimal(19,0)")
        * col("__rx2").cast("decimal(19,0)")).cast("double").as("__sxx"),
      sum(col("__ry2").cast("decimal(19,0)")
        * col("__ry2").cast("decimal(19,0)")).cast("double").as("__syy"),
      sum(col("__rx2").cast("decimal(19,0)")
        * col("__ry2").cast("decimal(19,0)")).cast("double").as("__sxy"))
    val nd = col("n").cast("double")
    agg.select(col(groupCol), col("n"),
      ((nd * col("__sxy") - col("__sx") * col("__sy")) /
        sqrt((nd * col("__sxx") - col("__sx") * col("__sx")) *
          (nd * col("__syy") - col("__sy") * col("__sy")))).as("rho"))
  }

  /** Per-group median, MAD (median absolute deviation), and modified
    * z-score outlier count of an integral column (quantize floats first) —
    * the Iglewicz–Hoaglin robust-anomaly capability, computed EXACTLY and
    * without a global sort. Medians are selected order statistics from the
    * value histogram + one range-partitioned prefix sum (the same shape as
    * [[gini]]), carried DOUBLED (`med2` = lower + upper middle order
    * statistic) so even-count medians stay integers; deviations
    * `d = |2v − med2|` then stay integers at 2× scale and the MAD repeats
    * the same selection on their histogram (`mad4` at 4× scale). A row is
    * an outlier when 0.6745·|x−med|/MAD > `zCut`, evaluated scale-free as
    * `0.6745·(2d) > zCut·mad4` — one float comparison on exact integers,
    * identical in any engine (and division-free, so MAD = 0 degrades to
    * "any deviation flags" instead of dividing by zero).
    *
    * Returns one row per group:
    * (groupCol, n, med2 BIGINT exact, mad4 BIGINT exact, n_outliers).
    */
  def medianMad(df: DataFrame, valCol: String, groupCol: String,
      zCut: Double = 3.5): DataFrame = {
    // doubled median per group from a (group, value, count) HISTOGRAM:
    // sum of the two middle order statistics
    def med2FromHist(h: DataFrame, out: String): DataFrame = {
      val cum = graft.plans.SequenceOps.runningSum(
        h, Seq(groupCol), Seq("__v"), "__c", "__cum")
      val tot = h.groupBy(groupCol).agg(sum(col("__c")).as("__n"))
      cum.join(broadcast(tot), Seq(groupCol))
        .withColumn("__rlo", expr("(__n + 1) DIV 2"))
        .withColumn("__rhi", expr("(__n + 2) DIV 2"))
        .groupBy(groupCol)
        .agg(sum(col("__v") * (
          when(col("__cum") - col("__c") < col("__rlo") &&
            col("__rlo") <= col("__cum"), 1L).otherwise(0L) +
          when(col("__cum") - col("__c") < col("__rhi") &&
            col("__rhi") <= col("__cum"), 1L).otherwise(0L))).as(out))
    }
    // the ONLY fact-table scan: everything downstream (both medians, the
    // outlier count) derives from this ≤|distinct|-row histogram — the
    // deviation histogram is the value histogram folded through
    // d = |2v − med2|, never a second pass over rows. Checkpointed so the
    // two consumers read one materialization.
    val h = df.groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false)
    val m = med2FromHist(h, "med2")
    val hd = h.join(broadcast(m), Seq(groupCol))
      .groupBy(col(groupCol), col("med2"),
        abs(lit(2L) * col("__v") - col("med2")).as("__v"))
      .agg(sum(col("__c")).as("__c"))
      .localCheckpoint(false) // read by the MAD selection and the final agg
    val mad = med2FromHist(
      hd.select(col(groupCol), col("__v"), col("__c")), "mad4")
    hd.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol), col("med2"), col("mad4"))
      .agg(sum(col("__c")).as("n"),
        sum(when(lit(0.6745) * (lit(2L) * col("__v")).cast("double")
          > lit(zCut) * col("mad4").cast("double"), col("__c"))
          .otherwise(0L)).as("n_outliers"))
      .select(col(groupCol), col("n"), col("med2"), col("mad4"),
        col("n_outliers"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic of `valCol` (integral —
    * quantize floats first) between `groupA` and the rest:
    * D = max |F_A − F_B| over the empirical CDFs, computed EXACTLY as the
    * integer maximum of |cumA·n_b − cumB·n_a| over the value histogram
    * (the same no-global-sort shape as [[mannWhitney]]; two
    * range-partitioned prefix sums). Returns one row
    * (n_a, n_b, d DOUBLE exact, p_approx DOUBLE raw) where p_approx is
    * the standard asymptotic 2·exp(−2D²·n_a·n_b/(n_a+n_b)).
    */
  def kolmogorovSmirnov(df: DataFrame, valCol: String, groupCol: String,
      groupA: String): DataFrame = {
    val h = df.groupBy(col(valCol).as("__v")).agg(
      sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("na"),
      count(lit(1)).as("n"))
    val cumN = graft.plans.SequenceOps.runningSum(
      h, Seq(), Seq("__v"), "n", "cum")
    val cumA = graft.plans.SequenceOps.runningSum(
      cumN, Seq(), Seq("__v"), "na", "cum_a")
    val tot = h.agg(sum(col("na")).as("n_a"),
      sum(col("n") - col("na")).as("n_b"))
    val num = abs(col("cum_a") * col("n_b")
      - (col("cum") - col("cum_a")) * col("n_a"))
    val agg = cumA.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"), num.as("num"))
      .groupBy("n_a", "n_b")
      .agg(max(col("num")).as("d_num"))
    val d = col("d_num").cast("double") /
      (col("n_a") * col("n_b")).cast("double")
    agg.select(col("n_a"), col("n_b"), d.as("d"),
      (lit(2.0) * exp(lit(-2.0) * d * d *
        (col("n_a") * col("n_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double"))).as("p_approx"))
  }
}
