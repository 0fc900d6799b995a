package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef._

/** Testdata twins of the reference's window family (SURVEY §2.6 W1–W10):
  * every reference window is PARTITION BY Ticker ORDER BY Date; the twin is
  * PARTITION BY o_custkey ORDER BY (o_orderdate, o_orderkey) — the unique
  * key tiebreaker makes results deterministic across engines.
  *
  * Scale notes: one shuffle on the partition key per query; all frames are
  * ROWS-based (streamable within a sorted partition, no re-sort per row).
  * Partitions are per-customer (~10 rows at any SF) so no skew risk.
  */
object WindowCatalog {

  private val w = Window.partitionBy("o_custkey")
    .orderBy(col("o_orderdate"), col("o_orderkey"))
  private val wAll = Window.partitionBy("o_custkey")
  private val overCust = "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"

  private def base(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      col("o_totalprice"))

  /** W1 (datamining_analysis.py:70): next-row value per group. */
  val w1Lead = QueryDef(
    "q_w1_lead",
    (s, dir) =>
      base(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey"),
    Some(s"""
      SELECT o_custkey, o_orderkey, o_totalprice,
             lead(o_totalprice, 1) $overCust) AS next_price
      FROM orders ORDER BY o_custkey, o_orderkey""")
  )

  /** W2 (datamining_analysis.py:107 pct_change): row-over-row fractional
    * change; first row per group is null.
    */
  val w2PctChange = QueryDef(
    "q_w2_pct_change",
    (s, dir) =>
      base(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          r6(col("o_totalprice") / lag(col("o_totalprice"), 1).over(w) - 1)
            .as("dod_change"))
        .orderBy("o_custkey", "o_orderkey"),
    Some(s"""
      SELECT o_custkey, o_orderkey,
             ${sqlR6(s"o_totalprice / lag(o_totalprice, 1) $overCust) - 1")} AS dod_change
      FROM orders ORDER BY o_custkey, o_orderkey""")
  )

  /** W3 (datamining_analysis.py:127): whole-partition z-score (sample
    * stddev) broadcast back to rows — an unordered partition window.
    */
  val w3Zscore = QueryDef(
    "q_w3_zscore",
    (s, dir) =>
      base(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          r6((col("o_totalprice") - avg(col("o_totalprice")).over(wAll))
            / stddev_samp(col("o_totalprice")).over(wAll)).as("z"))
        .orderBy("o_custkey", "o_orderkey"),
    Some(s"""
      SELECT o_custkey, o_orderkey,
             ${sqlR6("(o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_custkey)) / stddev_samp(o_totalprice) OVER (PARTITION BY o_custkey)")} AS z
      FROM orders ORDER BY o_custkey, o_orderkey""")
  )

  /** W4/W5 (datavisualization.py:411-417, 640-644): rolling stddev + mean
    * over the trailing 5 rows, with pandas min_periods=window semantics
    * (null until the frame is full).
    */
  val w4w5Rolling = QueryDef(
    "q_w4_rolling",
    (s, dir) => {
      val frame = w.rowsBetween(-4, 0)
      val full = count(lit(1)).over(frame) === 5
      base(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          when(full, r2(stddev_samp(col("o_totalprice")).over(frame)))
            .as("roll_std_5"),
          when(full, r2(avg(col("o_totalprice")).over(frame)))
            .as("roll_mean_5"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some(s"""
      WITH b AS (
        SELECT o_custkey, o_orderkey,
               stddev_samp(o_totalprice) $overCust ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sd,
               avg(o_totalprice) $overCust ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mn,
               count(*) $overCust ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n
        FROM orders)
      SELECT o_custkey, o_orderkey,
             CASE WHEN n = 5 THEN ${sqlR2("sd")} END AS roll_std_5,
             CASE WHEN n = 5 THEN ${sqlR2("mn")} END AS roll_mean_5
      FROM b ORDER BY o_custkey, o_orderkey""")
  )

  /** W6 (datavisualization.py:277-280): running cumulative sum per group
    * (exact decimal accumulation for cross-engine determinism).
    */
  val w6Cumsum = QueryDef(
    "q_w6_cumsum",
    (s, dir) =>
      base(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          r2(sum(col("o_totalprice").cast("decimal(28,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
            .as("cum_spend"))
        .orderBy("o_custkey", "o_orderkey"),
    Some(s"""
      SELECT o_custkey, o_orderkey,
             ${sqlR2(s"CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) $overCust ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)")} AS cum_spend
      FROM orders ORDER BY o_custkey, o_orderkey""")
  )

  /** W7 (datavisualization.py:606-610): running peak + drawdown, reduced to
    * the per-group max drawdown.
    */
  val w7Drawdown = QueryDef(
    "q_w7_drawdown",
    (s, dir) => {
      val cum = sum(col("o_totalprice").cast("decimal(28,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
      val peak = max(col("cum")).over(w.rowsBetween(Window.unboundedPreceding, 0))
      base(s, dir)
        .withColumn("cum", cum)
        .withColumn("dd", (col("cum") - peak) / peak)
        .groupBy("o_custkey")
        .agg(r6(min(col("dd"))).as("max_drawdown"))
        .orderBy("o_custkey")
    },
    Some(s"""
      WITH c AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) $overCust ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum
        FROM orders),
      d AS (
        SELECT o_custkey, cum,
               max(cum) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM c)
      SELECT o_custkey, ${sqlR6("min((cum - peak) / peak)")} AS max_drawdown
      FROM d GROUP BY 1 ORDER BY 1""")
  )

  /** W8 (datavisualization.py:724-741): rolling pairwise correlation over a
    * trailing 30-row frame, per supplier.
    */
  val w8RollingCorr = QueryDef(
    "q_w8_rolling_corr",
    (s, dir) => {
      val ws = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(-29, 0)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          when(count(lit(1)).over(ws) === 30,
            r4(corr(col("l_quantity"), col("l_extendedprice")).over(ws)))
            .as("roll_corr_30"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },
    Some(s"""
      WITH b AS (
        SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               corr(l_quantity, l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS c,
               count(*) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS n
        FROM lineitem)
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CASE WHEN n = 30 THEN ${sqlR4("c")} END AS roll_corr_30
      FROM b ORDER BY l_suppkey, l_orderkey, l_linenumber""")
  )

  /** W9 (datamining_analysis.py:73-75): global standardization — sklearn
    * StandardScaler uses population stddev. Expressed as a 1-row aggregate
    * broadcast back over the rows (Scaling.standardize), NOT an
    * empty-partition window: `OVER ()` funnels every row through one task
    * (the repo measured 5.5× degradation from exactly that shape in the M2
    * scaler), while the agg+broadcast plan keeps the scan fully parallel.
    * The oracle keeps the window formulation — same values.
    */
  val w9Standardize = QueryDef(
    "q_w9_standardize",
    (s, dir) =>
      graft.mining.Scaling.standardize(
          base(s, dir).select("o_orderkey", "o_totalprice"),
          Seq("o_totalprice"))
        .select(col("o_orderkey"),
          r6(col("o_totalprice_z")).as("z_global"))
        .orderBy("o_orderkey"),
    Some(s"""
      SELECT o_orderkey,
             ${sqlR6("(o_totalprice - avg(o_totalprice) OVER ()) / stddev_pop(o_totalprice) OVER ()")} AS z_global
      FROM orders ORDER BY o_orderkey""")
  )

  /** W10 (datamining_analysis.py:84): chronological 80/20 split per group —
    * sklearn puts ceil(0.2·n) rows in test, so train gets n − ceil(0.2·n).
    * (0.2*n is evaluated in binary double in both engines, reproducing
    * sklearn's own float behavior.)
    */
  val w10Split = QueryDef(
    "q_w10_split",
    (s, dir) =>
      base(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .select(col("o_custkey"), col("o_orderkey"),
          when(col("rn") <= col("n") - ceil(col("n") * 0.2), "train")
            .otherwise("test").as("split"))
        .orderBy("o_custkey", "o_orderkey"),
    Some(s"""
      WITH b AS (
        SELECT o_custkey, o_orderkey,
               row_number() $overCust) AS rn,
               count(*) OVER (PARTITION BY o_custkey) AS n
        FROM orders)
      SELECT o_custkey, o_orderkey,
             CASE WHEN rn <= n - ceil(n * 0.2) THEN 'train' ELSE 'test' END AS split
      FROM b ORDER BY o_custkey, o_orderkey""")
  )

  /** Ranking-family coverage beyond the reference (SQL-standard
    * semantics, identical in both engines): ntile quartiles,
    * percent_rank, cume_dist, dense_rank per customer sequence. The
    * order key is total (o_orderkey unique), so every rank is
    * deterministic; percent_rank/cume_dist are exact rationals → r6
    * rounding is bit-stable.
    */
  val w11RankFamily = QueryDef(
    "q_w11_rank_family",
    (s, dir) =>
      base(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          r6(percent_rank().over(w)).as("pr"),
          r6(cume_dist().over(w)).as("cd"),
          dense_rank().over(w).cast("long").as("dr"))
        .orderBy("o_custkey", "o_orderkey"),
    Some(s"""
      SELECT o_custkey, o_orderkey,
             CAST(ntile(4) $overCust) AS BIGINT) AS quartile,
             ${sqlR6(s"percent_rank() $overCust)")} AS pr,
             ${sqlR6(s"cume_dist() $overCust)")} AS cd,
             CAST(dense_rank() $overCust) AS BIGINT) AS dr
      FROM orders ORDER BY o_custkey, o_orderkey""")
  )

  // q_w12_ewma parameters — interpolated into BOTH the Spark call and the
  // oracle SQL so the replay can never drift from the query
  private val EwmaAlpha = 0.125
  private val EwmaBuckets = 32
  // total order: the synthetic lineitem duplicates (l_orderkey,
  // l_linenumber), so the tiebreakers extend to the measure columns —
  // the same proven-total key set q_m2_ols_next sequences on
  private val ewmaOrder = Seq("l_shipdate", "l_orderkey", "l_linenumber",
    "l_quantity", "l_extendedprice")

  /** Shared by the gated query and the Verify aux dump — the seeds the
    * oracle replays from MUST come from the same invocation parameters.
    */
  private def ewmaParts(s: org.apache.spark.sql.SparkSession, dir: String) = {
    // .distinct: ewmaOrder already ends in the value column — a duplicate
    // name survives the select and trips Spark's LogicalRDD schema WARN on
    // every checkpointed run
    val li = t(s, dir, "lineitem").select(
      (Seq("l_returnflag") ++ ewmaOrder :+ "l_extendedprice")
        .distinct.map(col): _*)
    graft.plans.EwmaScan.ewmaWithSeeds(li, Seq("l_returnflag"), ewmaOrder,
      unix_date(col("l_shipdate").cast("date")), "l_extendedprice",
      EwmaAlpha, "ewma", EwmaBuckets)
  }

  /** Spark-computed EWMA segment seeds for the q_w12_ewma oracle replay;
    * Verify writes this under `<outDir>/_aux/ewma_seeds`.
    */
  val auxDumps: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    Map("ewma_seeds" -> ((s, dir) => ewmaParts(s, dir)._2))

  /** EWMA — a linear-recurrence scan (`y = (1−α)y + αx`, the pandas
    * `ewm(adjust=False)` EMA indicator), distributed via plans.EwmaScan's
    * deterministic-bucket two-pass stitch. The per-row recurrence uses only
    * IEEE double ×/+ with identical operands in both engines, so the DuckDB
    * recursive-CTE replay (seeded per segment from the dumped boundary
    * table) matches BIT-FOR-BIT — no rounding applied. Only the driver-side
    * seed composition itself rides the dump (like the LSH hashes).
    */
  val w12Ewma = QueryDef(
    "q_w12_ewma",
    (s, dir) =>
      ewmaParts(s, dir)._1
        .select(col("l_returnflag"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("ewma"))
        .orderBy("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber"),
    Some(s"""
      WITH RECURSIVE
      lohi AS (
        SELECT min(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS lo,
               max(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS hi
        FROM lineitem),
      kb AS (
        SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber,
               l_quantity, CAST(l_extendedprice AS DOUBLE) AS x,
               CAST(((CAST(l_shipdate AS DATE) - DATE '1970-01-01') - lo)
                 // ((hi - lo) // $EwmaBuckets + 1) AS INT) AS b
        FROM lineitem, lohi),
      base AS MATERIALIZED (
        SELECT *, row_number() OVER (PARTITION BY b, l_returnflag
          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, x) AS rn
        FROM kb),
      sd AS (
        SELECT "__ewma_b" AS b, l_returnflag, seed
        FROM read_parquet('__VERIFY_OUT__/_aux/ewma_seeds/*.parquet')),
      rec AS (
        SELECT k.b, k.l_returnflag, k.l_shipdate, k.l_orderkey,
               k.l_linenumber, k.rn,
               CASE WHEN s.seed IS NULL THEN k.x
                    ELSE ${sqlD(1.0 - EwmaAlpha)} * s.seed + ${sqlD(EwmaAlpha)} * k.x
               END AS y
        FROM base k JOIN sd s
          ON s.b = k.b AND s.l_returnflag = k.l_returnflag
        WHERE k.rn = 1
        UNION ALL
        SELECT n.b, n.l_returnflag, n.l_shipdate, n.l_orderkey,
               n.l_linenumber, n.rn,
               ${sqlD(1.0 - EwmaAlpha)} * r.y + ${sqlD(EwmaAlpha)} * n.x
        FROM rec r JOIN base n
          ON n.b = r.b AND n.l_returnflag = r.l_returnflag
            AND n.rn = r.rn + 1)
      SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber, y AS ewma
      FROM rec
      ORDER BY l_returnflag, l_shipdate, l_orderkey, l_linenumber""")
  )

  /** W13 capability: exact GLOBAL decile bucketing of orders by value —
    * the ntile shape, but computed without the single-partition sort a
    * global `Window.orderBy` would funnel through: row numbers come from
    * plans.SequenceOps.runningSum over the total order (o_totalprice,
    * o_orderkey) — range-partitioned, P-way parallel — and the bucket is
    * pure integer arithmetic floor((rn−1)·10/n)+1 (the SQL-standard
    * ntile distribution for n divisible by 10; self-consistent exact
    * formula otherwise). Per-decile count and exact decimal revenue make
    * the output bit-exact; the oracle replays the identical formula from
    * row_number (not SQL ntile, whose remainder rule differs).
    */
  val w13Decile = QueryDef(
    "q_w13_decile",
    (s, dir) => {
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), lit(1L).as("one"))
      val rn = graft.plans.SequenceOps.runningSum(
        src, Seq(), Seq("o_totalprice", "o_orderkey"), "one", "rn")
      val tot = rn.agg(max(col("rn")).as("n"))
      rn.crossJoin(broadcast(tot))
        .withColumn("decile",
          expr("(rn - 1) * 10 div n") + 1L)
        .groupBy("decile")
        .agg(count(lit(1)).as("n_orders"),
          sumE(col("o_totalprice")).as("revenue"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("decile")
    },
    Some(s"""
      WITH r AS (
        SELECT o_orderkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM orders),
      d AS (
        SELECT o_totalprice, (rn - 1) * 10 // n + 1 AS decile FROM r)
      SELECT decile, count(*) AS n_orders,
             ${sqlSumE("o_totalprice")} AS revenue,
             min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM d GROUP BY 1 ORDER BY 1""")
  )

  /** W14 capability: rolling MEDIAN (20-row frame, full frames only) —
    * the robust rolling signal pandas spells `rolling(20).median()`, immune
    * to the single-spike distortion a rolling mean takes. Exact in-frame
    * percentile with linear interpolation: both engines sort the same 20
    * doubles and interpolate at k = 9.5 (one halved addition of identical
    * operands — Spark `percentile`, DuckDB `quantile_cont`), so the value
    * is deterministic → r2 at price magnitude. Same single
    * partitionBy(custkey) shuffle as the whole W family.
    */
  val w14RollingMedian = QueryDef(
    "q_w14_rolling_median",
    (s, dir) => {
      val wr = w.rowsBetween(-19, 0)
      base(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          when(count(lit(1)).over(wr) === 20,
            r2(percentile(col("o_totalprice"), lit(0.5)).over(wr)))
            .as("roll_median"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some(s"""
      WITH b AS (
        SELECT o_custkey, o_orderkey,
               quantile_cont(o_totalprice, 0.5) $overCust
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS med,
               count(*) $overCust
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n
        FROM orders)
      SELECT o_custkey, o_orderkey,
             CASE WHEN n = 20 THEN ${sqlR2("med")} END AS roll_median
      FROM b ORDER BY o_custkey, o_orderkey""")
  )

  /** W17 capability: Hampel filter — the robust rolling-outlier detector
    * (|x − rolling median| > 3·1.4826·rolling MAD) that survives the very
    * spikes a z-score window is distorted by. The 11-row frame is ODD, so
    * both the median and the MAD are EXACT middle elements of sorted
    * arrays — `array_sort`+`element_at` on the collected frame (all
    * native codegen'd collection expressions; the nested "median of
    * |x−med|" is a lambda over the same frame array, no second window) —
    * identical doubles in both engines, so every outlier verdict is an
    * exact comparison. Same single custkey-partition shuffle as the rest
    * of the W family; per-customer summary keeps the output bounded.
    */
  val w17Hampel = {
    val K = 3.0 * 1.4826 // Hampel's gaussian-consistent MAD multiplier
    QueryDef(
      "q_w17_hampel",
      (s, dir) => {
        val wr = w.rowsBetween(-10, 0)
        val fr = base(s, dir)
          .withColumn("arr", collect_list(col("o_totalprice")).over(wr))
          .filter(size(col("arr")) === 11)
          .withColumn("med", element_at(array_sort(col("arr")), 6))
          .withColumn("mad", element_at(array_sort(
            transform(col("arr"), e => abs(e - col("med")))), 6))
          .withColumn("dev", abs(col("o_totalprice") - col("med")))
          .withColumn("is_out", col("dev") > lit(K) * col("mad"))
        fr.groupBy("o_custkey")
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
            r2(max(col("dev"))).as("max_dev"))
          .orderBy("o_custkey")
      },
      Some(s"""
        WITH b AS (
          SELECT o_custkey, o_totalprice,
                 list(o_totalprice) $overCust
                   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS arr
          FROM orders),
        f AS (SELECT * FROM b WHERE len(arr) = 11),
        m AS (
          SELECT o_custkey, o_totalprice, arr,
                 list_extract(list_sort(arr), 6) AS med
          FROM f),
        d AS (
          SELECT o_custkey,
                 abs(o_totalprice - med) AS dev,
                 list_extract(list_sort(
                   list_transform(arr, e -> abs(e - med))), 6) AS mad
          FROM m)
        SELECT o_custkey, count(*) AS n_frames,
               CAST(sum(CASE WHEN dev > ${sqlD(K)} * mad THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_outliers,
               ${sqlR2("max(dev)")} AS max_dev
        FROM d GROUP BY 1 ORDER BY 1""")
    )
  }

  /** W15 capability: calendar RANGE frame — the 7-day trailing mean over
    * the per-flag DAILY series using a VALUE-based window
    * (`rangeBetween(-6, 0)` on the integer day number), the frame
    * semantics a gapped time series needs: a row after a 3-day gap
    * averages only the days actually inside the last week, where the
    * ROWS-frame W4 would reach back across the gap. Sum and count ride
    * the same frame: exact decimal sum ÷ count, one division of exact
    * operands → bit-exact. Same one-shuffle shape as the rest of the W
    * family (daily series is calendar-bounded).
    */
  val w15RangeFrame = QueryDef(
    "q_w15_range_frame",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg(sum(col("l_extendedprice").cast("decimal(28,6)")).as("sm"),
          count(lit(1)).as("c"))
        .withColumn("d", unix_date(col("day").cast("date")).cast("long"))
      val wr = Window.partitionBy("l_returnflag").orderBy("d")
        .rangeBetween(-6, 0)
      daily
        .select(col("l_returnflag"), col("day"),
          (decD(col("sm")) / col("c").cast("double")).as("y"),
          (decD(sum(col("sm")).over(wr)) /
            sum(col("c")).over(wr).cast("double")).as("week_mean"),
          sum(col("c")).over(wr).as("week_trades"))
        .orderBy("l_returnflag", "day")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS sm,
               count(*) AS c,
               date_diff('day', DATE '1970-01-01',
                 CAST(date_trunc('day', l_shipdate) AS DATE)) AS d
        FROM lineitem GROUP BY 1, 2, 5),
      f AS (
        SELECT l_returnflag, day, sm, c,
               sum(sm) OVER w AS wsm,
               sum(c) OVER w AS wc
        FROM daily
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY d
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT l_returnflag, day,
             ${sqlDecD("sm")} / CAST(c AS DOUBLE) AS y,
             ${sqlDecD("wsm")} / CAST(wc AS DOUBLE) AS week_mean,
             CAST(wc AS BIGINT) AS week_trades
      FROM f ORDER BY l_returnflag, day""")
  )

  /** W16 capability: ratio-to-report — each order's share of its
    * customer's total spend (the classic `RATIO_TO_REPORT` window other
    * warehouses name explicitly; in Spark it is value ÷ sum over the
    * partition-wide frame). The denominator is an exact decimal window
    * sum, the share is one division of deterministic operands (r6).
    * Top 25 shares under a total order. Same one-shuffle shape as the
    * rest of the W family.
    */
  val w16RatioToReport = QueryDef(
    "q_w16_ratio_report",
    (s, dir) => {
      val all = Window.partitionBy("o_custkey")
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("cust_total",
          sum(col("o_totalprice").cast("decimal(28,6)")).over(all)
            .cast("double"))
        .withColumn("n_orders", count(lit(1)).over(all))
        .where(col("n_orders") >= 5)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          r6(col("o_totalprice") / col("cust_total")).as("share"))
        .orderBy(desc("share"), col("o_custkey"), col("o_orderkey"))
        .limit(25)
    },
    Some(s"""
      WITH w AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(sum(CAST(o_totalprice AS DECIMAL(28,6)))
                 OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total,
               count(*) OVER (PARTITION BY o_custkey) AS n_orders
        FROM orders)
      SELECT o_custkey, o_orderkey, o_totalprice,
             ${sqlR6("o_totalprice / cust_total")} AS share
      FROM w WHERE n_orders >= 5
      ORDER BY share DESC, o_custkey, o_orderkey LIMIT 25""")
  )

  /** W18 capability: lag-feature assembly — the feature-table build every
    * forecasting/ML pipeline runs before training (lags + rolling mean +
    * rolling variance as ONE pass of windows over the per-flag daily
    * series). Rolling Σy and Σy² are DECIMAL window sums (exact, order-
    * independent — a plain double frame sum is accumulation-order-
    * dependent and NOT portable across engines), so the mean/variance
    * features compose in double from identical operands; lags copy exact
    * values. min_periods semantics: rows emit only once the frame is
    * full AND lag5 exists. Three calendar-bounded partitions.
    */
  val w18LagFeatures = QueryDef(
    "q_w18_lag_features",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          date_trunc("day", col("l_shipdate")).as("day"),
          col("l_extendedprice"))
        .groupBy("flag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
      val w = Window.partitionBy("flag").orderBy("day")
      val f5 = Window.partitionBy("flag").orderBy("day").rowsBetween(-4, 0)
      // rolling moments on INTEGER milli-units of y: the y doubles are
      // bit-identical across engines, so floor(y·1e3+0.5) is the identical
      // BIGINT in both — and every sum/square after it is exact integer
      // arithmetic. (The previous CAST(y*y AS DECIMAL) formulation
      // diverged at sf0.1: double→decimal rounding of a COMPUTED square
      // follows Spark's shortest-string BigDecimal vs DuckDB's exact
      // binary expansion, a documented 1-ulp-class divergence that the
      // vol5 cancellation then amplified past tolerance.)
      daily
        .withColumn("ym", floor(col("y") * 1000 + lit(0.5)).cast("long"))
        .withColumn("lag1", lag(col("y"), 1).over(w))
        .withColumn("lag5", lag(col("y"), 5).over(w))
        .withColumn("c5", count(col("y")).over(f5))
        .withColumn("s1i", sum(col("ym")).over(f5))
        .withColumn("s2i",
          sum((col("ym") * col("ym")).cast("decimal(38,0)")).over(f5))
        .filter(col("c5") === 5 && col("lag5").isNotNull)
        .select(col("flag"), col("day"), col("y"), col("lag1"), col("lag5"),
          (col("s1i").cast("double") / lit(5000.0)).as("ma5"),
          ((col("s2i") * lit(5) -
            col("s1i").cast("decimal(38,0)") * col("s1i")).cast("double")
            / lit(2.5e7)).as("vol5"))
        .orderBy("flag", "day")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      d2 AS (
        SELECT flag, day, y,
               CAST(floor(y * 1000 + 0.5) AS BIGINT) AS ym
        FROM daily),
      f AS (
        SELECT flag, day, y,
               lag(y, 1) OVER w AS lag1, lag(y, 5) OVER w AS lag5,
               count(y) OVER f5 AS c5,
               CAST(sum(ym) OVER f5 AS BIGINT) AS s1i,
               CAST(sum(CAST(ym * ym AS DECIMAL(38,0))) OVER f5
                 AS DECIMAL(38,0)) AS s2i
        FROM d2
        WINDOW w AS (PARTITION BY flag ORDER BY day),
        f5 AS (PARTITION BY flag ORDER BY day
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
      SELECT flag, day, y, lag1, lag5,
             CAST(s1i AS DOUBLE) / 5000e0 AS ma5,
             CAST(s2i * 5 - CAST(s1i AS DECIMAL(38,0)) * s1i AS DOUBLE)
               / 2.5e7 AS vol5
      FROM f WHERE c5 = 5 AND lag5 IS NOT NULL
      ORDER BY flag, day""")
  )

  val all: Seq[QueryDef] = Seq(
    w1Lead, w2PctChange, w3Zscore, w4w5Rolling, w6Cumsum, w7Drawdown,
    w8RollingCorr, w9Standardize, w10Split, w11RankFamily, w12Ewma,
    w13Decile, w14RollingMedian, w15RangeFrame, w16RatioToReport, w17Hampel,
    w18LagFeatures)
}
