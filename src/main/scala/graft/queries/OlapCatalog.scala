package graft.queries

import org.apache.spark.sql.functions._

import QueryDef._

/** Testdata twins of the reference's OLAP family (SURVEY §2.5 A1–A16,
  * §2.2 P3–P5, §2.3 F9–F12): pivot tables, grouped stats, distinct lists.
  *
  * Scale notes: every query is a single hash-aggregate (partial map-side
  * combine + one shuffle on the group keys); the lineitem⋈orders join
  * shuffles on the join key with AQE free to broadcast the smaller side.
  * Pivots pass explicit value lists so the plan is a single aggregate with
  * conditional columns — no extra pass to discover pivot values.
  */
object OlapCatalog {

  val priorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** A1 twin (flagship; reference olap_analysis.py:43-44): avg lineitem price
    * by (year, quarter) of the order date, pivoted by order priority.
    */
  val a1QuarterlyPrice = QueryDef(
    "q_a1_quarterly_price",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("Year"),
        quarter(col("o_orderdate")).cast("long").as("Quarter"),
        col("o_orderpriority"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("Year", "Quarter")
        .pivot("o_orderpriority", priorities)
        .agg(avg("l_extendedprice"))
        .select(col("Year") +: col("Quarter") +:
          priorities.map(p => r2(col(s"`$p`")).as(p)): _*)
        .orderBy("Year", "Quarter")
    },
    Some(s"""
      SELECT year(o.o_orderdate) AS "Year", quarter(o.o_orderdate) AS "Quarter",
             ${priorities.map(p => s"""${sqlR2(s"avg(l.l_extendedprice) FILTER (o.o_orderpriority = '$p')")} AS "$p"""").mkString(", ")}
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** A2 twin (olap_analysis.py:46-49): avg order price per priority for two
    * years + growth percentage between them (pivot + cross-column math, the
    * reference's implicit align-join J3).
    */
  val a2YearlyGrowth = QueryDef(
    "q_a2_yearly_growth",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("Year", year(col("o_orderdate")))
        .filter(col("Year").isin(2000, 2001))
      o.groupBy("o_orderpriority")
        .pivot("Year", Seq(2000, 2001))
        .agg(avg("o_totalprice"))
        .select(
          col("o_orderpriority"),
          r2(col("2000")).as("y2000"),
          r2(col("2001")).as("y2001"),
          r4((col("2001") / col("2000") - 1) * 100).as("growth_pct"))
        .orderBy("o_orderpriority")
    },
    Some(s"""
      WITH g AS (
        SELECT o_orderpriority,
               avg(o_totalprice) FILTER (year(o_orderdate) = 2000) AS a0,
               avg(o_totalprice) FILTER (year(o_orderdate) = 2001) AS a1
        FROM orders WHERE year(o_orderdate) IN (2000, 2001) GROUP BY 1)
      SELECT o_orderpriority, ${sqlR2("a0")} AS y2000, ${sqlR2("a1")} AS y2001,
             ${sqlR4("(a1/a0 - 1) * 100")} AS growth_pct
      FROM g ORDER BY o_orderpriority""")
  )

  /** A3 twin (olap_analysis.py:51-52): monthly avg order price pivot,
    * rounded to integer, empty cells filled with 0 (pandas fillna(0)).
    */
  val a3MonthlyVolume = QueryDef(
    "q_a3_monthly_volume",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        year(col("o_orderdate")).cast("long").as("Year"),
        month(col("o_orderdate")).cast("long").as("Month"),
        col("o_orderpriority"), col("o_totalprice"))
      o.groupBy("Year", "Month")
        .pivot("o_orderpriority", priorities)
        .agg(avg("o_totalprice"))
        .select(col("Year") +: col("Month") +: priorities.map(p =>
          coalesce(floor(col(s"`$p`") + lit(0.5)).cast("long"), lit(0L)).as(p)): _*)
        .orderBy("Year", "Month")
    },
    Some(s"""
      SELECT year(o_orderdate) AS "Year", month(o_orderdate) AS "Month",
             ${priorities.map(p => s"""coalesce(CAST(floor(avg(o_totalprice) FILTER (o_orderpriority = '$p') + 0.5) AS BIGINT), 0) AS "$p"""").mkString(", ")}
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** A4 twin (olap_analysis.py:54-63): one year's per-priority stats — avg
    * price, order count, sample stddev, coefficient of variation — sorted by
    * avg price desc (pandas .std() == stddev_samp).
    */
  val a4Stats = QueryDef(
    "q_a4_stats",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 2001)
        .groupBy("o_orderpriority")
        .agg(
          r2(avg("o_totalprice")).as("avg_price"),
          count(lit(1)).as("n_orders"),
          r2(stddev_samp(col("o_totalprice"))).as("std_price"),
          r4(stddev_samp(col("o_totalprice")) / avg("o_totalprice") * 100)
            .as("cv_pct"))
        .orderBy(desc("avg_price"), col("o_orderpriority")),
    Some(s"""
      SELECT o_orderpriority, ${sqlR2("avg(o_totalprice)")} AS avg_price,
             count(*) AS n_orders,
             ${sqlR2("stddev_samp(o_totalprice)")} AS std_price,
             ${sqlR4("stddev_samp(o_totalprice)/avg(o_totalprice)*100")} AS cv_pct
      FROM orders WHERE year(o_orderdate) = 2001
      GROUP BY 1 ORDER BY avg_price DESC, o_orderpriority""")
  )

  /** A5/A6 twin (olap_analysis.py:84,99,116; OlapQueries.quarterlyMeanStd):
    * one group's quarterly chart feed — mean price, sample stddev, and a
    * millions-scaled exact volume sum. Single filtered hash-aggregate.
    */
  val a5ChartFeed = QueryDef(
    "q_a5_chart_feed",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(year(col("o_orderdate")).cast("long").as("Year"),
          quarter(col("o_orderdate")).cast("long").as("Quarter"))
        .agg(
          r2(avg("o_totalprice")).as("mean_price"),
          r2(stddev_samp(col("o_totalprice"))).as("std_price"),
          r6(sumE(col("o_totalprice")) / 1e6).as("volume_m"))
        .orderBy("Year", "Quarter"),
    Some(s"""
      SELECT year(o_orderdate) AS "Year", quarter(o_orderdate) AS "Quarter",
             ${sqlR2("avg(o_totalprice)")} AS mean_price,
             ${sqlR2("stddev_samp(o_totalprice)")} AS std_price,
             ${sqlR6(s"${sqlSumE("o_totalprice")} / 1e6")} AS volume_m
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** A7 twin (olap_analysis.py:152): monthly label ("yyyy-MM") × priority
    * avg price pivot — the combined-trend chart feed.
    */
  val a7MonthlyTrend = QueryDef(
    "q_a7_monthly_trend",
    (s, dir) =>
      t(s, dir, "orders")
        .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
        .groupBy("ym")
        .pivot("o_orderpriority", priorities)
        .agg(avg("o_totalprice"))
        .select(col("ym") +: priorities.map(p => r2(col(s"`$p`")).as(p)): _*)
        .orderBy("ym"),
    Some(s"""
      SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             ${priorities.map(p => s"""${sqlR2(s"avg(o_totalprice) FILTER (o_orderpriority = '$p')")} AS "$p"""").mkString(", ")}
      FROM orders GROUP BY 1 ORDER BY 1""")
  )

  /** A11 twin (datavisualization.py:240-248): per-group correlation matrix
    * entries as pairwise corr aggregates.
    */
  val a11Corr = QueryDef(
    "q_a11_corr",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          r6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
          r6(corr(col("l_quantity"), col("l_discount"))).as("corr_qty_disc"),
          r6(corr(col("l_extendedprice"), col("l_discount"))).as("corr_price_disc"))
        .orderBy("l_returnflag"),
    Some(s"""
      SELECT l_returnflag,
             ${sqlR6("corr(l_quantity, l_extendedprice)")} AS corr_qty_price,
             ${sqlR6("corr(l_quantity, l_discount)")} AS corr_qty_disc,
             ${sqlR6("corr(l_extendedprice, l_discount)")} AS corr_price_disc
      FROM lineitem GROUP BY 1 ORDER BY 1""")
  )

  /** A12 twin (datavisualization.py:713): sample covariance matrix entries. */
  val a12Cov = QueryDef(
    "q_a12_cov",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          r2(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cov_qty_price"),
          r6(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_qty_disc"),
          r2(covar_samp(col("l_extendedprice"), col("l_discount"))).as("cov_price_disc"))
        .orderBy("l_returnflag"),
    Some(s"""
      SELECT l_returnflag,
             ${sqlR2("covar_samp(l_quantity, l_extendedprice)")} AS cov_qty_price,
             ${sqlR6("covar_samp(l_quantity, l_discount)")} AS cov_qty_disc,
             ${sqlR2("covar_samp(l_extendedprice, l_discount)")} AS cov_price_disc
      FROM lineitem GROUP BY 1 ORDER BY 1""")
  )

  /** A15 twin (olap_analysis.py:40): sorted distinct group list. */
  val a15Distinct = QueryDef(
    "q_a15_distinct",
    (s, dir) =>
      t(s, dir, "orders").select("o_orderpriority").distinct()
        .orderBy("o_orderpriority"),
    Some("SELECT DISTINCT o_orderpriority FROM orders ORDER BY 1")
  )

  /** TPC-H Q1-shaped pricing summary — the headline single-shuffle
    * aggregation (map-side partial agg + 6-group reduce). Sums go through
    * exact decimal accumulation so both engines agree bit-for-bit.
    */
  val q1Pricing = QueryDef(
    "q1_pricing_summary",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r2(sumE(col("l_quantity"))).as("sum_qty"),
          r2(sumE(col("l_extendedprice"))).as("sum_base_price"),
          r2(sumE(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price"),
          r2(sumE(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))).as("sum_charge"),
          r6(avgE(col("l_quantity"))).as("avg_qty"),
          r6(avgE(col("l_extendedprice"))).as("avg_price"),
          r6(avgE(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${sqlR2(sqlSumE("l_quantity"))} AS sum_qty,
             ${sqlR2(sqlSumE("l_extendedprice"))} AS sum_base_price,
             ${sqlR2(sqlSumE("l_extendedprice * (1 - l_discount)"))} AS sum_disc_price,
             ${sqlR2(sqlSumE("l_extendedprice * (1 - l_discount) * (1 + l_tax)"))} AS sum_charge,
             ${sqlR6(sqlAvgE("l_quantity"))} AS avg_qty,
             ${sqlR6(sqlAvgE("l_extendedprice"))} AS avg_price,
             ${sqlR6(sqlAvgE("l_discount"))} AS avg_disc,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** A25 capability: ABC (Pareto) inventory classification — parts
    * bucketed A/B/C by cumulative revenue share (≤80% / ≤95% / rest),
    * the classic warehouse stratification every procurement dashboard
    * opens with. Per-row revenue is QUANTIZED to integer cents
    * (identical IEEE per row), so the per-part totals, the global
    * running total (`plans.SequenceOps.runningSum` — range-partitioned,
    * NOT a one-task global window), and the 100·cum ≤ 80·total class
    * predicates are all exact integer arithmetic; only the reported
    * share divides at the end (r6). Output: 3 class rows.
    */
  val a25Abc = QueryDef(
    "q_a25_abc",
    (s, dir) => {
      val cents = floor(col("l_extendedprice") *
        (lit(1.0) - col("l_discount")) * 100 + lit(0.5)).cast("long")
      val perPart = QueryDef.t(s, dir, "lineitem")
        .select(col("l_partkey"), cents.as("rc"))
        .groupBy("l_partkey").agg(sum("rc").as("rev_c"))
      val total = perPart.agg(sum("rev_c").as("tot"))
      val cum = graft.plans.SequenceOps.runningSum(
        perPart.withColumn("nk", -col("rev_c")),
        Seq.empty, Seq("nk", "l_partkey"), "rev_c", "cum_c")
      cum.crossJoin(broadcast(total))
        .withColumn("abc_class",
          when(col("cum_c") * 100 <= col("tot") * 80, "A")
            .when(col("cum_c") * 100 <= col("tot") * 95, "B")
            .otherwise("C"))
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_parts"), sum("rev_c").as("class_rev_c"),
          max("tot").as("tot"))
        .select(col("abc_class"), col("n_parts"), col("class_rev_c"),
          QueryDef.r6(col("class_rev_c").cast("double") /
            col("tot").cast("double")).as("rev_share"))
        .orderBy("abc_class")
    },
    Some(s"""
      WITH pp AS (
        SELECT l_partkey,
               CAST(sum(CAST(floor(l_extendedprice * (1.0e0 - l_discount)
                 * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        FROM lineitem GROUP BY 1),
      tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot FROM pp),
      cum AS (
        SELECT l_partkey, rev_c,
               CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_c
        FROM pp),
      cls AS (
        SELECT CASE WHEN cum_c * 100 <= tot * 80 THEN 'A'
                    WHEN cum_c * 100 <= tot * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev_c, tot
        FROM cum CROSS JOIN tot)
      SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(rev_c) AS BIGINT) AS class_rev_c,
             ${QueryDef.sqlR6("CAST(sum(rev_c) AS DOUBLE) / CAST(max(tot) AS DOUBLE)")}
               AS rev_share
      FROM cls GROUP BY 1 ORDER BY 1""")
  )

  /** A26 capability: YoY contribution decomposition (the waterfall
    * chart's data): per-flag revenue for 1997 vs 1998 in integer cents,
    * the per-flag delta, and each flag's share of the TOTAL year-over-
    * year change — additive by construction (Σ contributions = total Δ,
    * the property the spec asserts). Exact integers end-to-end; only
    * the share divides (r6). One aggregation + a 1-row broadcast total.
    */
  val a26Contribution = QueryDef(
    "q_a26_contribution",
    (s, dir) => {
      val cents = floor(col("l_extendedprice") *
        (lit(1.0) - col("l_discount")) * 100 + lit(0.5)).cast("long")
      val yr = year(col("l_shipdate"))
      val perFlag = QueryDef.t(s, dir, "lineitem")
        .where(yr === 1997 || yr === 1998)
        .groupBy("l_returnflag")
        .agg(
          sum(when(yr === 1997, cents).otherwise(0L)).as("rev_1997_c"),
          sum(when(yr === 1998, cents).otherwise(0L)).as("rev_1998_c"))
        .withColumn("delta_c", col("rev_1998_c") - col("rev_1997_c"))
      val total = perFlag.agg(sum("delta_c").as("tot_delta"))
      perFlag.crossJoin(broadcast(total))
        .select(col("l_returnflag"), col("rev_1997_c"), col("rev_1998_c"),
          col("delta_c"),
          QueryDef.r6(col("delta_c").cast("double") /
            col("tot_delta").cast("double")).as("contribution"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH pf AS (
        SELECT l_returnflag,
               CAST(sum(CASE WHEN year(l_shipdate) = 1997
                 THEN CAST(floor(l_extendedprice * (1.0e0 - l_discount)
                   * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS rev_1997_c,
               CAST(sum(CASE WHEN year(l_shipdate) = 1998
                 THEN CAST(floor(l_extendedprice * (1.0e0 - l_discount)
                   * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS rev_1998_c
        FROM lineitem
        WHERE year(l_shipdate) IN (1997, 1998)
        GROUP BY 1),
      d AS (SELECT *, rev_1998_c - rev_1997_c AS delta_c FROM pf),
      tot AS (SELECT CAST(sum(delta_c) AS BIGINT) AS tot_delta FROM d)
      SELECT l_returnflag, rev_1997_c, rev_1998_c, delta_c,
             ${QueryDef.sqlR6("CAST(delta_c AS DOUBLE) / CAST(tot_delta AS DOUBLE)")}
               AS contribution
      FROM d CROSS JOIN tot ORDER BY l_returnflag""")
  )

  val all: Seq[QueryDef] = Seq(
    a1QuarterlyPrice, a2YearlyGrowth, a3MonthlyVolume, a4Stats, a5ChartFeed,
    a7MonthlyTrend, a11Corr, a12Cov, a15Distinct, q1Pricing, a25Abc,
    a26Contribution)
}
