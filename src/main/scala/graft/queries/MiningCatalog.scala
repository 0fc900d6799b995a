package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef._

/** Testdata twins of the reference's mining family (SURVEY §2.9 M1–M5):
  * closed-form per-group OLS (normal-equation moments as aggregates — no
  * driver-side iteration), train/test scoring, z-score anomaly detection.
  * K-Means lives in mining.KMeansClusters (not SQL-expressible → no oracle).
  */
object MiningCatalog {

  /** M1 (datamining_analysis.py:43-65): per-group simple OLS fit of
    * price ~ quantity, in-sample R²/MSE — entirely as aggregates:
    * slope = covar_samp/var_samp, R² = corr², MSE = var_pop·(1−R²).
    */
  val m1Ols = QueryDef(
    "q_m1_ols",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          r6(covar_samp(col("l_extendedprice"), col("l_quantity"))
            / var_samp(col("l_quantity"))).as("slope"),
          r2((avg(col("l_extendedprice"))
            - covar_samp(col("l_extendedprice"), col("l_quantity"))
              / var_samp(col("l_quantity")) * avg(col("l_quantity"))))
            .as("intercept"),
          r6(pow(corr(col("l_extendedprice"), col("l_quantity")), 2)).as("r2"),
          r2(var_pop(col("l_extendedprice"))
            * (lit(1) - pow(corr(col("l_extendedprice"), col("l_quantity")), 2)))
            .as("mse"))
        .orderBy(desc("r2"), col("l_returnflag")),
    Some(s"""
      WITH m AS (
        SELECT l_returnflag,
               covar_samp(l_extendedprice, l_quantity) / var_samp(l_quantity) AS b,
               avg(l_extendedprice) AS ay, avg(l_quantity) AS ax,
               corr(l_extendedprice, l_quantity) AS r,
               var_pop(l_extendedprice) AS vy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, ${sqlR6("b")} AS slope, ${sqlR2("ay - b * ax")} AS intercept,
             ${sqlR6("r * r")} AS r2, ${sqlR2("vy * (1 - r * r)")} AS mse
      FROM m ORDER BY r2 DESC, l_returnflag""")
  )

  /** M2 (datamining_analysis.py:67-100): next-row target (W1) + global
    * population-std scaling (W9) + chronological 80/20 split (W10), fit OLS
    * on train, score R²/MSE on test — composed per returnflag group.
    */
  val m2OlsNextDay = QueryDef(
    "q_m2_ols_next",
    (s, dir) => {
      // Scale note: the natural Window.partitionBy("l_returnflag") version
      // runs 3-wide (3 groups) and a Window.partitionBy() scaler runs
      // 1-wide — measured 5.5× degradation at 10× data (tools.Soak). The
      // scaler is a 1-row aggregate broadcast back; lead/row_number go
      // through plans.SequenceOps (range-partitioned two-pass, equal
      // semantics, P-way parallel). The DuckDB oracle is unchanged.
      val seqKeys = Seq("l_shipdate", "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice")
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag") +: seqKeys.map(col): _*)
      val stats = li.agg(avg(col("l_quantity")).as("__mu"),
        stddev_pop(col("l_quantity")).as("__sd"))
      val withX = li.crossJoin(broadcast(stats))
        .withColumn("x", (col("l_quantity") - col("__mu")) / col("__sd"))
        .drop("__mu", "__sd")
      // one sequence pass computes both: the only dropped row (y null) is
      // each group's LAST row, so row numbers over the unfiltered set equal
      // row numbers over the filtered set for every kept row
      val withRn = graft.plans.SequenceOps.withSequenceCols(withX,
          Seq("l_returnflag"), seqKeys,
          leadSrc = Some("l_extendedprice"), leadOut = "y",
          rnCol = Some("rn"))
        .filter(col("y").isNotNull)
      // the train/test branches below both consume this frame; Spark plans
      // common subtrees twice, so materialize the sequence output once
      val withRnC = withRn.cache()
      val counts = withRnC.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val base = withRnC.join(broadcast(counts), Seq("l_returnflag"))
        .withColumn("is_train", col("rn") <= col("n") - ceil(col("n") * 0.2))
      val coefs = base.filter(col("is_train"))
        .groupBy("l_returnflag")
        .agg(
          (covar_samp(col("y"), col("x")) / var_samp(col("x"))).as("b"),
          (avg(col("y")) - covar_samp(col("y"), col("x"))
            / var_samp(col("x")) * avg(col("x"))).as("a"))
      val test = base.filter(!col("is_train"))
        .join(broadcast(coefs), Seq("l_returnflag"))
        .withColumn("resid", col("y") - (col("a") + col("b") * col("x")))
      val ybars = test.groupBy("l_returnflag").agg(avg(col("y")).as("ybar"))
      test
        .join(broadcast(ybars), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(
          r6(lit(1) - sum(col("resid") * col("resid"))
            / sum((col("y") - col("ybar")) * (col("y") - col("ybar"))))
            .as("r2_test"),
          r2(avg(col("resid") * col("resid"))).as("mse_test"),
          count(lit(1)).as("n_test"))
        .orderBy(desc("r2_test"), col("l_returnflag"))
    },
    Some(s"""
      WITH base AS (
        SELECT l_returnflag,
               (l_quantity - avg(l_quantity) OVER ()) / stddev_pop(l_quantity) OVER () AS x,
               lead(l_extendedprice, 1) OVER (PARTITION BY l_returnflag ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS y,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n0
        FROM lineitem),
      f AS (
        SELECT l_returnflag, x, y,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY rn) AS rn2,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM base WHERE y IS NOT NULL),
      s AS (
        SELECT *, rn2 <= n - ceil(n * 0.2) AS is_train FROM f),
      coefs AS (
        SELECT l_returnflag,
               covar_samp(y, x) / var_samp(x) AS b,
               avg(y) - covar_samp(y, x) / var_samp(x) * avg(x) AS a
        FROM s WHERE is_train GROUP BY 1),
      test AS (
        SELECT s.l_returnflag, s.y, s.y - (c.a + c.b * s.x) AS resid,
               avg(s.y) OVER (PARTITION BY s.l_returnflag) AS ybar
        FROM s JOIN coefs c ON s.l_returnflag = c.l_returnflag
        WHERE NOT s.is_train)
      SELECT l_returnflag,
             ${sqlR6("1 - sum(resid * resid) / sum((y - ybar) * (y - ybar))")} AS r2_test,
             ${sqlR2("avg(resid * resid)")} AS mse_test,
             count(*) AS n_test
      FROM test GROUP BY 1 ORDER BY r2_test DESC, l_returnflag""")
  )

  /** M4 (datamining_analysis.py:125-131): per-group z-score anomalies,
    * |z| > 2, full row + score, sorted.
    */
  val m4Anomalies = QueryDef(
    "q_m4_anomalies",
    (s, dir) => {
      val wAll = Window.partitionBy("o_custkey")
      t(s, dir, "orders")
        .withColumn("z",
          (col("o_totalprice") - avg(col("o_totalprice")).over(wAll))
            / stddev_samp(col("o_totalprice")).over(wAll))
        .filter(abs(col("z")) > 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          r6(col("z")).as("z_score"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some(s"""
      WITH z AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               (o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_custkey))
                 / stddev_samp(o_totalprice) OVER (PARTITION BY o_custkey) AS z
        FROM orders)
      SELECT o_custkey, o_orderkey, o_totalprice, ${sqlR6("z")} AS z_score
      FROM z WHERE abs(z) > 2 ORDER BY o_custkey, o_orderkey""")
  )

  val all: Seq[QueryDef] = Seq(m1Ols, m2OlsNextDay, m4Anomalies)
}
