package graft.queries

import org.apache.spark.sql.Column
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
      // Scale notes: (1) the natural Window.partitionBy("l_returnflag")
      // version runs 3-wide (3 groups) and a Window.partitionBy() scaler
      // runs 1-wide — measured 5.5× degradation at 10× data (tools.Soak);
      // the scaler is a 1-row aggregate broadcast back and lead/row_number
      // go through plans.SequenceOps (range-partitioned two-pass, equal
      // semantics, P-way parallel), which also attaches the per-group total
      // (totalOut) so the split boundary needs no count+join pass.
      // (2) The fit AND the test metrics reduce to per-(group, is_train)
      // SUFFICIENT STATISTICS — one aggregation pass over the sequence
      // output instead of cache + three separate train/test jobs:
      //   b = (Σxy − ΣxΣy/n) / (Σx² − (Σx)²/n),  a = ȳ − b·x̄,
      //   SSres = Σy² + n·a² + b²Σx² − 2aΣy − 2bΣxy + 2abΣx,
      //   SStot = Σy² − n·ȳ².
      // Sums go through exact decimal accumulation (order-independent), so
      // the DuckDB oracle — the same moment formulas — matches bit-for-bit.
      val seqKeys = Seq("l_shipdate", "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice")
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag") +: seqKeys.map(col): _*)
      val stats = li.agg(avg(col("l_quantity")).as("__mu"),
        stddev_pop(col("l_quantity")).as("__sd"))
      val withX = li.crossJoin(broadcast(stats))
        .withColumn("x", (col("l_quantity") - col("__mu")) / col("__sd"))
        .drop("__mu", "__sd")
      // one sequence pass computes lead, row number, and group total; the
      // only dropped row (y null) is each group's LAST row, so row numbers
      // over the unfiltered set equal row numbers over the filtered set for
      // every kept row, and the post-filter group size is total − 1
      val withSplit = graft.plans.SequenceOps.withSequenceCols(withX,
          Seq("l_returnflag"), seqKeys,
          leadSrc = Some("l_extendedprice"), leadOut = "y",
          rnCol = Some("rn"), totalOut = Some("ntot"))
        .filter(col("y").isNotNull)
        .withColumn("n", col("ntot") - 1)
        .withColumn("is_train", col("rn") <= col("n") - ceil(col("n") * 0.2))
      val moments = withSplit.groupBy("l_returnflag", "is_train").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,18)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(28,6)")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,12)")).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,18)")).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,6)")).cast("double").as("syy"))
      // ≤ 2×|groups| rows (6 here) — bounded driver-side collect, so the
      // expensive sequence pipeline executes exactly once
      val mLocal = s.createDataFrame(
        java.util.Arrays.asList(moments.collect(): _*), moments.schema)
      val tr = mLocal.filter(col("is_train")).select(col("l_returnflag"),
        col("n").as("n_t"), col("sx").as("sx_t"), col("sy").as("sy_t"),
        col("sxy").as("sxy_t"), col("sxx").as("sxx_t"))
      val te = mLocal.filter(!col("is_train")).select(col("l_returnflag"),
        col("n").as("n_e"), col("sx").as("sx_e"), col("sy").as("sy_e"),
        col("sxy").as("sxy_e"), col("sxx").as("sxx_e"), col("syy").as("syy_e"))
      te.join(tr, "l_returnflag")
        .withColumn("b", (col("sxy_t") - col("sx_t") * col("sy_t") / col("n_t"))
          / (col("sxx_t") - col("sx_t") * col("sx_t") / col("n_t")))
        .withColumn("a", col("sy_t") / col("n_t") - col("b") * (col("sx_t") / col("n_t")))
        .withColumn("ssres", col("syy_e") + col("n_e") * col("a") * col("a")
          + col("b") * col("b") * col("sxx_e") - lit(2) * col("a") * col("sy_e")
          - lit(2) * col("b") * col("sxy_e")
          + lit(2) * col("a") * col("b") * col("sx_e"))
        .withColumn("sstot", col("syy_e")
          - col("n_e") * (col("sy_e") / col("n_e")) * (col("sy_e") / col("n_e")))
        .select(col("l_returnflag"),
          r6(lit(1) - col("ssres") / col("sstot")).as("r2_test"),
          r2(col("ssres") / col("n_e")).as("mse_test"),
          col("n_e").as("n_test"))
        .orderBy(desc("r2_test"), col("l_returnflag"))
    },
    Some(s"""
      WITH base AS (
        SELECT l_returnflag,
               (l_quantity - avg(l_quantity) OVER ()) / stddev_pop(l_quantity) OVER () AS x,
               lead(l_extendedprice, 1) OVER (PARTITION BY l_returnflag ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS y,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS rn
        FROM lineitem),
      f AS (
        SELECT l_returnflag, x, y, rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM base WHERE y IS NOT NULL),
      s AS (
        SELECT *, rn <= n - ceil(n * 0.2) AS is_train FROM f),
      m AS (
        SELECT l_returnflag, is_train, count(*) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        FROM s GROUP BY 1, 2),
      j AS (
        SELECT t.l_returnflag,
               t.n AS n_t, t.sx AS sx_t, t.sy AS sy_t, t.sxy AS sxy_t,
               t.sxx AS sxx_t,
               e.n AS n_e, e.sx AS sx_e, e.sy AS sy_e, e.sxy AS sxy_e,
               e.sxx AS sxx_e, e.syy AS syy_e
        FROM m t JOIN m e ON t.l_returnflag = e.l_returnflag
          AND t.is_train AND NOT e.is_train),
      c AS (
        SELECT *, (sxy_t - sx_t * sy_t / n_t) / (sxx_t - sx_t * sx_t / n_t) AS b
        FROM j),
      c2 AS (SELECT *, sy_t / n_t - b * (sx_t / n_t) AS a FROM c),
      r AS (
        SELECT l_returnflag, n_e,
               syy_e + n_e * a * a + b * b * sxx_e - 2 * a * sy_e
                 - 2 * b * sxy_e + 2 * a * b * sx_e AS ssres,
               syy_e - n_e * (sy_e / n_e) * (sy_e / n_e) AS sstot
        FROM c2)
      SELECT l_returnflag,
             ${sqlR6("1 - ssres / sstot")} AS r2_test,
             ${sqlR2("ssres / n_e")} AS mse_test,
             n_e AS n_test
      FROM r ORDER BY r2_test DESC, l_returnflag""")
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

  // q_m5_ridge penalty — absolute λ on the centered normal equations,
  // interpolated into BOTH engines' formulas
  private val RidgeLambda = 1000.0

  /** M5 capability: closed-form ridge regression (Tikhonov / L2), two
    * features + unpenalized intercept, per returnflag — the regularized
    * sibling of M1's OLS. With centered features the normal equations are
    * (X'X + λI)β = X'z where X'X entries are n·covar_pop — all from ONE
    * aggregation pass (sufficient statistics, the same no-iteration shape
    * as M1/M2); the 2×2 system inverts symbolically via its determinant.
    * Both engines compose the identical formula from their own float
    * moment aggregates → r-rounded like every moments-based gate (A11/M1).
    * λ > 0 makes the system strictly positive-definite, so det > 0 always.
    */
  val m5Ridge = QueryDef(
    "q_m5_ridge",
    (s, dir) => {
      val n = count(lit(1)).cast("double")
      val sxx = covar_pop(col("l_quantity"), col("l_quantity")) * n
      val syy = covar_pop(col("l_discount"), col("l_discount")) * n
      val sxy = covar_pop(col("l_quantity"), col("l_discount")) * n
      val sxz = covar_pop(col("l_quantity"), col("l_extendedprice")) * n
      val syz = covar_pop(col("l_discount"), col("l_extendedprice")) * n
      val lam = lit(RidgeLambda)
      val det = (sxx + lam) * (syy + lam) - sxy * sxy
      val b1 = ((syy + lam) * sxz - sxy * syz) / det
      val b2 = ((sxx + lam) * syz - sxy * sxz) / det
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          r6(b1).as("beta_qty"),
          r2(b2).as("beta_disc"),
          r2(avg(col("l_extendedprice")) - b1 * avg(col("l_quantity"))
            - b2 * avg(col("l_discount"))).as("intercept"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               covar_pop(l_quantity, l_quantity) AS cxx,
               covar_pop(l_discount, l_discount) AS cyy,
               covar_pop(l_quantity, l_discount) AS cxy,
               covar_pop(l_quantity, l_extendedprice) AS cxz,
               covar_pop(l_discount, l_extendedprice) AS cyz,
               avg(l_extendedprice) AS az, avg(l_quantity) AS ax,
               avg(l_discount) AS ay, count(*) AS cnt
        FROM lineitem GROUP BY 1),
      f AS (
        SELECT l_returnflag, az, ax, ay, cnt,
               ((cyy*n + $RidgeLambda) * (cxz*n) - (cxy*n) * (cyz*n))
                 / ((cxx*n + $RidgeLambda) * (cyy*n + $RidgeLambda)
                    - (cxy*n) * (cxy*n)) AS b1,
               ((cxx*n + $RidgeLambda) * (cyz*n) - (cxy*n) * (cxz*n))
                 / ((cxx*n + $RidgeLambda) * (cyy*n + $RidgeLambda)
                    - (cxy*n) * (cxy*n)) AS b2
        FROM m)
      SELECT l_returnflag, ${sqlR6("b1")} AS beta_qty, ${sqlR2("b2")} AS beta_disc,
             ${sqlR2("az - b1 * ax - b2 * ay")} AS intercept, cnt AS n
      FROM f ORDER BY l_returnflag""")
  )

  // q_m6_cv fold count, shared by both engines
  private val CvFolds = 5

  /** M6 capability: k-fold cross-validation of the M1-style OLS,
    * distributed WITHOUT retraining per fold AND without a scoring pass:
    * one scan computes per-fold raw moments (n, Σx, Σy, Σx², Σxy, Σy²) as
    * EXACT decimal sums; each fold's train model is (total − fold) moment
    * subtraction (exact); and the test MSE is the closed form
    * Σ(y−a−bx)² = Σy² − 2aΣy − 2bΣxy + b²Σx² + 2abΣx + a²n over the TEST
    * fold's own moments — a fixed float expression over identical doubles,
    * so the gate is BIT-EXACT. Fold membership is the engine-portable md5
    * bucket (the q_t_split mechanism).
    *
    * Portability details (each failed the hash gate in earlier forms):
    * Σy²/Σxy accumulate at the squares' TRUE scale (4/3 decimals — cents²
    * is exactly a 4-decimal value, so the double→decimal cast is exact in
    * both engines; at scale 6 the scaled y² tops 2^53 for prices > ~95k
    * and DuckDB's double-arithmetic cast drifts), and every decimal→double
    * cast goes through decD (plain casts of ~1e14 sums are 1 ulp apart).
    */
  val m6Cv = QueryDef(
    "q_m6_cv",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"),
          graft.text.TextAnalysis.hashBucket(
            concat_ws("#", col("l_orderkey"), col("l_linenumber")), CvFolds)
            .as("fold"))
      val folds = li.groupBy("fold").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,6)")).as("sx"),
        sum(col("y").cast("decimal(28,6)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(28,6)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(28,3)")).as("sxy"),
        sum((col("y") * col("y")).cast("decimal(28,4)")).as("syy"))
        // cached: 5 rows, two consumers (tot + the final select) — without
        // it each re-runs the full md5+moments scan; Bench/Verify free it
        // via clearCaches like every operator-pinned intermediate
        .cache()
      val tot = folds.agg(sum(col("n")).as("tn"), sum(col("sx")).as("tsx"),
        sum(col("sy")).as("tsy"), sum(col("sxx")).as("tsxx"),
        sum(col("sxy")).as("tsxy"))
      // train moments = total − fold (exact); coefficients compose in
      // double from identical operands
      val n = (col("tn") - col("n")).cast("double")
      val sx = decD(col("tsx") - col("sx"))
      val sy = decD(col("tsy") - col("sy"))
      val sxx = decD(col("tsxx") - col("sxx"))
      val sxy = decD(col("tsxy") - col("sxy"))
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val tn = col("n").cast("double")
      val tsx = decD(col("sx"))
      val tsy = decD(col("sy"))
      val tsxx = decD(col("sxx"))
      val tsxy = decD(col("sxy"))
      val tsyy = decD(col("syy"))
      folds.crossJoin(broadcast(tot))
        .select(col("fold"), (col("tn") - col("n")).as("train_n"),
          col("n").as("test_n"), b.as("slope"), a.as("intercept"),
          ((tsyy - lit(2.0) * a * tsy - lit(2.0) * b * tsxy
            + b * b * tsxx + lit(2.0) * a * b * tsx + a * a * tn) / tn)
            .as("test_mse"))
        .orderBy("fold")
    },
    Some(s"""
      WITH li AS (
        SELECT l_quantity AS x, l_extendedprice AS y,
               CAST(('0x' || substr(md5(l_orderkey::VARCHAR || '#' ||
                 l_linenumber::VARCHAR), 1, 15)) AS BIGINT) % $CvFolds
                 AS fold
        FROM lineitem),
      folds AS (
        SELECT fold, count(*) AS n,
               sum(CAST(x AS DECIMAL(28,6))) AS sx,
               sum(CAST(y AS DECIMAL(28,6))) AS sy,
               sum(CAST(x * x AS DECIMAL(28,6))) AS sxx,
               sum(CAST(x * y AS DECIMAL(28,3))) AS sxy,
               sum(CAST(y * y AS DECIMAL(28,4))) AS syy
        FROM li GROUP BY 1),
      tot AS (
        SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
               sum(sxx) AS tsxx, sum(sxy) AS tsxy
        FROM folds),
      coefs AS (
        SELECT fold, CAST(tn - n AS BIGINT) AS train_n, n AS test_n,
               (CAST(tn - n AS DOUBLE) * ${sqlDecD("tsxy - sxy")}
                - ${sqlDecD("tsx - sx")} * ${sqlDecD("tsy - sy")})
               / (CAST(tn - n AS DOUBLE) * ${sqlDecD("tsxx - sxx")}
                  - ${sqlDecD("tsx - sx")} * ${sqlDecD("tsx - sx")})
                 AS slope,
               ${sqlDecD("tsx - sx")} AS _sx,
               ${sqlDecD("tsy - sy")} AS _sy,
               CAST(tn - n AS DOUBLE) AS _n,
               CAST(n AS DOUBLE) AS fn,
               ${sqlDecD("sx")} AS fsx, ${sqlDecD("sy")} AS fsy,
               ${sqlDecD("sxx")} AS fsxx, ${sqlDecD("sxy")} AS fsxy,
               ${sqlDecD("syy")} AS fsyy
        FROM folds CROSS JOIN tot),
      c2 AS (
        SELECT fold, train_n, test_n, slope,
               (_sy - slope * _sx) / _n AS intercept,
               fn, fsx, fsy, fsxx, fsxy, fsyy
        FROM coefs)
      SELECT fold, train_n, test_n, slope, intercept,
             (fsyy - 2.0 * intercept * fsy - 2.0 * slope * fsxy
              + slope * slope * fsxx + 2.0 * intercept * slope * fsx
              + intercept * intercept * fn) / fn AS test_mse
      FROM c2
      ORDER BY fold""")
  )

  /** M7 capability: Mann–Whitney U rank-sum test (does returnflag A's
    * price distribution stochastically dominate R's?) — computed WITHOUT
    * a global sort: prices become integer cents, the value HISTOGRAM is
    * one groupBy, the cumulative count runs through
    * plans.SequenceOps.runningSum (range-partitioned exact prefix sum),
    * and tie-averaged ranks are carried as 2×-SCALED INTEGERS
    * (rank2 = 2·cumBefore + n + 1), so rank sums, the U statistic, and
    * the tie-correction term Σ(t³−t) are ALL exact integer arithmetic —
    * bit-exact across engines; only the final normal-approximation z
    * composes in double (identical operands) and takes r6. This is the
    * scipy.stats.mannwhitneyu capability, shaped for data that does not
    * fit one sorter.
    */
  val m7Mwu = QueryDef(
    "q_m7_mwu",
    (s, dir) => {
      val src = t(s, dir, "lineitem")
        .where(col("l_returnflag").isin("A", "R"))
        .select(
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"),
          col("l_returnflag").as("g"))
      graft.analytics.RankStats.mannWhitney(src, "cents", "g", "A")
        .select(col("n_a"), col("n_b"), col("u_a"), r6(col("z")).as("z"))
    },
    Some(s"""
      WITH src AS (
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               l_returnflag AS g
        FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      h AS (
        SELECT cents,
               CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
               count(*) AS n
        FROM src GROUP BY 1),
      c AS (
        SELECT cents, na, n,
               CAST(sum(n) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM h),
      r AS (
        SELECT na, n, 2 * (cum - n) + n + 1 AS rank2 FROM c),
      a AS (
        SELECT CAST(sum(na * rank2) AS BIGINT) AS rs2a,
               CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(n - na) AS BIGINT) AS n_b,
               CAST(sum(n * n * n - n) AS BIGINT) AS sum_t
        FROM r)
      SELECT n_a, n_b,
             CAST(rs2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
             ${sqlR6("""(CAST(rs2a - n_a * (n_a + 1) AS DOUBLE) / 2.0
                 - CAST(n_a * n_b AS DOUBLE) / 2.0)
               / sqrt(CAST(n_a * n_b AS DOUBLE) / 12.0
                 * (CAST(n_a + n_b + 1 AS DOUBLE)
                    - CAST(sum_t AS DOUBLE)
                      / CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)))""")} AS z
      FROM a""")
  )

  /** M8 capability: two-sample Kolmogorov–Smirnov (A vs R price CDFs) via
    * analytics.RankStats — D is an exact integer maximum
    * (|cumA·n_b − cumB·n_a| over the value histogram, two
    * SequenceOps prefix sums, no global sort), so `d` is bit-exact; the
    * asymptotic p composes in double from identical operands and takes
    * r6 for the one `exp`.
    */
  val m8Ks = QueryDef(
    "q_m8_ks",
    (s, dir) => {
      val src = t(s, dir, "lineitem")
        .where(col("l_returnflag").isin("A", "R"))
        .select(
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"),
          col("l_returnflag").as("g"))
      graft.analytics.RankStats.kolmogorovSmirnov(src, "cents", "g", "A")
        .select(col("n_a"), col("n_b"), col("d"),
          r6(col("p_approx")).as("p_approx"))
    },
    Some(s"""
      WITH src AS (
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               l_returnflag AS g
        FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      h AS (
        SELECT cents,
               CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
               count(*) AS n
        FROM src GROUP BY 1),
      c AS (
        SELECT cents, na, n,
               CAST(sum(n) OVER w AS BIGINT) AS cum,
               CAST(sum(na) OVER w AS BIGINT) AS cum_a
        FROM h
        WINDOW w AS (ORDER BY cents
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      tot AS (
        SELECT CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(n - na) AS BIGINT) AS n_b
        FROM h),
      m AS (
        SELECT tot.n_a, tot.n_b,
               max(abs(c.cum_a * tot.n_b
                 - (c.cum - c.cum_a) * tot.n_a)) AS d_num
        FROM c CROSS JOIN tot GROUP BY 1, 2)
      SELECT n_a, n_b,
             CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS d,
             ${sqlR6("""2.0 * exp(-2.0
               * (CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE))
               * (CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE))
               * CAST(n_a * n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))""")}
               AS p_approx
      FROM m""")
  )

  /** M9 capability: Gaussian Naive Bayes classifier, trained and scored
    * fully inside the engine — predict l_returnflag from (quantity,
    * discount, tax). Deterministic 80/20 split via the portable
    * md5-prefix bucket; per-class priors/means/variances from exact
    * decimal sums (bit-identical across engines), pivoted into a SINGLE
    * broadcast parameter row so prediction is a scan-local expression —
    * all three class scores computed inline per row, argmax as a fixed
    * CASE with a deterministic class-preference tie-break. No per-row
    * grouping at all (row keys need not be unique) and zero shuffles on
    * the scoring side at any scale. The log-density is the one
    * transcendental step → scores take r6, the repo's rank-on-rounded-
    * value contract. Output is the confusion matrix (≤9 rows) — the
    * end-to-end train+predict gate.
    */
  val m9Nbayes = QueryDef(
    "q_m9_nbayes",
    (s, dir) => {
      val feats = Seq("l_quantity", "l_discount", "l_tax")
      val classes = Seq("A", "N", "R")
      val b = t(s, dir, "lineitem").withColumn("bkt",
        graft.functions.Md5Prefix60.md5Prefix60(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"))) % 5)
      def s18(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,18)")).cast("double")
      val sums = feats.flatMap(f => Seq(
        s18(col(f)).as(s"s_$f"), s18(col(f) * col(f)).as(s"s2_$f")))
      val aggs = count(lit(1)).as("n_c") +: sums
      val params = b.where(col("bkt") =!= 0)
        .groupBy(col("l_returnflag").as("cls"))
        .agg(aggs.head, aggs.tail: _*)
      // pivot the ≤|classes| parameter rows into ONE wide row (conditional
      // max — each cell present exactly once), broadcast to the scorers
      val wideAgg = classes.flatMap { cl =>
        max(when(col("cls") === cl, col("n_c"))).as(s"n_$cl") +:
          feats.flatMap(f => Seq(
            max(when(col("cls") === cl, col(s"s_$f"))).as(s"s_${cl}_$f"),
            max(when(col("cls") === cl, col(s"s2_$f"))).as(s"s2_${cl}_$f")))
      }
      val wide = params.agg(wideAgg.head, wideAgg.tail: _*)
      val nTot = classes.map(cl => col(s"n_$cl")).reduce(_ + _)
      val twoPi = lit(6.283185307179586)
      def scoreFor(cl: String): org.apache.spark.sql.Column = {
        val prior = col(s"n_$cl").cast("double") / nTot.cast("double")
        val ll = feats.map { f =>
          val mu = col(s"s_${cl}_$f") / col(s"n_$cl")
          val v = col(s"s2_${cl}_$f") / col(s"n_$cl") - mu * mu
          log(twoPi * v) + (col(f) - mu) * (col(f) - mu) / v
        }.reduce(_ + _)
        r6(log(prior) - lit(0.5) * ll)
      }
      b.where(col("bkt") === 0)
        .crossJoin(broadcast(wide))
        .select(col("l_returnflag"), scoreFor("A").as("sa"),
          scoreFor("N").as("sn"), scoreFor("R").as("sr"))
        .withColumn("predicted",
          when(col("sa") >= col("sn") && col("sa") >= col("sr"), "A")
            .when(col("sn") >= col("sr"), "N").otherwise("R"))
        .groupBy("l_returnflag", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "predicted")
    },
    Some {
      val feats = Seq("l_quantity", "l_discount", "l_tax")
      val classes = Seq("A", "N", "R")
      val sums = feats.map(f =>
        s"""CAST(sum(CAST($f AS DECIMAL(38,18))) AS DOUBLE) AS s_$f,
            CAST(sum(CAST($f * $f AS DECIMAL(38,18))) AS DOUBLE) AS s2_$f""")
        .mkString(",\n")
      val cells = classes.map(cl =>
        (s"max(CASE WHEN cls = '$cl' THEN n_c END) AS n_$cl" +:
          feats.flatMap(f => Seq(
            s"max(CASE WHEN cls = '$cl' THEN s_$f END) AS s_${cl}_$f",
            s"max(CASE WHEN cls = '$cl' THEN s2_$f END) AS s2_${cl}_$f")))
          .mkString(",\n")).mkString(",\n")
      val nTot = classes.map(cl => s"n_$cl").mkString(" + ")
      def scoreFor(cl: String): String = {
        val ll = feats.map { f =>
          val mu = s"(s_${cl}_$f / n_$cl)"
          val v = s"(s2_${cl}_$f / n_$cl - $mu * $mu)"
          s"ln(6.283185307179586 * $v) + ($f - $mu) * ($f - $mu) / $v"
        }.mkString(" + ")
        sqlR6(s"ln(CAST(n_$cl AS DOUBLE) / CAST($nTot AS DOUBLE)) " +
          s"- 0.5 * ($ll)")
      }
      s"""
      WITH b AS (
        SELECT *, CAST('0x' || substr(md5(l_orderkey::VARCHAR || '|' ||
                 l_linenumber::VARCHAR), 1, 15) AS BIGINT) % 5 AS bkt
        FROM lineitem),
      p0 AS (
        SELECT l_returnflag AS cls, count(*) AS n_c,
               $sums
        FROM b WHERE bkt <> 0 GROUP BY 1),
      wide AS (
        SELECT $cells
        FROM p0),
      scored AS (
        SELECT t.l_returnflag,
               ${scoreFor("A")} AS sa, ${scoreFor("N")} AS sn,
               ${scoreFor("R")} AS sr
        FROM (SELECT * FROM b WHERE bkt = 0) t CROSS JOIN wide),
      pred AS (
        SELECT l_returnflag,
               CASE WHEN sa >= sn AND sa >= sr THEN 'A'
                    WHEN sn >= sr THEN 'N' ELSE 'R' END AS predicted
        FROM scored)
      SELECT l_returnflag, predicted, count(*) AS n
      FROM pred GROUP BY 1, 2 ORDER BY 1, 2"""
    }
  )

  /** M10 capability: logistic regression — one Newton-Raphson (IRLS) step
    * from β = 0, per returnflag, P(l_linestatus = 'F') ~ (quantity,
    * discount). At β = 0 the update is closed-form: with centered
    * features, β_feat = 4·(Xc'Xc)⁻¹·Xc'(y−½) and β₀ = 4·mean(y−½) — the
    * X'X blocks are n·covar_pop, so the whole step is ONE aggregation
    * pass and a symbolic 2×2 inverse, the same sufficient-statistics
    * shape as M5's ridge (no iteration, no driver loop; at 100 TB this
    * is one map-side-combined reduce). Honest naming: it is the first
    * IRLS iterate, not a converged fit — the standard distributed
    * "one-step" estimator. Both engines compose the identical formula
    * from their own float moments → r6/r2 like every moments gate.
    */
  val m10LogregStep = QueryDef(
    "q_m10_logreg_step",
    (s, dir) => {
      val y = when(col("l_linestatus") === "F", 1.0).otherwise(0.0)
      val n = count(lit(1)).cast("double")
      val sxx = covar_pop(col("l_quantity"), col("l_quantity")) * n
      val sdd = covar_pop(col("l_discount"), col("l_discount")) * n
      val sxd = covar_pop(col("l_quantity"), col("l_discount")) * n
      val sxy = covar_pop(col("l_quantity"), y) * n
      val sdy = covar_pop(col("l_discount"), y) * n
      val det = sxx * sdd - sxd * sxd
      val b1 = lit(4.0) * (sdd * sxy - sxd * sdy) / det
      val b2 = lit(4.0) * (sxx * sdy - sxd * sxy) / det
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          r6(lit(4.0) * (avg(y) - lit(0.5))).as("beta0"),
          r6(b1).as("beta_qty"),
          r2(b2).as("beta_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag, count(*) AS n,
               avg(CASE WHEN l_linestatus = 'F' THEN 1.0 ELSE 0.0 END) AS ay,
               covar_pop(l_quantity, l_quantity) * count(*) AS sxx,
               covar_pop(l_discount, l_discount) * count(*) AS sdd,
               covar_pop(l_quantity, l_discount) * count(*) AS sxd,
               covar_pop(l_quantity,
                 CASE WHEN l_linestatus = 'F' THEN 1.0 ELSE 0.0 END)
                 * count(*) AS sxy,
               covar_pop(l_discount,
                 CASE WHEN l_linestatus = 'F' THEN 1.0 ELSE 0.0 END)
                 * count(*) AS sdy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
             ${sqlR6("4.0 * (ay - 0.5)")} AS beta0,
             ${sqlR6("""4.0 * (sdd * sxy - sxd * sdy)
               / (sxx * sdd - sxd * sxd)""")} AS beta_qty,
             ${sqlR2("""4.0 * (sxx * sdy - sxd * sxy)
               / (sxx * sdd - sxd * sxd)""")} AS beta_disc,
             n
      FROM m ORDER BY l_returnflag""")
  )

  /** M11 capability: Welch's unequal-variance two-sample t-test (price of
    * A-flag vs R-flag lines) with the Welch–Satterthwaite degrees of
    * freedom — the parametric sibling of M7's Mann–Whitney. Means and
    * sample variances come from exact decimal sums (order-independent,
    * bit-identical across engines); t and df are fixed float expressions
    * over those exact moments → r6. One aggregation pass, two rows in,
    * one row out.
    */
  val m11Welch = QueryDef(
    "q_m11_welch",
    (s, dir) => {
      def s18(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,6)")).cast("double")
      val g = t(s, dir, "lineitem")
        .where(col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          s18(col("l_extendedprice")).as("s1"),
          s18(col("l_extendedprice") * col("l_extendedprice")).as("s2"))
        .select(col("l_returnflag"), col("n"),
          (col("s1") / col("n")).as("mu"),
          ((col("s2") - col("s1") * col("s1") / col("n").cast("double")) /
            (col("n") - 1L).cast("double")).as("v"))
      val a = g.where(col("l_returnflag") === "A")
        .select(col("n").as("n_a"), col("mu").as("mu_a"), col("v").as("v_a"))
      val r = g.where(col("l_returnflag") === "R")
        .select(col("n").as("n_r"), col("mu").as("mu_r"), col("v").as("v_r"))
      val se2a = col("v_a") / col("n_a").cast("double")
      val se2r = col("v_r") / col("n_r").cast("double")
      a.crossJoin(broadcast(r)).select(
        col("n_a"), col("n_r"),
        r6((col("mu_a") - col("mu_r")) / sqrt(se2a + se2r)).as("t_stat"),
        r2((se2a + se2r) * (se2a + se2r) /
          (se2a * se2a / (col("n_a") - 1L).cast("double") +
            se2r * se2r / (col("n_r") - 1L).cast("double"))).as("df"))
    },
    Some(s"""
      WITH g AS (
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS s1,
               CAST(sum(CAST(l_extendedprice * l_extendedprice
                 AS DECIMAL(38,6))) AS DOUBLE) AS s2
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      m AS (
        SELECT l_returnflag, n, s1 / n AS mu,
               (s2 - s1 * s1 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
                 AS v
        FROM g),
      j AS (
        SELECT a.n AS n_a, a.mu AS mu_a, a.v AS v_a,
               r.n AS n_r, r.mu AS mu_r, r.v AS v_r,
               a.v / CAST(a.n AS DOUBLE) AS se2a,
               r.v / CAST(r.n AS DOUBLE) AS se2r
        FROM (SELECT * FROM m WHERE l_returnflag = 'A') a
        CROSS JOIN (SELECT * FROM m WHERE l_returnflag = 'R') r)
      SELECT n_a, n_r,
             ${sqlR6("(mu_a - mu_r) / sqrt(se2a + se2r)")} AS t_stat,
             ${sqlR2("""(se2a + se2r) * (se2a + se2r)
               / (se2a * se2a / CAST(n_a - 1 AS DOUBLE)
                  + se2r * se2r / CAST(n_r - 1 AS DOUBLE))""")} AS df
      FROM j""")
  )

  /** M12 capability: per-flag Spearman rank correlation between quantity
    * and price via analytics.RankStats — midranks from value histograms +
    * range-partitioned prefix sums (no global sort), 2×-scaled integer
    * ranks, exact DECIMAL(38,0) moments; `rho` composes in double from
    * identical operands in both engines → bit-exact, no rounding. The
    * scipy.stats.spearmanr capability shaped for data too large for one
    * sorter.
    */
  val m12Spearman = QueryDef(
    "q_m12_spearman",
    (s, dir) => {
      val src = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"))
      graft.analytics.RankStats.spearman(src, "x", "y", "g")
        .orderBy("g")
    },
    Some("""
      WITH src AS (
        SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem),
      hx AS (SELECT g, x, count(*) AS c FROM src GROUP BY 1, 2),
      cx AS (
        SELECT g, x,
               2 * (CAST(sum(c) OVER (PARTITION BY g ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) - c) + c + 1 AS rx2
        FROM hx),
      hy AS (SELECT g, y, count(*) AS c FROM src GROUP BY 1, 2),
      cy AS (
        SELECT g, y,
               2 * (CAST(sum(c) OVER (PARTITION BY g ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) - c) + c + 1 AS ry2
        FROM hy),
      j AS (
        SELECT s.g, cx.rx2, cy.ry2
        FROM src s
        JOIN cx ON cx.g = s.g AND cx.x = s.x
        JOIN cy ON cy.g = s.g AND cy.y = s.y),
      a AS (
        SELECT g, count(*) AS n,
               CAST(sum(CAST(rx2 AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(sum(CAST(ry2 AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(sum(CAST(rx2 AS HUGEINT) * rx2) AS DOUBLE) AS sxx,
               CAST(sum(CAST(ry2 AS HUGEINT) * ry2) AS DOUBLE) AS syy,
               CAST(sum(CAST(rx2 AS HUGEINT) * ry2) AS DOUBLE) AS sxy
        FROM j GROUP BY g)
      SELECT g, n,
             (CAST(n AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n AS DOUBLE) * syy - sy * sy)) AS rho
      FROM a ORDER BY g""")
  )

  /** M13 capability: robust per-flag anomaly screen — median/MAD modified
    * z-score (Iglewicz–Hoaglin) via analytics.RankStats.medianMad: medians
    * are exact order statistics selected from value histograms + prefix
    * sums (no global sort), carried doubled (med2, mad4) so everything up
    * to the one float comparison is exact integer arithmetic → bit-exact,
    * no rounding. The robust counterpart to q_m4's mean/σ z-scores (MAD
    * has a 50% breakdown point where σ has 0%).
    */
  val m13Robust = QueryDef(
    "q_m13_robust",
    (s, dir) => {
      val src = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("v"))
      graft.analytics.RankStats.medianMad(src, "v", "g")
        .orderBy("g")
    },
    Some("""
      WITH src AS (
        SELECT l_returnflag AS g,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        FROM lineitem),
      h AS (SELECT g, v, count(*) AS c FROM src GROUP BY 1, 2),
      cu AS (
        SELECT g, v, c,
               CAST(sum(c) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum,
               CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM h),
      m AS (
        SELECT g,
               CAST(sum(v * (
                 CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
                   THEN 1 ELSE 0 END +
                 CASE WHEN cum - c < (n + 2) // 2 AND (n + 2) // 2 <= cum
                   THEN 1 ELSE 0 END)) AS BIGINT) AS med2
        FROM cu GROUP BY g),
      dev AS (
        SELECT s.g, abs(2 * s.v - m.med2) AS d, m.med2
        FROM src s JOIN m ON m.g = s.g),
      hd AS (SELECT g, d, count(*) AS c FROM dev GROUP BY 1, 2),
      cud AS (
        SELECT g, d, c,
               CAST(sum(c) OVER (PARTITION BY g ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum,
               CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM hd),
      md AS (
        SELECT g,
               CAST(sum(d * (
                 CASE WHEN cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
                   THEN 1 ELSE 0 END +
                 CASE WHEN cum - c < (n + 2) // 2 AND (n + 2) // 2 <= cum
                   THEN 1 ELSE 0 END)) AS BIGINT) AS mad4
        FROM cud GROUP BY g)
      SELECT dev.g, count(*) AS n, dev.med2, md.mad4,
             CAST(sum(CASE WHEN 0.6745 * CAST(2 * dev.d AS DOUBLE)
               > 3.5 * CAST(md.mad4 AS DOUBLE) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
      FROM dev JOIN md ON md.g = dev.g
      GROUP BY dev.g, dev.med2, md.mad4
      ORDER BY dev.g""")
  )

  /** M14 capability: one-way ANOVA of price across the three returnflag
    * groups — the k-sample generalization of M11's two-sample t. All
    * moments (n, Σx, Σx² per group) are exact decimal sums pivoted to ONE
    * row with a FIXED combination order (A, then N, then R — the same
    * written expression tree in both engines, so the double additions
    * happen in the same order), making SSB/SSW deterministic; F is a fixed
    * float expression over them → r6. One partial-aggregatable scan, one
    * row out — no second pass for the grand mean.
    */
  val m14Anova = QueryDef(
    "q_m14_anova",
    (s, dir) => {
      // Σx at scale 6 (price = 2 decimals → the double→decimal cast is
      // exact in both engines); Σx² at scale 4 — x² = cents²/10⁴ is exactly
      // a 4-decimal value ≤ 1.1e10 whose scaled integer stays < 2^53, so
      // the cast is exact in both engines (at scale 6 the scaled x² tops
      // 2^53 for prices > ~95k and DuckDB's double-arithmetic cast drifts).
      // Decimal→double goes through decD (see QueryDef) — a plain cast of
      // the ~1e14 Σx² is 1 ulp off between engines.
      def s1E(c: org.apache.spark.sql.Column) =
        decD(sum(c.cast("decimal(38,6)")))
      def s2E(c: org.apache.spark.sql.Column) =
        decD(sum(c.cast("decimal(38,4)")))
      def flag(f: String, c: org.apache.spark.sql.Column) =
        when(col("l_returnflag") === f, c).otherwise(lit(null))
      val x = col("l_extendedprice")
      val g = t(s, dir, "lineitem")
        .agg(
          count(flag("A", x)).as("n_a"),
          s1E(flag("A", x)).as("s1_a"),
          s2E(flag("A", x * x)).as("s2_a"),
          count(flag("N", x)).as("n_n"),
          s1E(flag("N", x)).as("s1_n"),
          s2E(flag("N", x * x)).as("s2_n"),
          count(flag("R", x)).as("n_r"),
          s1E(flag("R", x)).as("s1_r"),
          s2E(flag("R", x * x)).as("s2_r"))
      val nT = (col("n_a") + col("n_n") + col("n_r")).cast("double")
      val grand = (col("s1_a") + col("s1_n") + col("s1_r")) / nT
      def ssb1(n: String, s1: String) = {
        val d = col(s1) / col(n).cast("double") - grand
        col(n).cast("double") * d * d
      }
      def ssw1(n: String, s1: String, s2: String) =
        col(s2) - col(s1) * col(s1) / col(n).cast("double")
      val ssb = ssb1("n_a", "s1_a") + ssb1("n_n", "s1_n") +
        ssb1("n_r", "s1_r")
      val ssw = ssw1("n_a", "s1_a", "s2_a") + ssw1("n_n", "s1_n", "s2_n") +
        ssw1("n_r", "s1_r", "s2_r")
      g.select(
        (col("n_a") + col("n_n") + col("n_r")).as("n_total"),
        lit(2L).as("df_between"),
        (col("n_a") + col("n_n") + col("n_r") - lit(3L)).as("df_within"),
        r2(ssb).as("ss_between"),
        r2(ssw).as("ss_within"),
        r6((ssb / lit(2.0)) / (ssw / (nT - lit(3.0)))).as("f_stat"))
    },
    Some {
      def s1S(e: String) =
        sqlDecD(s"sum(CAST(($e) AS DECIMAL(38,6)))")
      def s2S(e: String) =
        sqlDecD(s"sum(CAST(($e) AS DECIMAL(38,4)))")
      def fl(f: String, e: String) =
        s"CASE WHEN l_returnflag = '$f' THEN $e END"
      val ssb = Seq("a", "n", "r").map { k =>
        s"(CAST(n_$k AS DOUBLE) * (s1_$k / CAST(n_$k AS DOUBLE) - grand)" +
          s" * (s1_$k / CAST(n_$k AS DOUBLE) - grand))"
      }.mkString(" + ")
      val ssw = Seq("a", "n", "r")
        .map(k => s"(s2_$k - s1_$k * s1_$k / CAST(n_$k AS DOUBLE))")
        .mkString(" + ")
      s"""
      WITH m AS (
        SELECT count(${fl("A", "l_extendedprice")}) AS n_a,
               ${s1S(fl("A", "l_extendedprice"))} AS s1_a,
               ${s2S(fl("A", "l_extendedprice * l_extendedprice"))} AS s2_a,
               count(${fl("N", "l_extendedprice")}) AS n_n,
               ${s1S(fl("N", "l_extendedprice"))} AS s1_n,
               ${s2S(fl("N", "l_extendedprice * l_extendedprice"))} AS s2_n,
               count(${fl("R", "l_extendedprice")}) AS n_r,
               ${s1S(fl("R", "l_extendedprice"))} AS s1_r,
               ${s2S(fl("R", "l_extendedprice * l_extendedprice"))} AS s2_r
        FROM lineitem),
      g AS (
        SELECT m.*,
               (s1_a + s1_n + s1_r) / CAST(n_a + n_n + n_r AS DOUBLE)
                 AS grand
        FROM m)
      SELECT CAST(n_a + n_n + n_r AS BIGINT) AS n_total,
             CAST(2 AS BIGINT) AS df_between,
             CAST(n_a + n_n + n_r - 3 AS BIGINT) AS df_within,
             ${sqlR2(ssb)} AS ss_between,
             ${sqlR2(ssw)} AS ss_within,
             ${sqlR6(s"(($ssb) / 2.0) / (($ssw) / CAST(n_a + n_n + n_r - 3 AS DOUBLE))")}
               AS f_stat
      FROM g"""
    }
  )

  /** M15 capability: Kendall tau-b per returnflag between the MONTHLY mean
    * quantity and monthly mean price series — rank correlation robust to
    * ties, the scipy.stats.kendalltau capability. The O(n²) pair
    * enumeration runs over the monthly AGGREGATE (calendar-bounded:
    * |months|² pairs per group regardless of input SF — the q_t_vocab
    * _overlap scale argument), never over raw rows; the monthly means are
    * exact decimal averages, so the pair comparisons are exact predicates
    * on identical doubles and C/D/tie counts are exact integers. tau_b is
    * one fixed float expression → r6.
    */
  val m15Kendall = QueryDef(
    "q_m15_kendall",
    (s, dir) => {
      val m = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("g"),
          date_trunc("month", col("l_shipdate")).cast("timestamp_ntz")
            .as("mth"))
        .agg(avgE(col("l_quantity")).as("x"),
          avgE(col("l_extendedprice")).as("y"))
      val a = m.select(col("g"), col("mth").as("m1"), col("x").as("x1"),
        col("y").as("y1"))
      val b = m.select(col("g").as("g2"), col("mth").as("m2"),
        col("x").as("x2"), col("y").as("y2"))
      val pairs = a.join(b, col("g") === col("g2") && col("m1") < col("m2"))
      val c = sum(when((col("x1") < col("x2") && col("y1") < col("y2")) ||
        (col("x1") > col("x2") && col("y1") > col("y2")), 1L)
        .otherwise(0L))
      val d = sum(when((col("x1") < col("x2") && col("y1") > col("y2")) ||
        (col("x1") > col("x2") && col("y1") < col("y2")), 1L)
        .otherwise(0L))
      val tx = sum(when(col("x1") === col("x2") && col("y1") =!= col("y2"),
        1L).otherwise(0L))
      val ty = sum(when(col("y1") === col("y2") && col("x1") =!= col("x2"),
        1L).otherwise(0L))
      val txy = sum(when(col("x1") === col("x2") && col("y1") === col("y2"),
        1L).otherwise(0L))
      pairs.groupBy("g")
        .agg(c.as("conc"), d.as("disc"), tx.as("ties_x"), ty.as("ties_y"),
          txy.as("ties_xy"))
        .select(col("g"), col("conc"), col("disc"), col("ties_x"),
          col("ties_y"),
          r6((col("conc") - col("disc")).cast("double") /
            sqrt(((col("conc") + col("disc") + col("ties_y")).cast("double"))
              * ((col("conc") + col("disc") + col("ties_x"))
                .cast("double")))).as("tau_b"))
        .orderBy("g")
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag AS g,
               date_trunc('month', l_shipdate) AS mth,
               ${sqlAvgE("l_quantity")} AS x,
               ${sqlAvgE("l_extendedprice")} AS y
        FROM lineitem GROUP BY 1, 2),
      p AS (
        SELECT a.g,
          CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                          OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END)
            AS BIGINT) AS conc,
          CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                          OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END)
            AS BIGINT) AS disc,
          CAST(sum(CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END)
            AS BIGINT) AS ties_x,
          CAST(sum(CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END)
            AS BIGINT) AS ties_y,
          CAST(sum(CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END)
            AS BIGINT) AS ties_xy
        FROM m a JOIN m b ON a.g = b.g AND a.mth < b.mth
        GROUP BY a.g)
      SELECT g, conc, disc, ties_x, ties_y,
             ${sqlR6("""CAST(conc - disc AS DOUBLE)
               / sqrt(CAST(conc + disc + ties_y AS DOUBLE)
                      * CAST(conc + disc + ties_x AS DOUBLE))""")} AS tau_b
      FROM p ORDER BY g""")
  )

  /** M16 capability: two-sided CUSUM changepoint detection (Page 1954)
    * over each flag's daily mean price — the drift monitor a data-quality
    * pipeline runs on incoming feeds. The recurrence
    * S⁺_t = max(0, S⁺_{t−1} + (x_t − μ)) looks sequential, but with
    * prefix sums P_t it is S⁺_t = P_t − min(0, min_{j≤t} P_j) (and the
    * negative side mirrors with max) — so it distributes as one
    * cumulative-sum window plus one cumulative-extreme window over the
    * DAILY aggregate, which is calendar-bounded regardless of input SF.
    *
    * Portability: the daily mean is quantized to integer MICRO-units
    * (floor(x·1e6+0.5) — the identical IEEE op sequence in both engines),
    * and the deviation is n·x_t − Σx in those units, so μ never needs a
    * division and every prefix sum / extreme / alarm compare is exact
    * 64-bit integer arithmetic. (The previous decimal(38,18) formulation
    * failed the hash gate: Spark casts double→decimal through the shortest
    * string repr while DuckDB scales in double arithmetic — the cast
    * itself disagreed at 1e-13.) Magnitudes: |dev| ≤ 1e4·1e6·n_days and
    * prefix ≤ n_days× that, ~1e17 at the calendar bound — inside Long.
    * S⁺/S⁻ surface as doubles via one exact-int→double + one division,
    * identical in both engines.
    */
  val m16Cusum = QueryDef(
    "q_m16_cusum",
    (s, dir) => {
      val H = 50000L // alarm threshold on the cumulative deviation sum
      val daily = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("g"),
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz")
            .as("day"))
        .agg(avgE(col("l_extendedprice")).as("x"))
        .withColumn("xu",
          floor(col("x") * lit(1e6) + lit(0.5)).cast("long"))
      val mu = daily.groupBy("g")
        .agg(sum(col("xu")).as("sxu"), count(lit(1)).as("n_days"))
      val w = Window.partitionBy("g").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val den = col("n_days").cast("double") * lit(1e6)
      daily.join(broadcast(mu), "g")
        .withColumn("p",
          sum(col("xu") * col("n_days") - col("sxu")).over(w))
        .withColumn("su_pos",
          col("p") - least(lit(0L), min(col("p")).over(w)))
        .withColumn("su_neg",
          greatest(lit(0L), max(col("p")).over(w)) - col("p"))
        .select(col("g"), col("day"),
          (col("su_pos").cast("double") / den).as("s_pos"),
          (col("su_neg").cast("double") / den).as("s_neg"),
          when(col("su_pos") > lit(H * 1000000L) * col("n_days") ||
            col("su_neg") > lit(H * 1000000L) * col("n_days"), 1L)
            .otherwise(0L).as("alarm"))
        .orderBy("g", "day")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag AS g, date_trunc('day', l_shipdate) AS day,
               CAST(floor(${sqlAvgE("l_extendedprice")} * 1e6 + 0.5)
                 AS BIGINT) AS xu
        FROM lineitem GROUP BY 1, 2),
      mu AS (
        SELECT g, sum(xu) AS sxu, count(*) AS n_days
        FROM daily GROUP BY 1),
      p AS (
        SELECT daily.g, day, n_days,
               sum(xu * n_days - sxu) OVER (
                 PARTITION BY daily.g ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM daily JOIN mu ON mu.g = daily.g),
      sline AS (
        SELECT g, day, n_days,
               CAST(p - least(CAST(0 AS BIGINT), min(p) OVER (
                 PARTITION BY g ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 AS BIGINT) AS su_pos,
               CAST(greatest(CAST(0 AS BIGINT), max(p) OVER (
                 PARTITION BY g ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - p
                 AS BIGINT) AS su_neg
        FROM p)
      SELECT g, day,
             CAST(su_pos AS DOUBLE) / (CAST(n_days AS DOUBLE) * 1e6)
               AS s_pos,
             CAST(su_neg AS DOUBLE) / (CAST(n_days AS DOUBLE) * 1e6)
               AS s_neg,
             CAST(CASE WHEN su_pos > 50000000000 * n_days
                    OR su_neg > 50000000000 * n_days
               THEN 1 ELSE 0 END AS BIGINT) AS alarm
      FROM sline ORDER BY g, day""")
  )

  /** M17 capability: Theil–Sen robust trend slope per flag — the median of
    * all pairwise slopes of the MONTHLY mean price series (Sen 1968), the
    * outlier-immune alternative to the M2 OLS trend. Pair enumeration is
    * calendar-bounded (|months|² per group, SF-independent — the
    * q_m15_kendall argument); slopes divide identical doubles by exact
    * integer month gaps; the median is an EXACT order statistic under the
    * (slope, m1, m2) total order (lower-median + upper-median average for
    * even counts — one addition and one halving of identical doubles) →
    * bit-exact, no rounding.
    */
  val m17TheilSen = QueryDef(
    "q_m17_theilsen",
    (s, dir) => {
      val m = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("g"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast("long").as("mi"))
        .agg(avgE(col("l_extendedprice")).as("y"))
      val a = m.select(col("g"), col("mi").as("m1"), col("y").as("y1"))
      val b = m.select(col("g").as("g2"), col("mi").as("m2"),
        col("y").as("y2"))
      val pairs = a.join(b, col("g") === col("g2") && col("m1") < col("m2"))
        .select(col("g"), col("m1"), col("m2"),
          ((col("y2") - col("y1")) /
            (col("m2") - col("m1")).cast("double")).as("slope"))
      val w = Window.partitionBy("g").orderBy("slope", "m1", "m2")
      val ranked = pairs.withColumn("rn", row_number().over(w))
      val cnt = pairs.groupBy("g").agg(count(lit(1)).as("np"))
      ranked.join(broadcast(cnt), "g")
        .where(col("rn") === expr("(np + 1) div 2") ||
          col("rn") === expr("np div 2 + 1"))
        .groupBy("g", "np")
        .agg(((min(col("slope")) + max(col("slope"))) / 2.0)
          .as("theil_sen_slope"))
        .select(col("g"), col("np").as("n_pairs"),
          col("theil_sen_slope"))
        .orderBy("g")
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag AS g,
               CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
                 AS mi,
               ${sqlAvgE("l_extendedprice")} AS y
        FROM lineitem GROUP BY 1, 2),
      pairs AS (
        SELECT a.g, a.mi AS m1, b.mi AS m2,
               (b.y - a.y) / CAST(b.mi - a.mi AS DOUBLE) AS slope
        FROM m a JOIN m b ON a.g = b.g AND a.mi < b.mi),
      ranked AS (
        SELECT g, slope,
               row_number() OVER (PARTITION BY g
                 ORDER BY slope, m1, m2) AS rn,
               count(*) OVER (PARTITION BY g) AS np
        FROM pairs)
      SELECT g, CAST(max(np) AS BIGINT) AS n_pairs,
             (min(slope) + max(slope)) / 2.0 AS theil_sen_slope
      FROM ranked
      WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
      GROUP BY g ORDER BY g""")
  )

  /** M18 capability: closed-form 2×2 PCA of (quantity, price) per flag —
    * eigendecomposition of the sample covariance via the trace/determinant
    * quadratic (λ = (tr ± √(tr²−4·det))/2), the dimensionality-reduction
    * fit that needs NO iteration: one exact-decimal moment pass (the
    * M1/M5/M10 shape), then a per-group scalar solve. The eigenvector
    * composes from sqrt only (exactly rounded per IEEE-754, unlike
    * transcendentals) over identical doubles; explained-variance ratio is
    * λ₁/tr → everything lands r6/r2 with huge margin.
    */
  val m18Pca = QueryDef(
    "q_m18_pca",
    (s, dir) => {
      def s386(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,6)")).cast("double")
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      val g = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("g"))
        .agg(count(lit(1)).as("n"),
          s386(x).as("sx"), s386(y).as("sy"),
          s386(x * x).as("sxx"), s386(y * y).as("syy"),
          s386(x * y).as("sxy"))
      val n = col("n").cast("double")
      val cxx = (col("sxx") - col("sx") * col("sx") / n) / (n - 1.0)
      val cyy = (col("syy") - col("sy") * col("sy") / n) / (n - 1.0)
      val cxy = (col("sxy") - col("sx") * col("sy") / n) / (n - 1.0)
      val tr = cxx + cyy
      val disc = sqrt(tr * tr - lit(4.0) * (cxx * cyy - cxy * cxy))
      val l1 = (tr + disc) / 2.0
      val l2 = (tr - disc) / 2.0
      val vnorm = sqrt(cxy * cxy + (l1 - cxx) * (l1 - cxx))
      g.select(col("g"), col("n"),
        r2(l1).as("lambda1"), r2(l2).as("lambda2"),
        r6(l1 / tr).as("explained_ratio"),
        r6(cxy / vnorm).as("pc1_x"),
        r6((l1 - cxx) / vnorm).as("pc1_y"))
        .orderBy("g")
    },
    Some {
      val pre = """
      WITH m AS (
        SELECT l_returnflag AS g, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS sy,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6)))
                 AS DOUBLE) AS sxx,
               CAST(sum(CAST(l_extendedprice * l_extendedprice
                 AS DECIMAL(38,6))) AS DOUBLE) AS syy,
               CAST(sum(CAST(l_quantity * l_extendedprice
                 AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY 1),
      c AS (
        SELECT g, n,
               (sxx - sx * sx / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) AS cxx,
               (syy - sy * sy / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) AS cyy,
               (sxy - sx * sy / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) AS cxy
        FROM m),
      ev AS (
        SELECT g, n, cxx, cyy, cxy, cxx + cyy AS tr,
               sqrt((cxx + cyy) * (cxx + cyy)
                 - 4.0 * (cxx * cyy - cxy * cxy)) AS disc
        FROM c),
      l AS (
        SELECT g, n, cxx, cxy, tr,
               (tr + disc) / 2.0 AS l1, (tr - disc) / 2.0 AS l2
        FROM ev)"""
      s"""$pre
      SELECT g, n,
             ${sqlR2("l1")} AS lambda1, ${sqlR2("l2")} AS lambda2,
             ${sqlR6("l1 / tr")} AS explained_ratio,
             ${sqlR6("cxy / sqrt(cxy * cxy + (l1 - cxx) * (l1 - cxx))")}
               AS pc1_x,
             ${sqlR6("(l1 - cxx) / sqrt(cxy * cxy + (l1 - cxx) * (l1 - cxx))")}
               AS pc1_y
      FROM l ORDER BY g"""
    }
  )

  // q_m19_bootstrap constants, shared verbatim by both engines.
  private val BootB = 32 // replicas
  // Poisson(1) CDF thresholds F(0)..F(5); weights cap at 6 (P ≈ 1e-4)
  private val BootCdf: Seq[Double] = {
    val e1 = math.exp(-1.0)
    Seq.iterate((e1, e1, 1.0, 0), 6) { case (cdf, _, fact, k) =>
      val f2 = fact * (k + 1)
      (cdf + e1 / f2, e1 / f2, f2, k + 1)
    }.map(_._1)
  }
  private val GoldenInv = 0.6180339887498949

  /** M19 capability: Poisson bootstrap confidence interval for the mean
    * price per returnflag — the error bar a pipeline attaches to any
    * aggregate without a resampling pass. Classic multinomial bootstrap
    * needs B full resamples; the Poisson approximation (Chamandy et al.,
    * "Estimating uncertainty for massive data streams", Google TR 2012;
    * also the `bag of little bootstraps` lineage) draws each row's
    * replica weight w ~ Poisson(1) INDEPENDENTLY, so all B replicas
    * compute in ONE scan: explode ×B, weight by inverse-CDF lookup,
    * aggregate (g, b) — map-side combinable, no state beyond B·|groups|
    * partial sums. At 100 TB that is the only bootstrap that runs at all.
    *
    * Determinism/portability: replica randomness is content-addressed —
    * one md5 uniform per ROW (the q_t_wsample mechanism), fanned to B
    * streams by a Weyl lattice u_b = frac(u·(2b+1)·φ⁻¹) (golden-ratio
    * multiples; IEEE ×/−/floor on identical operands — identical in both
    * engines). Not independent RNG across replicas — documented tradeoff
    * for engine-portable replay; a production run would swap in
    * counter-mode xxhash64 per (row, b) once cross-engine replay is not
    * needed. Weights come from comparing u_b against fixed Poisson-CDF
    * double literals (sqlD); replica sums are exact decimal; the CI
    * bounds are ORDER STATISTICS of the 32 replica means (selection of
    * identical doubles, rank 2 and 31 ≈ the 5%/95% band) — bit-exact,
    * r6 guard only.
    */
  val m19Bootstrap = QueryDef(
    "q_m19_bootstrap",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        col("l_extendedprice").as("x"),
        graft.text.TextAnalysis.contentUniform(
          concat_ws("#", col("l_orderkey"), col("l_linenumber"))).as("u"))
      val rep = li.select(col("g"), col("x"), col("u"),
          explode(sequence(lit(0), lit(BootB - 1))).as("b"))
        .withColumn("p",
          (col("b").cast("double") * 2.0 + 1.0) * GoldenInv)
        .withColumn("ub", col("u") * col("p") - floor(col("u") * col("p")))
        .withColumn("w", BootCdf.zipWithIndex
          .foldRight(lit(6): org.apache.spark.sql.Column) {
          case ((t, k), rest) => when(col("ub") < t, k).otherwise(rest)
        })
      val means = rep.groupBy("g", "b")
        .agg(sum((col("w") * col("x")).cast("decimal(38,6)")).as("swx"),
          sum(col("w")).as("sw"))
        .select(col("g"), col("b"),
          (decD(col("swx")) / col("sw").cast("double")).as("m"))
      val rn = row_number().over(
        Window.partitionBy("g").orderBy(col("m"), col("b")))
      val ci = means.withColumn("rn", rn)
        .groupBy("g")
        .agg(count(lit(1)).as("n_replicas"),
          max(when(col("rn") === 2, col("m"))).as("lo"),
          max(when(col("rn") === BootB - 1, col("m"))).as("hi"))
      val full = li.groupBy("g")
        .agg(count(lit(1)).as("n_rows"), avgE(col("x")).as("pm"))
      full.join(ci, "g")
        .select(col("g").as("l_returnflag"), col("n_rows"),
          col("n_replicas"), r6(col("pm")).as("point_mean"),
          r6(col("lo")).as("ci_lo"), r6(col("hi")).as("ci_hi"))
        .orderBy("l_returnflag")
    },
    Some {
      val w = BootCdf.zipWithIndex
        .map { case (t, k) => s"WHEN ub < ${sqlD(t)} THEN $k" }
        .mkString("CASE ", " ", " ELSE 6 END")
      s"""
      WITH li AS (
        SELECT l_returnflag AS g, l_extendedprice AS x,
               (CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '#'
                  || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
                + 1.0) / 1152921504606846976.0 AS u
        FROM lineitem),
      rep AS (
        SELECT g, x, u, unnest(range($BootB)) AS b
        FROM li),
      wt AS (
        SELECT g, x, b,
               u * ((CAST(b AS DOUBLE) * 2.0 + 1.0) * ${sqlD(GoldenInv)})
                 - floor(u * ((CAST(b AS DOUBLE) * 2.0 + 1.0)
                              * ${sqlD(GoldenInv)})) AS ub
        FROM rep),
      ww AS (SELECT g, x, b, $w AS w FROM wt),
      means AS (
        SELECT g, b,
               ${sqlDecD("sum(CAST((w * x) AS DECIMAL(38,6)))")}
                 / CAST(sum(w) AS DOUBLE) AS m
        FROM ww GROUP BY 1, 2),
      ranked AS (
        SELECT g, m, row_number() OVER (PARTITION BY g ORDER BY m, b)
          AS rn
        FROM means),
      ci AS (
        SELECT g, count(*) AS n_replicas,
               max(CASE WHEN rn = 2 THEN m END) AS lo,
               max(CASE WHEN rn = ${BootB - 1} THEN m END) AS hi
        FROM ranked GROUP BY 1),
      f AS (
        SELECT g, count(*) AS n_rows, ${sqlAvgE("x")} AS pm
        FROM li GROUP BY 1)
      SELECT f.g AS l_returnflag, f.n_rows, ci.n_replicas,
             ${sqlR6("f.pm")} AS point_mean, ${sqlR6("ci.lo")} AS ci_lo,
             ${sqlR6("ci.hi")} AS ci_hi
      FROM f JOIN ci ON ci.g = f.g
      ORDER BY l_returnflag"""
    }
  )

  /** M20 capability: Jarque–Bera normality test per returnflag — the
    * scipy.stats.jarque_bera omnibus test, JB = n/6·(S² + E²/4) over the
    * q_a24 EXACT integer power sums (cents ints, Σv..Σv⁴ as wide-decimal
    * exact sums — one partial-aggregatable scan, the moments-sketch
    * shape). S and E compose in fixed-operand-order doubles from the
    * identical moment values; the χ²₂ 95% rejection compare runs on
    * magnitudes far from the critical point → exact in both engines.
    */
  val m20JarqueBera = QueryDef(
    "q_m20_jarque_bera",
    (s, dir) => {
      val src = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("v"))
      val v1 = col("v").cast("decimal(19,0)")
      val agg = src.groupBy("g").agg(
        count(lit(1)).as("n"),
        sum(v1).cast("double").as("s1"),
        sum(v1 * v1).cast("double").as("s2"),
        sum((v1 * v1).cast("decimal(28,0)") * col("v").cast("decimal(9,0)"))
          .cast("double").as("s3"),
        sum((v1 * v1).cast("decimal(19,0)") * (v1 * v1)
          .cast("decimal(18,0)")).cast("double").as("s4"))
      val nd = col("n").cast("double")
      val m = col("s1") / nd
      val m2 = col("s2") / nd - m * m
      val m3 = col("s3") / nd - lit(3.0) * m * (col("s2") / nd) +
        lit(2.0) * m * m * m
      val m4 = col("s4") / nd - lit(4.0) * m * (col("s3") / nd) +
        lit(6.0) * m * m * (col("s2") / nd) - lit(3.0) * m * m * m * m
      val skw = m3 / sqrt(m2 * m2 * m2)
      val e = m4 / (m2 * m2) - lit(3.0)
      val jb = nd / lit(6.0) * (skw * skw + e * e / lit(4.0))
      agg.select(col("g"), col("n"), r2(jb).as("jb_stat"),
          when(jb > 5.991464547107979, 0L).otherwise(1L).as("is_normal"))
        .orderBy("g")
    },
    Some {
      def d(e: String) = s"($e / CAST(n AS DOUBLE))"
      val m = d("s1")
      val m2 = s"(${d("s2")} - $m * $m)"
      val m3 = s"(${d("s3")} - 3.0 * $m * ${d("s2")} + 2.0 * $m * $m * $m)"
      val m4 = s"(${d("s4")} - 4.0 * $m * ${d("s3")} + 6.0 * $m * $m " +
        s"* ${d("s2")} - 3.0 * $m * $m * $m * $m)"
      val skw = s"($m3 / sqrt($m2 * $m2 * $m2))"
      val e = s"($m4 / ($m2 * $m2) - 3.0)"
      val jb = s"(CAST(n AS DOUBLE) / 6.0 * ($skw * $skw + $e * $e / 4.0))"
      s"""
      WITH src AS (
        SELECT l_returnflag AS g,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        FROM lineitem),
      a AS (
        SELECT g, count(*) AS n,
               CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) AS s1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) AS s2,
               CAST(sum(CAST(v AS HUGEINT) * v * v) AS DOUBLE) AS s3,
               CAST(sum(CAST(v AS HUGEINT) * v * v * v) AS DOUBLE) AS s4
        FROM src GROUP BY 1)
      SELECT g, n, ${sqlR2(jb)} AS jb_stat,
             CAST(CASE WHEN $jb > 5.991464547107979e0 THEN 0 ELSE 1 END
               AS BIGINT) AS is_normal
      FROM a ORDER BY g"""
    }
  )

  // q_m21_assoc minimum pair support (absolute count — integer-portable)
  private val AssocMinCount = 3

  /** M21 capability: association-rule mining (Agrawal–Srikant market
    * basket shape) over parts co-purchased in the same order — support,
    * confidence, and lift for every qualifying part pair. The pair
    * enumeration is a basket-bounded self-join (≤ C(7,2) pairs per
    * order, the lineitem basket cap — never a cross join); counts are
    * exact integers; support/confidence/lift are exact-rational
    * divisions of identical operands → r6. Min-support is an INTEGER
    * count threshold (portable), applied pre-aggregation-output to keep
    * the rule table bounded.
    */
  val m21Assoc = QueryDef(
    "q_m21_assoc",
    (s, dir) => {
      val items = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val nOrders = items.select("o").distinct()
        .agg(count(lit(1)).as("n_orders"))
      val ic = items.groupBy("p").agg(count(lit(1)).as("cp"))
      val pairs = items.as("a")
        .join(items.as("b"), col("a.o") === col("b.o") &&
          col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("c"))
        .where(col("c") >= AssocMinCount)
      val scored = pairs
        .join(ic.select(col("p").as("pa"), col("cp").as("ca")), "pa")
        .join(ic.select(col("p").as("pb"), col("cp").as("cb")), "pb")
        .crossJoin(broadcast(nOrders))
      scored.select(col("pa"), col("pb"), col("c").as("n_both"),
          r6(col("c").cast("double") / col("n_orders").cast("double"))
            .as("support"),
          r6(col("c").cast("double") / col("ca").cast("double"))
            .as("confidence"),
          r6(col("c").cast("double") * col("n_orders").cast("double")
            / (col("ca").cast("double") * col("cb").cast("double")))
            .as("lift"))
        .orderBy(col("n_both").desc, col("pa"), col("pb"))
        .limit(25)
    },
    Some(s"""
      WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
      ic AS (SELECT p, count(*) AS cp FROM items GROUP BY 1),
      pairs AS (
        SELECT a.p AS pa, b.p AS pb, count(*) AS c
        FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
        HAVING count(*) >= $AssocMinCount)
      SELECT pa, pb, CAST(c AS BIGINT) AS n_both,
             ${sqlR6("CAST(c AS DOUBLE) / CAST(n_orders AS DOUBLE)")}
               AS support,
             ${sqlR6("CAST(c AS DOUBLE) / CAST(ca.cp AS DOUBLE)")}
               AS confidence,
             ${sqlR6("""CAST(c AS DOUBLE) * CAST(n_orders AS DOUBLE)
               / (CAST(ca.cp AS DOUBLE) * CAST(cb.cp AS DOUBLE))""")}
               AS lift
      FROM pairs
      JOIN ic ca ON ca.p = pairs.pa
      JOIN ic cb ON cb.p = pairs.pb
      CROSS JOIN n
      ORDER BY n_both DESC, pa, pb LIMIT 25""")
  )

  // q_m22_adamic wedge cap: hubs beyond this degree are skipped — their
  // 1/ln(deg) weight is negligible and their C(deg,2) wedge fanout is the
  // entire cost (the standard AA truncation)
  private val AaMaxDeg = 64

  /** M22 capability: Adamic–Adar link prediction over the co-purchase
    * bipartite graph — for SUPPLIER pairs sharing customers, the classic
    * score Σ_w 1/ln(deg(w)) over common neighbors (Adamic & Adar 2003),
    * the baseline every graph-ML recommender benchmarks against. Wedges
    * route through the LOW-degree side (customers hold a handful of
    * bulk suppliers each; suppliers serve thousands of customers — the
    * supplier-side wedge fanout is C(deg,2) per hub and explodes), with
    * a degree cap as the hub backstop: beyond it the 1/ln(deg) weight is
    * negligible and the fanout is the entire cost (standard AA
    * truncation). Determinism at scale: each wedge term is QUANTIZED to
    * an integer (floor(1e6/ln(deg)+0.5) — identical IEEE per term), so
    * the per-pair sum is exact integer arithmetic — order-independent
    * under any partitioning, unlike a raw double sum.
    */
  val m22Adamic = QueryDef(
    "q_m22_adamic",
    (s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_quantity") >= 31)
      val o = t(s, dir, "orders")
      val e0 = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct()
      val deg = e0.groupBy("cust").agg(count(lit(1)).as("d"))
        .where(col("d") >= 2 && col("d") <= AaMaxDeg)
        .withColumn("w6",
          floor(lit(1e6) / log(col("d").cast("double")) + lit(0.5))
            .cast("long"))
      val ew = e0.join(deg, "cust")
      ew.as("a")
        .join(ew.as("b"), col("a.cust") === col("b.cust") &&
          col("a.supp") < col("b.supp"))
        .groupBy(col("a.supp").as("sa"), col("b.supp").as("sb"))
        .agg(count(lit(1)).as("n_common"), sum(col("a.w6")).as("s6"))
        .select(col("sa"), col("sb"), col("n_common"),
          (col("s6").cast("double") / 1e6).as("aa_score"))
        .orderBy(col("s6").desc, col("sa"), col("sb"))
        .limit(25)
    },
    Some(s"""
      WITH e0 AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 31),
      deg AS (
        SELECT cust, count(*) AS d,
               CAST(floor(1e6 / ln(CAST(count(*) AS DOUBLE)) + 0.5)
                 AS BIGINT) AS w6
        FROM e0 GROUP BY 1
        HAVING count(*) >= 2 AND count(*) <= $AaMaxDeg),
      ew AS (SELECT e0.cust, e0.supp, deg.w6
             FROM e0 JOIN deg ON deg.cust = e0.cust),
      p AS (
        SELECT a.supp AS sa, b.supp AS sb,
               CAST(count(*) AS BIGINT) AS n_common,
               CAST(sum(a.w6) AS BIGINT) AS s6
        FROM ew a JOIN ew b ON a.cust = b.cust AND a.supp < b.supp
        GROUP BY 1, 2)
      SELECT sa, sb, n_common, CAST(s6 AS DOUBLE) / 1e6 AS aa_score
      FROM p ORDER BY s6 DESC, sa, sb LIMIT 25""")
  )

  /** M23 capability: weighted isotonic regression (monotone-nondecreasing
    * fit of daily mean price over one calendar year, per flag) via the
    * minimax characterization fit[i] = max_{j≤i} min_{k≥i} wavg(y[j..k])
    * — the closed form PAV converges to (Barlow et al. 1972), chosen over
    * the sequential pool-adjacent-violators loop because it is pure
    * joins/windows: O(n²) pairs where n is CALENDAR-BOUNDED (≤366 days ×
    * |flags|, ~200k pairs regardless of SF), so the only full-data pass
    * is the daily aggregation. Exactness: daily sums/counts are exact
    * decimals, every range average is ONE double division of exact
    * operands, and min/max are order-independent — bit-exact with no
    * rounding. Isotonic calibration is the standard monotone-score
    * calibrator in ranking/classification pipelines.
    */
  val m23Isotonic = QueryDef(
    "q_m23_isotonic",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg(sum(col("l_extendedprice").cast("decimal(28,6)")).as("sm"),
          count(lit(1)).as("c"))
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val pfx = daily
        .withColumn("rn", row_number().over(byDay))
        .withColumn("cs", sum("sm").over(byDay))
        .withColumn("cc", sum("c").over(byDay))
      val j = pfx.select(col("l_returnflag").as("f"), col("rn").as("j"),
        (col("cs") - col("sm")).as("cs_jm1"),
        (col("cc") - col("c")).as("cc_jm1"))
      val k = pfx.select(col("l_returnflag").as("f"), col("rn").as("k"),
        col("cs").as("cs_k"), col("cc").as("cc_k"))
      val pairs = j.join(k, Seq("f")).where(col("k") >= col("j"))
        .select(col("f"), col("j"), col("k"),
          (decD(col("cs_k") - col("cs_jm1")) /
            (col("cc_k") - col("cc_jm1")).cast("double")).as("wavg"))
      val sfx = Window.partitionBy("f", "j").orderBy("k")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val fit = pairs
        .withColumn("m", min(col("wavg")).over(sfx))
        .groupBy(col("f"), col("k"))
        .agg(max(col("m")).as("iso_fit"))
      pfx.join(fit,
          pfx("l_returnflag") === fit("f") && pfx("rn") === fit("k"))
        .select(col("l_returnflag"), col("day"),
          (decD(col("sm")) / col("c").cast("double")).as("y"),
          col("iso_fit"))
        .orderBy("l_returnflag", "day")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS sm,
               count(*) AS c
        FROM lineitem
        WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
        GROUP BY 1, 2),
      pfx AS (
        SELECT l_returnflag, day, sm, c,
               row_number() OVER w AS rn,
               sum(sm) OVER w AS cs,
               sum(c) OVER w AS cc
        FROM daily
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)),
      pairs AS (
        SELECT a.l_returnflag AS f, a.rn AS j, b.rn AS k,
               ${sqlDecD("b.cs - (a.cs - a.sm)")}
                 / CAST(b.cc - (a.cc - a.c) AS DOUBLE) AS wavg
        FROM pfx a JOIN pfx b
          ON a.l_returnflag = b.l_returnflag AND b.rn >= a.rn),
      sfx AS (
        SELECT f, j, k,
               min(wavg) OVER (PARTITION BY f, j ORDER BY k
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS m
        FROM pairs),
      fit AS (SELECT f, k, max(m) AS iso_fit FROM sfx GROUP BY 1, 2)
      SELECT p.l_returnflag, p.day,
             ${sqlDecD("p.sm")} / CAST(p.c AS DOUBLE) AS y,
             fit.iso_fit
      FROM pfx p JOIN fit ON fit.f = p.l_returnflag AND fit.k = p.rn
      ORDER BY p.l_returnflag, p.day""")
  )

  /** M24 capability: Mahalanobis-distance multivariate anomaly detection
    * on (price, quantity) per flag — the covariance-aware generalization
    * of M4's per-column z-scores (catches points that are unremarkable
    * marginally but break the joint correlation structure). The 2×2
    * covariance is inverted in closed form inside the expression:
    * d² = [dx²·v22 − 2·dx·dy·v12 + dy²·v11] / (v11·v22 − v12²). All five
    * moments are exact decimal sums pivoted to one broadcast row per
    * flag; μ/var/cov/d² are fixed float trees of those exact inputs, so
    * every d² is bit-identical across engines; ranking quantizes d² to
    * integer micro-units with a full-key tie-break. One moments pass +
    * one scoring scan, no shuffle beyond the |flags|-row aggregate.
    */
  val m24Mahalanobis = QueryDef(
    "q_m24_mahalanobis",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val mom = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        decD(sum(col("l_extendedprice").cast("decimal(28,6)"))).as("s1"),
        decD(sum(col("l_quantity").cast("decimal(28,6)"))).as("s2"),
        decD(sum((col("l_extendedprice") * col("l_extendedprice"))
          .cast("decimal(38,4)"))).as("s11"),
        decD(sum((col("l_quantity") * col("l_quantity"))
          .cast("decimal(38,4)"))).as("s22"),
        decD(sum((col("l_extendedprice") * col("l_quantity"))
          .cast("decimal(38,4)"))).as("s12"))
        .select(col("l_returnflag"),
          (col("s1") / col("n")).as("mu1"),
          (col("s2") / col("n")).as("mu2"),
          (col("s11") / col("n") - (col("s1") / col("n")) *
            (col("s1") / col("n"))).as("v11"),
          (col("s22") / col("n") - (col("s2") / col("n")) *
            (col("s2") / col("n"))).as("v22"),
          (col("s12") / col("n") - (col("s1") / col("n")) *
            (col("s2") / col("n"))).as("v12"))
      val dx = col("l_extendedprice") - col("mu1")
      val dy = col("l_quantity") - col("mu2")
      val det = col("v11") * col("v22") - col("v12") * col("v12")
      val d2 = (dx * dx * col("v22") - lit(2.0) * dx * dy * col("v12") +
        dy * dy * col("v11")) / det
      li.join(broadcast(mom), "l_returnflag")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_quantity"),
          // degenerate-covariance guard: det ≤ 0 (collinear columns) makes
          // d² undefined — NULL in both engines instead of NaN/Inf, which
          // Spark would NULL on cast but DuckDB would error on
          when(det > 0, floor(d2 * 1e6 + lit(0.5)).cast("long"))
            .otherwise(lit(null).cast("long")).as("d2_u6"))
        // NULLS LAST pinned explicitly: DuckDB's default_null_order is
        // config/version-dependent, so the cross-engine order must not
        // rely on either engine's default
        .orderBy(col("d2_u6").desc_nulls_last, col("l_returnflag"),
          col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    },
    Some(s"""
      WITH mom AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               ${sqlDecD("sum(CAST(l_extendedprice AS DECIMAL(28,6)))")} AS s1,
               ${sqlDecD("sum(CAST(l_quantity AS DECIMAL(28,6)))")} AS s2,
               ${sqlDecD("sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4)))")} AS s11,
               ${sqlDecD("sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4)))")} AS s22,
               ${sqlDecD("sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4)))")} AS s12
        FROM lineitem GROUP BY 1),
      st AS (
        SELECT l_returnflag,
               s1 / n AS mu1, s2 / n AS mu2,
               s11 / n - (s1 / n) * (s1 / n) AS v11,
               s22 / n - (s2 / n) * (s2 / n) AS v22,
               s12 / n - (s1 / n) * (s2 / n) AS v12
        FROM mom)
      SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber,
             l.l_extendedprice, l.l_quantity,
             CASE WHEN v11 * v22 - v12 * v12 > 0 THEN
               CAST(floor((((l.l_extendedprice - mu1) * (l.l_extendedprice - mu1) * v22
                  - 2e0 * (l.l_extendedprice - mu1) * (l.l_quantity - mu2) * v12
                  + (l.l_quantity - mu2) * (l.l_quantity - mu2) * v11)
                 / (v11 * v22 - v12 * v12)) * 1e6 + 0.5) AS BIGINT)
             ELSE NULL END AS d2_u6
      FROM lineitem l JOIN st ON st.l_returnflag = l.l_returnflag
      ORDER BY d2_u6 DESC NULLS LAST, l.l_returnflag, l.l_orderkey,
        l.l_linenumber
      LIMIT 20""")
  )

  // q_m25_em_step fixed initialization (shared verbatim via sqlD)
  private val EmMu1 = 20000.0
  private val EmMu2 = 80000.0
  private val EmSig2 = 1.0e8

  /** M25 capability: one EM iteration of a 1-D two-component
    * equal-variance Gaussian mixture on price, per flag, from a fixed
    * initialization — the "one-step" estimator shape of M10's IRLS and
    * M3's Lloyd step (E-step responsibilities + M-step reweighted means
    * in a single aggregation pass; no iteration, no driver loop). With
    * equal priors and equal σ², the responsibility collapses to a
    * logistic: γ(x) = 1/(1+exp(((x−μ₂)²−(x−μ₁)²)/(2σ²))). Determinism at
    * scale: γ is QUANTIZED to micro-units (floor(γ·10⁶+0.5), identical
    * IEEE per row — the coarse scale shrinks the already-tiny chance
    * that a 1-ulp libm exp() divergence straddles a floor boundary), so
    * Σγ is exact integer and the Σγ·x products are exact decimal sums —
    * order-independent under any partitioning; the M-step means/weights
    * are then single divisions of exact operands.
    */
  val m25EmStep = {
    QueryDef(
      "q_m25_em_step",
      (s, dir) => {
        val x = col("l_extendedprice")
        val dterm = ((x - lit(EmMu2)) * (x - lit(EmMu2)) -
          (x - lit(EmMu1)) * (x - lit(EmMu1))) / (lit(2.0) * lit(EmSig2))
        val g6 = floor(lit(1e6) / (lit(1.0) + exp(dterm)) + lit(0.5))
          .cast("long")
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), x.as("x"), g6.as("g6"))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("g6")).as("sg"),
            decD(sum((col("g6").cast("double") * col("x"))
              .cast("decimal(38,6)"))).as("sgx"),
            decD(sum(((lit(1000000L) - col("g6")).cast("double") *
              col("x")).cast("decimal(38,6)"))).as("shx"))
          .select(col("l_returnflag"), col("n"),
            r6(col("sg").cast("double") /
              (col("n").cast("double") * lit(1e6))).as("pi2"),
            r2(col("shx") / (col("n") * lit(1000000L) - col("sg"))
              .cast("double")).as("mu1"),
            r2(col("sgx") / col("sg").cast("double")).as("mu2"))
          .orderBy("l_returnflag")
      },
      Some {
        val dterm = s"((l_extendedprice - ${sqlD(EmMu2)}) * (l_extendedprice - ${sqlD(EmMu2)})" +
          s" - (l_extendedprice - ${sqlD(EmMu1)}) * (l_extendedprice - ${sqlD(EmMu1)}))" +
          s" / (2.0e0 * ${sqlD(EmSig2)})"
        s"""
      WITH r AS (
        SELECT l_returnflag, l_extendedprice AS x,
               CAST(floor(1e6 / (1.0e0 + exp($dterm)) + 0.5) AS BIGINT)
                 AS g6
        FROM lineitem),
      m AS (
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(g6) AS BIGINT) AS sg,
               ${sqlDecD("sum(CAST(CAST(g6 AS DOUBLE) * x AS DECIMAL(38,6)))")} AS sgx,
               ${sqlDecD("sum(CAST(CAST(1000000 - g6 AS DOUBLE) * x AS DECIMAL(38,6)))")} AS shx
        FROM r GROUP BY 1)
      SELECT l_returnflag, n,
             ${sqlR6("CAST(sg AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)")} AS pi2,
             ${sqlR2("shx / CAST(n * 1000000 - sg AS DOUBLE)")} AS mu1,
             ${sqlR2("sgx / CAST(sg AS DOUBLE)")} AS mu2
      FROM m ORDER BY l_returnflag"""
      }
    )
  }

  /** M26 capability: Pettitt changepoint test (Pettitt 1979) on the
    * daily mean-price series per flag — the rank-based (nonparametric)
    * complement of M16's CUSUM: U_t = Σ_{i≤t}Σ_{j>t} sgn(y_i−y_j), with
    * the changepoint at argmax|U_t|. Computed via the exact rank
    * identity U_t = 2·Σ_{i≤t}r_i − t·(n+1) (no O(n²) pair join): one
    * rank window + one cumulative sum, ENTIRELY in integers — no
    * floating point anywhere, bit-exact under any partitioning. Ranks
    * tie-break on day (the series has no exact ties: daily means are
    * continuous), identical total order in both engines. Runs on the
    * calendar-bounded daily series.
    */
  val m26Pettitt = QueryDef(
    "q_m26_pettitt",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
      val byVal = Window.partitionBy("l_returnflag")
        .orderBy(col("y"), col("day"))
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val u = daily
        .withColumn("r", row_number().over(byVal))
        .withColumn("t", row_number().over(byDay))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("l_returnflag")))
        .withColumn("sr", sum(col("r").cast("long")).over(byDay))
        .where(col("t") < col("n"))
        .withColumn("u",
          lit(2L) * col("sr") - col("t").cast("long") * (col("n") + 1L))
        .withColumn("absu", abs(col("u")))
      val best = Window.partitionBy("l_returnflag")
        .orderBy(col("absu").desc, col("day"))
      u.withColumn("rk", row_number().over(best))
        .where(col("rk") === 1)
        .select(col("l_returnflag"), col("day").as("cp_day"),
          col("u").as("u_stat"), col("absu").as("k_stat"),
          col("n").as("n_days"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      rk AS (
        SELECT l_returnflag, day,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY y, day) AS r,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY day) AS t,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM daily),
      u AS (
        SELECT l_returnflag, day, t, n,
               2 * sum(CAST(r AS BIGINT)) OVER (
                 PARTITION BY l_returnflag ORDER BY day)
                 - CAST(t AS BIGINT) * (n + 1) AS u
        FROM rk),
      best AS (
        SELECT l_returnflag, day, u, abs(u) AS absu, n,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY abs(u) DESC, day) AS pick
        FROM u WHERE t < n)
      SELECT l_returnflag, day AS cp_day, CAST(u AS BIGINT) AS u_stat,
             CAST(absu AS BIGINT) AS k_stat, CAST(n AS BIGINT) AS n_days
      FROM best WHERE pick = 1 ORDER BY l_returnflag""")
  )

  /** M27 capability: Wilcoxon signed-rank test on consecutive-day price
    * changes per flag — the PAIRED complement of M7's Mann–Whitney
    * (scipy.stats.wilcoxon): d_t = y_{t+1} − y_t, |d| ranked ascending
    * (day tie-break; the continuous daily means carry no exact ties),
    * W⁺/W⁻ = rank sums by sign — exact integers end-to-end; only the
    * normal-approximation z composes in double (identical operands,
    * division and sqrt both correctly rounded) → r6. One rank window on
    * the calendar-bounded daily series.
    */
  val m27Wilcoxon = QueryDef(
    "q_m27_wilcoxon",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val daily = t(s, dir, "lineitem")
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
      val diffs = daily
        .withColumn("d", col("y") - lag(col("y"), 1).over(byDay))
        .where(col("d").isNotNull && col("d") =!= 0.0)
        .withColumn("ad", abs(col("d")))
      val byAbs = Window.partitionBy("l_returnflag")
        .orderBy(col("ad"), col("day"))
      val ranked = diffs.withColumn("r", row_number().over(byAbs))
      ranked.groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("m"),
          sum(when(col("d") > 0, col("r").cast("long")).otherwise(0L))
            .as("w_plus"),
          sum(when(col("d") < 0, col("r").cast("long")).otherwise(0L))
            .as("w_minus"))
        .select(col("l_returnflag"), col("m"), col("w_plus"),
          col("w_minus"),
          r6((col("w_plus").cast("double") -
            (col("m") * (col("m") + 1L)).cast("double") / lit(4.0)) /
            sqrt((col("m") * (col("m") + 1L) * (lit(2L) * col("m") + 1L))
              .cast("double") / lit(24.0))).as("z"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      diffs AS (
        SELECT l_returnflag, day,
               y - lag(y, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS d
        FROM daily),
      ranked AS (
        SELECT l_returnflag, d,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY abs(d), day) AS r
        FROM diffs WHERE d IS NOT NULL AND d <> 0),
      agg AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS m,
               CAST(sum(CASE WHEN d > 0 THEN r ELSE 0 END) AS BIGINT)
                 AS w_plus,
               CAST(sum(CASE WHEN d < 0 THEN r ELSE 0 END) AS BIGINT)
                 AS w_minus
        FROM ranked GROUP BY 1)
      SELECT l_returnflag, m, w_plus, w_minus,
             ${sqlR6("""(CAST(w_plus AS DOUBLE)
                - CAST(m * (m + 1) AS DOUBLE) / 4.0e0)
               / sqrt(CAST(m * (m + 1) * (2 * m + 1) AS DOUBLE) / 24.0e0)""")}
               AS z
      FROM agg ORDER BY l_returnflag""")
  )

  // q_m28_huber clipping threshold in price units (fixed-scale variant:
  // the MAD-scale pass is M13's job; production one-step robustifiers
  // routinely run with an offline-chosen scale)
  private val HuberC = 20000.0

  /** M28 capability: one-step Huber-weighted least squares of
    * price ~ quantity per flag — OLS fit from exact moments, per-row
    * Huber weights w = min(1, c/|residual|), then ONE weighted refit
    * (the classic one-step M-estimator; Bickel 1975). Determinism at
    * scale: the OLS coefficients are fixed float trees over exact
    * decimal moments, residuals and weights are per-row trees of
    * correctly-rounded ops (division/min — no transcendentals), weights
    * are QUANTIZED to micro-units, and every weighted moment is an exact
    * decimal sum of per-row doubles — order-independent anywhere. Two
    * aggregation passes + a broadcast coefficient row.
    */
  val m28Huber = QueryDef(
    "q_m28_huber",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      def s6(c: org.apache.spark.sql.Column) =
        decD(sum(c.cast("decimal(38,6)")))
      val mom = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        s6(col("l_quantity")).as("sx"),
        s6(col("l_extendedprice")).as("sy"),
        s6(col("l_quantity") * col("l_quantity")).as("sxx"),
        s6(col("l_quantity") * col("l_extendedprice")).as("sxy"))
        .select(col("l_returnflag"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))).as("b"),
          ((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
            col("n")).as("a"))
      val res = col("l_extendedprice") - col("a") -
        col("b") * col("l_quantity")
      val w6 = floor(least(lit(1.0), lit(HuberC) / abs(res)) * 1e6 +
        lit(0.5)).cast("long")
      val weighted = li.join(broadcast(mom), "l_returnflag")
        .select(col("l_returnflag"), col("b").as("b_ols"),
          col("l_quantity").as("x"), col("l_extendedprice").as("y"),
          w6.as("w6"))
      def sw(c: org.apache.spark.sql.Column) =
        decD(sum((col("w6").cast("double") * c).cast("decimal(38,4)")))
      weighted.groupBy("l_returnflag")
        .agg(
          max(col("b_ols")).as("b_raw"),
          sum(col("w6")).as("swl"),
          sw(col("x")).as("swx"),
          sw(col("y")).as("swy"),
          sw(col("x") * col("x")).as("swxx"),
          sw(col("x") * col("y")).as("swxy"),
          sum(when(col("w6") < 1000000L, 1L).otherwise(0L))
            .as("n_downweighted"))
        .select(col("l_returnflag"),
          r6(col("b_raw")).as("slope_ols"),
          r6((col("swl").cast("double") * col("swxy") -
            col("swx") * col("swy")) /
            (col("swl").cast("double") * col("swxx") -
              col("swx") * col("swx"))).as("slope_huber"),
          col("n_downweighted"))
        .orderBy("l_returnflag")
    },
    Some {
      val slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
      s"""
      WITH mom AS (
        SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
               ${sqlDecD("sum(CAST(l_quantity AS DECIMAL(38,6)))")} AS sx,
               ${sqlDecD("sum(CAST(l_extendedprice AS DECIMAL(38,6)))")} AS sy,
               ${sqlDecD("sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6)))")} AS sxx,
               ${sqlDecD("sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6)))")} AS sxy
        FROM lineitem GROUP BY 1),
      cf AS (
        SELECT l_returnflag, $slope AS b,
               (sy - ($slope) * sx) / n AS a
        FROM mom),
      wrows AS (
        SELECT l.l_returnflag, cf.b AS b_ols,
               l.l_quantity AS x, l.l_extendedprice AS y,
               CAST(floor(least(1.0e0, ${sqlD(HuberC)}
                   / abs(l.l_extendedprice - cf.a - cf.b * l.l_quantity))
                 * 1e6 + 0.5) AS BIGINT) AS w6
        FROM lineitem l JOIN cf ON cf.l_returnflag = l.l_returnflag),
      agg AS (
        SELECT l_returnflag, max(b_ols) AS b_raw,
               CAST(sum(w6) AS BIGINT) AS swl,
               ${sqlDecD("sum(CAST(CAST(w6 AS DOUBLE) * x AS DECIMAL(38,4)))")} AS swx,
               ${sqlDecD("sum(CAST(CAST(w6 AS DOUBLE) * y AS DECIMAL(38,4)))")} AS swy,
               ${sqlDecD("sum(CAST(CAST(w6 AS DOUBLE) * (x * x) AS DECIMAL(38,4)))")} AS swxx,
               ${sqlDecD("sum(CAST(CAST(w6 AS DOUBLE) * (x * y) AS DECIMAL(38,4)))")} AS swxy,
               CAST(sum(CASE WHEN w6 < 1000000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_downweighted
        FROM wrows GROUP BY 1)
      SELECT l_returnflag,
             ${sqlR6("b_raw")} AS slope_ols,
             ${sqlR6("""(CAST(swl AS DOUBLE) * swxy - swx * swy)
               / (CAST(swl AS DOUBLE) * swxx - swx * swx)""")} AS slope_huber,
             n_downweighted
      FROM agg ORDER BY l_returnflag"""
    }
  )

  /** M29 capability: pairwise Granger causality (lag-1) between the A-
    * and R-flag daily return series — does yesterday's R return improve
    * the prediction of today's A return beyond A's own lag (and vice
    * versa)? F = (RSS_restricted − RSS_full) / (RSS_full/(n−3)), with
    * both regressions solved in CLOSED FORM from one set of exact
    * decimal moments (restricted: 1-var slope; full: symbolic 2×2
    * normal-equation inverse — the M10/M28 shape, no iteration). Every
    * moment is an exact DECIMAL(38,18) sum of deterministic per-row
    * doubles; RSS and F are fixed float trees → r6. Two rows out
    * (direction column). One aligned-day join + one aggregation pass.
    */
  val m29Granger = QueryDef(
    "q_m29_granger",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val rets = t(s, dir, "lineitem")
        .where(col("l_returnflag").isin("A", "R"))
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
        .withColumn("ret", col("y") / lag(col("y"), 1).over(byDay) - 1)
        .where(col("ret").isNotNull)
      val a = rets.where(col("l_returnflag") === "A")
        .select(col("day"), col("ret").as("ra"))
      val r = rets.where(col("l_returnflag") === "R")
        .select(col("day"), col("ret").as("rr"))
      val joined = a.join(r, "day")
      val byD = Window.orderBy("day")
      val lagged = joined
        .withColumn("la", lag(col("ra"), 1).over(byD))
        .withColumn("lr", lag(col("rr"), 1).over(byD))
        .where(col("la").isNotNull)
      def d18(c: org.apache.spark.sql.Column) =
        decD(sum(c.cast("decimal(38,18)")))
      // moments for BOTH directions in one pass: y∈{ra,rr}, x1=own lag,
      // x2=other lag
      val m = lagged.agg(
        count(lit(1)).cast("double").as("n"),
        d18(col("la")).as("sla"), d18(col("lr")).as("slr"),
        d18(col("ra")).as("sra"), d18(col("rr")).as("srr"),
        d18(col("la") * col("la")).as("slala"),
        d18(col("lr") * col("lr")).as("slrlr"),
        d18(col("la") * col("lr")).as("slalr"),
        d18(col("ra") * col("ra")).as("srara"),
        d18(col("rr") * col("rr")).as("srrrr"),
        d18(col("la") * col("ra")).as("slara"),
        d18(col("lr") * col("ra")).as("slrra"),
        d18(col("la") * col("rr")).as("slarr"),
        d18(col("lr") * col("rr")).as("slrrr"))
      // centered second moments as fixed trees, then closed-form F for
      // direction "other lags → y" with own lag always included
      def granger(dirName: String, sy: String, syy: String,
          sOwn: String, sOwnOwn: String, sOwnY: String,
          sOth: String, sOthOth: String, sOthY: String,
          sOwnOth: String) = {
        val n = col("n")
        val cyy = col(syy) - col(sy) * col(sy) / n
        val c11 = col(sOwnOwn) - col(sOwn) * col(sOwn) / n
        val c22 = col(sOthOth) - col(sOth) * col(sOth) / n
        val c12 = col(sOwnOth) - col(sOwn) * col(sOth) / n
        val c1y = col(sOwnY) - col(sOwn) * col(sy) / n
        val c2y = col(sOthY) - col(sOth) * col(sy) / n
        val rssR = cyy - c1y * c1y / c11
        val det = c11 * c22 - c12 * c12
        val b1 = (c22 * c1y - c12 * c2y) / det
        val b2 = (c11 * c2y - c12 * c1y) / det
        val rssF = cyy - b1 * c1y - b2 * c2y
        m.select(lit(dirName).as("direction"),
          col("n").cast("long").as("n"),
          r6(b2).as("beta_other_lag"),
          r6((rssR - rssF) / (rssF / (n - lit(3.0)))).as("f_stat"))
      }
      granger("R_causes_A", "sra", "srara", "sla", "slala", "slara",
          "slr", "slrlr", "slrra", "slalr")
        .unionByName(
          granger("A_causes_R", "srr", "srrrr", "slr", "slrlr", "slrrr",
            "sla", "slala", "slarr", "slalr"))
        .orderBy("direction")
    },
    Some {
      def grangerSql(dirName: String, sy: String, syy: String,
          sOwn: String, sOwnOwn: String, sOwnY: String,
          sOth: String, sOthOth: String, sOthY: String,
          sOwnOth: String) = {
        val cyy = s"($syy - $sy * $sy / n)"
        val c11 = s"($sOwnOwn - $sOwn * $sOwn / n)"
        val c22 = s"($sOthOth - $sOth * $sOth / n)"
        val c12 = s"($sOwnOth - $sOwn * $sOth / n)"
        val c1y = s"($sOwnY - $sOwn * $sy / n)"
        val c2y = s"($sOthY - $sOth * $sy / n)"
        val rssR = s"($cyy - $c1y * $c1y / $c11)"
        val det = s"($c11 * $c22 - $c12 * $c12)"
        val b1 = s"(($c22 * $c1y - $c12 * $c2y) / $det)"
        val b2 = s"(($c11 * $c2y - $c12 * $c1y) / $det)"
        val rssF = s"($cyy - $b1 * $c1y - $b2 * $c2y)"
        s"""SELECT '$dirName' AS direction, CAST(n AS BIGINT) AS n,
             ${sqlR6(b2)} AS beta_other_lag,
             ${sqlR6(s"($rssR - $rssF) / ($rssF / (n - 3.0e0))")} AS f_stat
           FROM m"""
      }
      s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2),
      rets AS (
        SELECT l_returnflag, day,
               y / lag(y, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 - 1 AS ret
        FROM daily),
      j AS (
        SELECT a.day, a.ret AS ra, r.ret AS rr
        FROM (SELECT day, ret FROM rets WHERE l_returnflag = 'A'
                AND ret IS NOT NULL) a
        JOIN (SELECT day, ret FROM rets WHERE l_returnflag = 'R'
                AND ret IS NOT NULL) r ON r.day = a.day),
      lagged AS (
        SELECT ra, rr,
               lag(ra, 1) OVER (ORDER BY day) AS la,
               lag(rr, 1) OVER (ORDER BY day) AS lr
        FROM j),
      m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               ${sqlDecD("sum(CAST(la AS DECIMAL(38,18)))")} AS sla,
               ${sqlDecD("sum(CAST(lr AS DECIMAL(38,18)))")} AS slr,
               ${sqlDecD("sum(CAST(ra AS DECIMAL(38,18)))")} AS sra,
               ${sqlDecD("sum(CAST(rr AS DECIMAL(38,18)))")} AS srr,
               ${sqlDecD("sum(CAST(la * la AS DECIMAL(38,18)))")} AS slala,
               ${sqlDecD("sum(CAST(lr * lr AS DECIMAL(38,18)))")} AS slrlr,
               ${sqlDecD("sum(CAST(la * lr AS DECIMAL(38,18)))")} AS slalr,
               ${sqlDecD("sum(CAST(ra * ra AS DECIMAL(38,18)))")} AS srara,
               ${sqlDecD("sum(CAST(rr * rr AS DECIMAL(38,18)))")} AS srrrr,
               ${sqlDecD("sum(CAST(la * ra AS DECIMAL(38,18)))")} AS slara,
               ${sqlDecD("sum(CAST(lr * ra AS DECIMAL(38,18)))")} AS slrra,
               ${sqlDecD("sum(CAST(la * rr AS DECIMAL(38,18)))")} AS slarr,
               ${sqlDecD("sum(CAST(lr * rr AS DECIMAL(38,18)))")} AS slrrr
        FROM lagged WHERE la IS NOT NULL)
      SELECT * FROM (
        ${grangerSql("R_causes_A", "sra", "srara", "sla", "slala",
          "slara", "slr", "slrlr", "slrra", "slalr")}
        UNION ALL
        ${grangerSql("A_causes_R", "srr", "srrrr", "slr", "slrlr",
          "slrrr", "sla", "slala", "slarr", "slalr")})
      ORDER BY direction"""
    }
  )

  /** M30 capability: Wald–Wolfowitz runs test on daily return signs per
    * flag — are up/down days independent, or do they streak/alternate
    * beyond chance? R = number of sign runs (a lag comparison + integer
    * sum), μ_R = 2n₊n₋/n + 1, σ²_R = 2n₊n₋(2n₊n₋ − n)/(n²(n−1)); all
    * counts exact integers, z a fixed float tree of them (division and
    * sqrt correctly rounded) → r6. Zero returns are dropped (the
    * standard convention). One lag window on the calendar-bounded daily
    * series — the randomness diagnostic that pairs with q_f_streaks'
    * descriptive run lengths.
    */
  val m30RunsTest = QueryDef(
    "q_m30_runs_test",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val signs = t(s, dir, "lineitem")
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
        .withColumn("ret", col("y") / lag(col("y"), 1).over(byDay) - 1)
        .where(col("ret").isNotNull && col("ret") =!= 0.0)
        .withColumn("sgn", when(col("ret") > 0, 1).otherwise(-1))
      val runs = signs
        .withColumn("prev", lag(col("sgn"), 1).over(byDay))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_up"),
          sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_down"),
          (sum(when(col("prev").isNull ||
            col("prev") =!= col("sgn"), 1L).otherwise(0L))).as("r_runs"))
      val n = col("n").cast("double")
      val p2 = lit(2.0) * col("n_up").cast("double") *
        col("n_down").cast("double")
      val muR = p2 / n + lit(1.0)
      val varR = p2 * (p2 - n) / (n * n * (n - lit(1.0)))
      runs.select(col("l_returnflag"), col("n"), col("n_up"),
          col("n_down"), col("r_runs"),
          r6((col("r_runs").cast("double") - muR) / sqrt(varR)).as("z"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      rets AS (
        SELECT l_returnflag, day,
               y / lag(y, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 - 1 AS ret
        FROM daily),
      sg AS (
        SELECT l_returnflag, day,
               CASE WHEN ret > 0 THEN 1 ELSE -1 END AS sgn
        FROM rets WHERE ret IS NOT NULL AND ret <> 0),
      lagged AS (
        SELECT l_returnflag, sgn,
               lag(sgn, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS prev
        FROM sg),
      agg AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_up,
               CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_down,
               CAST(sum(CASE WHEN prev IS NULL OR prev <> sgn
                 THEN 1 ELSE 0 END) AS BIGINT) AS r_runs
        FROM lagged GROUP BY 1)
      SELECT l_returnflag, n, n_up, n_down, r_runs,
             ${sqlR6("""(CAST(r_runs AS DOUBLE)
                - (2.0e0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                   / CAST(n AS DOUBLE) + 1.0e0))
               / sqrt(2.0e0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                 * (2.0e0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                    - CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0e0)))""")} AS z
      FROM agg ORDER BY l_returnflag""")
  )

  /** M31 — decile lift / gains chart, the standard model-evaluation report
    * (score = o_totalprice DESC as the "model", response = status 'F').
    * Global ranking uses the scale-safe SequenceOps.runningSum
    * range-partitioned prefix scan (the W10/W13 shape — no single-partition
    * window over the data); the cumulative-gain window runs over the 10
    * decile rows only. All rates are exact-integer ratios → one division →
    * r6, so both engines agree bit-for-bit.
    */
  val m31Lift = QueryDef(
    "q_m31_lift",
    (s, dir) => {
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), (-col("o_totalprice")).as("neg"),
          (col("o_orderstatus") === "F").cast("long").as("pos"),
          lit(1L).as("one"))
      val rn = graft.plans.SequenceOps.runningSum(
        src, Seq(), Seq("neg", "o_orderkey"), "one", "rn")
      val tot = broadcast(rn.agg(max(col("rn")).as("n"),
        sum(col("pos")).as("p")))
      rn.crossJoin(tot)
        .withColumn("decile", expr("(rn - 1) * 10 div n") + lit(1L))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_orders"), sum(col("pos")).as("n_pos"),
          max(col("n")).as("nn"), max(col("p")).as("pp"))
        .withColumn("cum_pos", sum(col("n_pos")).over(Window.orderBy("decile")))
        .select(col("decile"), col("n_orders"), col("n_pos"),
          r6(col("n_pos").cast("double") / col("n_orders").cast("double"))
            .as("resp_rate"),
          r6((col("n_pos").cast("double") / col("n_orders").cast("double"))
            / (col("pp").cast("double") / col("nn").cast("double")))
            .as("lift"),
          r6(col("cum_pos").cast("double") / col("pp").cast("double"))
            .as("cum_gain"))
        .orderBy("decile")
    },
    Some(s"""
      WITH r AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
               row_number() OVER (ORDER BY -o_totalprice, o_orderkey) AS rn,
               count(*) OVER () AS n,
               sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                 OVER () AS p
        FROM orders),
      d AS (SELECT pos, (rn - 1) * 10 // n + 1 AS decile, n, p FROM r),
      g AS (
        SELECT decile, count(*) AS n_orders,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(max(n) AS BIGINT) AS nn, CAST(max(p) AS BIGINT) AS pp
        FROM d GROUP BY 1),
      c AS (SELECT *, sum(n_pos) OVER (ORDER BY decile) AS cum_pos FROM g)
      SELECT decile, n_orders, n_pos,
             ${sqlR6("CAST(n_pos AS DOUBLE) / CAST(n_orders AS DOUBLE)")}
               AS resp_rate,
             ${sqlR6("(CAST(n_pos AS DOUBLE) / CAST(n_orders AS DOUBLE))" +
      " / (CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE))")} AS lift,
             ${sqlR6("CAST(cum_pos AS DOUBLE) / CAST(pp AS DOUBLE)")}
               AS cum_gain
      FROM c ORDER BY decile""")
  )

  /** M33 — grid-based DBSCAN (the GriDBSCAN / cell-DBSCAN family):
    * density clustering of the embedding cloud's first two dims without
    * any all-pairs distance work. Points quantize to an eps-grid (ONE
    * groupBy — the only data-scale shuffle; everything after runs on the
    * ≤|grid| bounded cell table), a cell is core when its 3×3
    * neighborhood holds ≥ MinPts points, and clusters are connected
    * components of core cells under 8-adjacency via `Iters` rounds of
    * min-label propagation (chained-CTE oracle, the q_g_labelprop /
    * PageRank idiom; localCheckpoint truncates lineage per round). The
    * `frontier` column counts label-disagreeing adjacencies after the
    * last round — 0 proves convergence inside the gate itself.
    */
  val m33Dbscan = {
    val MinPts = 10L // 3×3-neighborhood density threshold
    val Iters = 16 // ≥ grid diameter for this data (frontier audits it)
    QueryDef(
      "q_m33_dbscan",
      (s, dir) => {
        val sp = s
        import sp.implicits._
        val cells = t(s, dir, "embeddings")
          .select(floor(col("embedding").getItem(0).cast("double") * 10)
            .as("cx"),
            floor(col("embedding").getItem(1).cast("double") * 10).as("cy"))
          .groupBy("cx", "cy").agg(count(lit(1)).as("c"))
        val offs = broadcast(Seq(-1L, 0L, 1L)
          .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
          .toDF("dx", "dy"))
        val den = cells.crossJoin(offs)
          .groupBy((col("cx") + col("dx")).as("tx"),
            (col("cy") + col("dy")).as("ty"))
          .agg(sum(col("c")).as("den"))
        val core = cells.join(den,
            cells("cx") === den("tx") && cells("cy") === den("ty"))
          .filter(col("den") >= MinPts)
          .select(col("cx"), col("cy"), col("c"),
            // collision-free cell id: |cy| < 50000 by construction (cy is
            // floor(coord*10) of a unit-scale embedding coordinate), so
            // cx*100000+cy is injective with no range assumption on cx —
            // the old (cx+16)*64+(cy+16) aliased distinct cells outside
            // [-16,48), silently merging unrelated clusters
            (col("cx") * 100000L + col("cy")).as("id"))
          .localCheckpoint(true)
        val nbr = core.select(col("cx").as("nx"), col("cy").as("ny"),
          col("id").as("nid"))
        val edges = core.crossJoin(offs)
          .select(col("id"), (col("cx") + col("dx")).as("tx"),
            (col("cy") + col("dy")).as("ty"))
          .join(nbr, col("tx") === col("nx") && col("ty") === col("ny"))
          .select(col("id"), col("nid"))
          .localCheckpoint(true)
        var lab = core.select(col("id"), col("id").as("lbl"))
        for (_ <- 1 to Iters) {
          lab = edges
            .join(lab.select(col("id").as("nid"), col("lbl")), Seq("nid"))
            .groupBy("id").agg(min(col("lbl")).as("lbl"))
            .localCheckpoint(true)
        }
        val frontier = broadcast(edges
          .join(lab.select(col("id"), col("lbl").as("la")), Seq("id"))
          .join(lab.select(col("id").as("nid"), col("lbl").as("lb")),
            Seq("nid"))
          .agg(sum(when(col("la") =!= col("lb"), 1L).otherwise(0L))
            .as("frontier")))
        lab.join(core.select(col("id"), col("c")), Seq("id"))
          .groupBy(col("lbl").as("cluster_id"))
          .agg(count(lit(1)).as("n_cells"), sum(col("c")).as("n_pts"))
          .crossJoin(frontier)
          .orderBy(desc("n_pts"), col("cluster_id"))
      },
      Some {
        val rounds = (1 to Iters).map { k =>
          s"""l$k AS (
          SELECT e.id, min(l.lbl) AS lbl
          FROM edges e JOIN l${k - 1} l ON l.id = e.nid GROUP BY 1)"""
        }.mkString(",\n        ")
        s"""
        WITH cells AS MATERIALIZED (
          SELECT CAST(floor(CAST(list_extract(embedding, 1) AS DOUBLE)
                   * 10) AS BIGINT) AS cx,
                 CAST(floor(CAST(list_extract(embedding, 2) AS DOUBLE)
                   * 10) AS BIGINT) AS cy,
                 count(*) AS c
          FROM embeddings GROUP BY 1, 2),
        offs AS (
          SELECT dx, dy
          FROM (SELECT CAST(unnest(range(-1, 2)) AS BIGINT) AS dx),
               (SELECT CAST(unnest(range(-1, 2)) AS BIGINT) AS dy)),
        den AS (
          SELECT cx + dx AS tx, cy + dy AS ty, CAST(sum(c) AS BIGINT) AS den
          FROM cells, offs GROUP BY 1, 2),
        core AS MATERIALIZED (
          SELECT cx, cy, c, cx * 100000 + cy AS id
          FROM cells JOIN den ON cx = tx AND cy = ty
          WHERE den >= $MinPts),
        edges AS MATERIALIZED (
          SELECT a.id, n.id AS nid
          FROM core a, offs
          JOIN core n ON n.cx = a.cx + dx AND n.cy = a.cy + dy),
        l0 AS (SELECT id, id AS lbl FROM core),
        $rounds,
        fr AS (
          SELECT CAST(sum(CASE WHEN a.lbl <> b.lbl THEN 1 ELSE 0 END)
                   AS BIGINT) AS frontier
          FROM edges e
          JOIN l$Iters a ON a.id = e.id
          JOIN l$Iters b ON b.id = e.nid)
        SELECT lbl AS cluster_id, count(*) AS n_cells,
               CAST(sum(c) AS BIGINT) AS n_pts, frontier
        FROM l$Iters JOIN core USING (id), fr
        GROUP BY 1, frontier
        ORDER BY n_pts DESC, cluster_id"""
      }
    )
  }

  /** M32 — split-conformal prediction coverage (Vovk et al.; the
    * distribution-free intervals audit a model-serving pipeline runs):
    * OLS y~x fit on the train split (exact-decimal moments → bit-identical
    * slope/intercept in both engines), q̂ = ⌈0.9·(n_cal+1)⌉-th smallest
    * absolute calibration residual (exact selection via
    * ExactQuantiles.kthSmallest — histogram bisection, no global sort),
    * then empirical coverage of ŷ±q̂ on the held-out test split. The
    * orderkey%5 group-level split keeps all three subsets
    * deterministic; residuals are the same IEEE op chain per row, so the
    * order statistic and every count are bit-exact.
    */
  val m32Conformal = QueryDef(
    "q_m32_conformal",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select((col("l_orderkey") % 5).as("g"),
          col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").as("y"))
      val mom = broadcast(li.filter(col("g") < 3).agg(
          count(lit(1)).cast("double").as("nn"),
          decD(sum(col("x").cast("decimal(28,6)"))).as("sx"),
          decD(sum(col("y").cast("decimal(28,6)"))).as("sy"),
          decD(sum((col("x") * col("y")).cast("decimal(28,6)"))).as("sxy"),
          decD(sum((col("x") * col("x")).cast("decimal(28,6)"))).as("sxx"))
        .withColumn("b", (col("nn") * col("sxy") - col("sx") * col("sy")) /
          (col("nn") * col("sxx") - col("sx") * col("sx")))
        .withColumn("a", (col("sy") - col("b") * col("sx")) / col("nn")))
      val withR = li.crossJoin(mom)
        .withColumn("r", abs(col("y") - (col("a") + col("b") * col("x"))))
      val cal = withR.filter(col("g") === 3)
      val nCal = cal.count()
      val k = math.min(nCal, (9L * (nCal + 1) + 9) / 10)
      val qhat = graft.analytics.ExactQuantiles.kthSmallest(
        cal, "r", k, buckets = 1024, cutoff = 2000)
      val cov = broadcast(withR.filter(col("g") === 4).agg(
        count(lit(1)).as("n_test"),
        sum(when(col("r") <= lit(qhat), 1L).otherwise(0L)).as("n_cov")))
      mom.select(col("nn").cast("long").as("n_train"),
          r6(col("b")).as("slope"), r2(col("a")).as("intercept"))
        .crossJoin(cov)
        .select(col("n_train"), lit(nCal).as("n_cal"), col("n_test"),
          col("slope"), col("intercept"), r2(lit(qhat)).as("qhat"),
          r6(col("n_cov").cast("double") / col("n_test").cast("double"))
            .as("coverage"))
    },
    Some(s"""
      WITH li AS (
        SELECT l_orderkey % 5 AS g, CAST(l_quantity AS DOUBLE) AS x,
               l_extendedprice AS y
        FROM lineitem),
      m0 AS (
        SELECT CAST(count(*) AS DOUBLE) AS nn,
               ${sqlDecD("sum(CAST(x AS DECIMAL(28,6)))")} AS sx,
               ${sqlDecD("sum(CAST(y AS DECIMAL(28,6)))")} AS sy,
               ${sqlDecD("sum(CAST(x * y AS DECIMAL(28,6)))")} AS sxy,
               ${sqlDecD("sum(CAST(x * x AS DECIMAL(28,6)))")} AS sxx
        FROM li WHERE g < 3),
      ab1 AS (
        SELECT nn, sx, sy,
               (nn * sxy - sx * sy) / (nn * sxx - sx * sx) AS b
        FROM m0),
      ab AS (SELECT nn, b, (sy - b * sx) / nn AS a FROM ab1),
      rr AS (SELECT g, abs(y - (a + b * x)) AS r FROM li, ab),
      cal AS (SELECT r FROM rr WHERE g = 3),
      kk AS (
        SELECT count(*) AS n_cal,
               least(count(*), (9 * (count(*) + 1) + 9) // 10) AS k
        FROM cal),
      q AS (
        SELECT r AS qhat FROM
          (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal) s
        JOIN kk ON s.rn = kk.k),
      tst AS (SELECT r FROM rr WHERE g = 4)
      SELECT CAST(ab.nn AS BIGINT) AS n_train, kk.n_cal AS n_cal,
             count(*) AS n_test, ${sqlR6("ab.b")} AS slope,
             ${sqlR2("ab.a")} AS intercept, ${sqlR2("q.qhat")} AS qhat,
             ${sqlR6("CAST(sum(CASE WHEN tst.r <= q.qhat THEN 1 ELSE 0 " +
      "END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS coverage
      FROM tst, ab, kk, q
      GROUP BY ab.nn, ab.b, ab.a, kk.n_cal, q.qhat""")
  )

  /** M34 — Chow structural-break test (Chow 1960): does the price~quantity
    * regression change between the pre-1997 and 1997+ shipping periods?
    * Per flag: separate OLS fits on each period plus the pooled fit, all
    * from ONE pass of exact-decimal conditional moments (CASE-gated sums
    * — order-independent, bit-identical), SSRs in closed form
    * (Syy_c − b·Sxy_c), and F = ((SSR_p − SSR_a − SSR_b)/k) /
    * ((SSR_a + SSR_b)/(n−2k)) with k=2. Identical double op chains in
    * both engines; no second scan, no shuffle beyond the flag groupBy.
    */
  val m34Chow = QueryDef(
    "q_m34_chow",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          (year(col("l_shipdate")) >= 1997).as("p"),
          col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").as("y"))
      def cm(cond: Column, e: Column) =
        decD(sum(when(cond, e).otherwise(lit(0.0)).cast("decimal(28,6)")))
      def cn(cond: Column) =
        sum(when(cond, 1L).otherwise(0L))
      val a = !col("p")
      val b = col("p")
      val m = li.groupBy("flag").agg(
        cn(a).as("na_l"), cn(b).as("nb_l"),
        cm(a, col("x")).as("sxa"), cm(a, col("y")).as("sya"),
        cm(a, col("x") * col("x")).as("sxxa"),
        cm(a, col("x") * col("y")).as("sxya"),
        cm(a, col("y") * col("y")).as("syya"),
        cm(b, col("x")).as("sxb"), cm(b, col("y")).as("syb"),
        cm(b, col("x") * col("x")).as("sxxb"),
        cm(b, col("x") * col("y")).as("sxyb"),
        cm(b, col("y") * col("y")).as("syyb"),
        decD(sum(col("x").cast("decimal(28,6)"))).as("sxp"),
        decD(sum(col("y").cast("decimal(28,6)"))).as("syp"),
        decD(sum((col("x") * col("x")).cast("decimal(28,6)"))).as("sxxp"),
        decD(sum((col("x") * col("y")).cast("decimal(28,6)"))).as("sxyp"),
        decD(sum((col("y") * col("y")).cast("decimal(28,6)"))).as("syyp"),
        count(lit(1)).cast("double").as("np"))
        .withColumn("na", col("na_l").cast("double"))
        .withColumn("nb", col("nb_l").cast("double"))
      def slope(n: String, sx: String, sy: String, sxx: String,
          sxy: String) =
        (col(n) * col(sxy) - col(sx) * col(sy)) /
          (col(n) * col(sxx) - col(sx) * col(sx))
      def ssr(bCol: Column, n: String, sx: String, sy: String, sxy: String,
          syy: String) =
        (col(syy) - col(sy) * col(sy) / col(n)) -
          bCol * (col(sxy) - col(sx) * col(sy) / col(n))
      m.withColumn("ba", slope("na", "sxa", "sya", "sxxa", "sxya"))
        .withColumn("bb", slope("nb", "sxb", "syb", "sxxb", "sxyb"))
        .withColumn("bp", slope("np", "sxp", "syp", "sxxp", "sxyp"))
        .withColumn("ssra",
          ssr(col("ba"), "na", "sxa", "sya", "sxya", "syya"))
        .withColumn("ssrb",
          ssr(col("bb"), "nb", "sxb", "syb", "sxyb", "syyb"))
        .withColumn("ssrp",
          ssr(col("bp"), "np", "sxp", "syp", "sxyp", "syyp"))
        .select(col("flag"), col("na_l").as("n_a"), col("nb_l").as("n_b"),
          r6(col("ba")).as("slope_a"), r6(col("bb")).as("slope_b"),
          r6(((col("ssrp") - col("ssra") - col("ssrb")) / lit(2.0)) /
            ((col("ssra") + col("ssrb")) /
              (col("na") + col("nb") - lit(4.0)))).as("f_chow"))
        .orderBy("flag")
    },
    Some {
      def dm(cond: String, e: String) =
        sqlDecD(s"sum(CAST(CASE WHEN $cond THEN $e ELSE 0e0 END " +
          "AS DECIMAL(28,6)))")
      def sl(n: String, sx: String, sy: String, sxx: String, sxy: String) =
        s"($n * $sxy - $sx * $sy) / ($n * $sxx - $sx * $sx)"
      def sr(b: String, n: String, sx: String, sy: String, sxy: String,
          syy: String) =
        s"(($syy - $sy * $sy / $n) - $b * ($sxy - $sx * $sy / $n))"
      s"""
      WITH li AS (
        SELECT l_returnflag AS flag,
               year(l_shipdate) >= 1997 AS p,
               CAST(l_quantity AS DOUBLE) AS x, l_extendedprice AS y
        FROM lineitem),
      m AS (
        SELECT flag,
               CAST(sum(CASE WHEN NOT p THEN 1 ELSE 0 END) AS BIGINT)
                 AS na_l,
               CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS nb_l,
               ${dm("NOT p", "x")} AS sxa, ${dm("NOT p", "y")} AS sya,
               ${dm("NOT p", "x * x")} AS sxxa,
               ${dm("NOT p", "x * y")} AS sxya,
               ${dm("NOT p", "y * y")} AS syya,
               ${dm("p", "x")} AS sxb, ${dm("p", "y")} AS syb,
               ${dm("p", "x * x")} AS sxxb, ${dm("p", "x * y")} AS sxyb,
               ${dm("p", "y * y")} AS syyb,
               ${sqlDecD("sum(CAST(x AS DECIMAL(28,6)))")} AS sxp,
               ${sqlDecD("sum(CAST(y AS DECIMAL(28,6)))")} AS syp,
               ${sqlDecD("sum(CAST(x * x AS DECIMAL(28,6)))")} AS sxxp,
               ${sqlDecD("sum(CAST(x * y AS DECIMAL(28,6)))")} AS sxyp,
               ${sqlDecD("sum(CAST(y * y AS DECIMAL(28,6)))")} AS syyp,
               CAST(count(*) AS DOUBLE) AS np
        FROM li GROUP BY 1),
      m2 AS (
        SELECT *, CAST(na_l AS DOUBLE) AS na, CAST(nb_l AS DOUBLE) AS nb
        FROM m),
      bs AS (
        SELECT *,
               ${sl("na", "sxa", "sya", "sxxa", "sxya")} AS ba,
               ${sl("nb", "sxb", "syb", "sxxb", "sxyb")} AS bb,
               ${sl("np", "sxp", "syp", "sxxp", "sxyp")} AS bp
        FROM m2),
      sr AS (
        SELECT *,
               ${sr("ba", "na", "sxa", "sya", "sxya", "syya")} AS ssra,
               ${sr("bb", "nb", "sxb", "syb", "sxyb", "syyb")} AS ssrb,
               ${sr("bp", "np", "sxp", "syp", "sxyp", "syyp")} AS ssrp
        FROM bs)
      SELECT flag, na_l AS n_a, nb_l AS n_b,
             ${sqlR6("ba")} AS slope_a, ${sqlR6("bb")} AS slope_b,
             ${sqlR6("((ssrp - ssra - ssrb) / 2e0) " +
        "/ ((ssra + ssrb) / (na + nb - 4e0))")} AS f_chow
      FROM sr ORDER BY flag"""
    }
  )

  /** Ljung–Box portmanteau test (Ljung & Box 1978) at lags 1–5 over the
    * daily mean-price return series per flag — the "is this series white
    * noise" gate run on residuals after every forecasting fit (the
    * q_f_acf chart's formal test). Unlike q_f_acf's `corr`, every
    * autocorrelation here is EXACT: the mean is a decimal(38,18) sum ÷ n,
    * per-row deviation products are identical doubles cast to decimal and
    * summed order-independently (sumE idiom), the decimal→double exits go
    * through decD, so each ρ_k is one IEEE division and
    * Q = n(n+2)·Σρ_k²/(n−k) is a short identical op chain → r6 is pure
    * formality. One shuffle for the daily aggregate, one window pass for
    * all five lags, 3-row output.
    */
  val m35LjungBox = {
    val H = 5
    QueryDef(
      "q_m35_ljungbox",
      (s, dir) => {
        val byDay = Window.partitionBy("l_returnflag").orderBy("day")
        val daily = t(s, dir, "lineitem")
          .withColumn("day",
            date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
          .groupBy("l_returnflag", "day")
          .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double") / count(lit(1))).as("y"))
        val rets = daily
          .withColumn("ret", col("y") / lag(col("y"), 1).over(byDay) - 1)
          .where(col("ret").isNotNull)
        val mean = rets.groupBy("l_returnflag")
          .agg(decD(sum(col("ret").cast("decimal(38,18)"))).as("sr"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), (col("sr") / col("n")).as("mu"),
            col("n"))
        val dev = rets.join(broadcast(mean), Seq("l_returnflag"))
          .withColumn("dv", col("ret") - col("mu"))
        val lagged = dev.select(
          col("l_returnflag") +: col("day") +: col("n") +: col("dv") +:
            (1 to H).map(k => lag(col("dv"), k).over(byDay).as(s"d$k")): _*)
        val aggs =
          decD(sum((col("dv") * col("dv")).cast("decimal(38,18)")))
            .as("s0") +:
          (1 to H).map(k =>
            decD(sum((col("dv") * col(s"d$k")).cast("decimal(38,18)")))
              .as(s"s$k"))
        val a = lagged.groupBy("l_returnflag")
          .agg(max(col("n")).as("n"), aggs: _*)
        def rho(k: Int) = col(s"s$k") / col("s0")
        val nD = col("n").cast("double")
        val qStat = nD * (nD + lit(2.0)) * (1 to H)
          .map(k => rho(k) * rho(k) / (nD - lit(k.toDouble)))
          .reduce(_ + _)
        a.select(col("l_returnflag") +: col("n") +:
            (1 to H).map(k => r6(rho(k)).as(s"rho$k")) :+
            r6(qStat).as("q_lb"): _*)
          .orderBy("l_returnflag")
      },
      Some {
        val lagCols = (1 to H).map(k =>
          s"lag(dv, $k) OVER w AS d$k").mkString(", ")
        val sCols = (1 to H).map(k =>
          s"${sqlDecD(s"sum(CAST(dv * d$k AS DECIMAL(38,18)))")} AS s$k")
          .mkString(", ")
        val rhoCols = (1 to H).map(k =>
          s"${sqlR6(s"s$k / s0")} AS rho$k").mkString(", ")
        val qExpr = (1 to H).map(k =>
          s"(s$k / s0) * (s$k / s0) / (CAST(n AS DOUBLE) - ${k.toDouble}e0)")
          .mkString(" + ")
        s"""
        WITH daily AS (
          SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                   AS DOUBLE) / count(*) AS y
          FROM lineitem GROUP BY 1, 2),
        rets AS (
          SELECT l_returnflag, day, y / lag(y, 1) OVER w - 1 AS ret
          FROM daily
          WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)),
        rr AS (SELECT * FROM rets WHERE ret IS NOT NULL),
        m AS (
          SELECT l_returnflag,
                 ${sqlDecD("sum(CAST(ret AS DECIMAL(38,18)))")} / count(*)
                   AS mu,
                 count(*) AS n
          FROM rr GROUP BY 1),
        d AS (
          SELECT rr.l_returnflag, day, n, ret - mu AS dv
          FROM rr JOIN m USING (l_returnflag)),
        lg AS (
          SELECT l_returnflag, n, dv, $lagCols
          FROM d
          WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)),
        a AS (
          SELECT l_returnflag, max(n) AS n,
                 ${sqlDecD("sum(CAST(dv * dv AS DECIMAL(38,18)))")} AS s0,
                 $sCols
          FROM lg GROUP BY 1)
        SELECT l_returnflag, n, $rhoCols,
               ${sqlR6(s"CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2e0)" +
          s" * ($qExpr)")} AS q_lb
        FROM a ORDER BY 1"""
      }
    )
  }

  /** RANSAC line fit (Fischler & Bolles 1981) over each flag's daily
    * mean-price series — the robust estimator that, unlike Huber/Theil–
    * Sen (q_m28/q_m17), fits on a MINIMAL sample and scores by inlier
    * consensus. Determinism: the "random" 2-point samples for the K=8
    * hypotheses come from ranking days by the portable md5-60 of
    * `flag#seed#x` (the repo's rand() replacement), so both engines draw
    * identical samples; each hypothesis line is two IEEE ops on exact
    * inputs (x is a dense day rank, y an exact decimal daily mean), the
    * inlier test |y−(a+bx)| ≤ τ compares identical doubles, and the
    * winner is an integer argmax (inliers desc, seed). Scale shape: the
    * hypothesis draw is a days×K window rank, scoring is one
    * broadcast-join pass over the series — RANSAC's classic
    * embarrassingly-parallel structure, no iteration.
    */
  val m36Ransac = {
    val K = 8 // hypotheses per flag
    val Tau = 250.0 // inlier band around the candidate line
    QueryDef(
      "q_m36_ransac",
      (s, dir) => {
        import graft.functions.Md5Prefix60.md5Prefix60
        val byDay = Window.partitionBy("l_returnflag").orderBy("day")
        val daily = t(s, dir, "lineitem")
          .withColumn("day",
            date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
          .groupBy("l_returnflag", "day")
          .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double") / count(lit(1))).as("y"))
          .withColumn("x", row_number().over(byDay).cast("long"))
          .select(col("l_returnflag").as("flag"), col("x"), col("y"))
        val seeds = broadcast(s.range(K).select(col("id").as("seed")))
        val drawn = daily.crossJoin(seeds)
          .withColumn("h",
            md5Prefix60(Seq(col("flag"), col("seed"), col("x"))))
          .withColumn("rn", row_number().over(
            Window.partitionBy("flag", "seed").orderBy("h", "x")))
          .filter(col("rn") <= 2)
        val p1 = drawn.filter(col("rn") === 1)
          .select(col("flag"), col("seed"), col("x").as("x1"),
            col("y").as("y1"))
        val p2 = drawn.filter(col("rn") === 2)
          .select(col("flag"), col("seed"), col("x").as("x2"),
            col("y").as("y2"))
        val models = p1.join(p2, Seq("flag", "seed"))
          .select(col("flag"), col("seed"),
            ((col("y2") - col("y1")) /
              (col("x2") - col("x1")).cast("double")).as("b"),
            (col("y1") - (col("y2") - col("y1")) /
              (col("x2") - col("x1")).cast("double") *
              col("x1").cast("double")).as("a"))
        val scored = daily.join(broadcast(models), Seq("flag"))
          .groupBy("flag", "seed")
          .agg(max(col("a")).as("a"), max(col("b")).as("b"),
            count(lit(1)).as("n_days"),
            sum(when(abs(col("y") - (col("a") +
              col("b") * col("x").cast("double"))) <= lit(Tau), 1L)
              .otherwise(0L)).as("n_inliers"))
        scored.withColumn("pick", row_number().over(
            Window.partitionBy("flag")
              .orderBy(desc("n_inliers"), col("seed"))))
          .filter(col("pick") === 1)
          .select(col("flag"), col("seed"), col("n_days"),
            col("n_inliers"), r6(col("b")).as("slope"),
            r2(col("a")).as("intercept"))
          .orderBy("flag")
      },
      Some {
        val h = "CAST(('0x' || substr(md5(flag || '#' || " +
          "CAST(seed AS VARCHAR) || '#' || CAST(x AS VARCHAR)), 1, 15)) " +
          "AS BIGINT)"
        s"""
        WITH daily AS (
          SELECT flag, CAST(row_number() OVER (PARTITION BY flag
                   ORDER BY day) AS BIGINT) AS x, y
          FROM (
            SELECT l_returnflag AS flag,
                   date_trunc('day', l_shipdate) AS day,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                     AS DOUBLE) / count(*) AS y
            FROM lineitem GROUP BY 1, 2)),
        drawn AS (
          SELECT flag, seed, x, y,
                 row_number() OVER (PARTITION BY flag, seed
                   ORDER BY $h, x) AS rn
          FROM daily
          CROSS JOIN (SELECT CAST(unnest(range($K)) AS BIGINT) AS seed)),
        models AS (
          SELECT p1.flag, p1.seed,
                 (p2.y - p1.y) / CAST(p2.x - p1.x AS DOUBLE) AS b,
                 p1.y - (p2.y - p1.y) / CAST(p2.x - p1.x AS DOUBLE)
                   * CAST(p1.x AS DOUBLE) AS a
          FROM (SELECT * FROM drawn WHERE rn = 1) p1
          JOIN (SELECT * FROM drawn WHERE rn = 2) p2
            ON p2.flag = p1.flag AND p2.seed = p1.seed),
        scored AS (
          SELECT daily.flag, seed, max(a) AS a, max(b) AS b,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(CASE WHEN abs(y - (a + b * CAST(x AS DOUBLE)))
                   <= ${sqlD(Tau)} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_inliers
          FROM daily JOIN models ON models.flag = daily.flag
          GROUP BY 1, 2)
        SELECT flag, seed, n_days, n_inliers,
               ${sqlR6("b")} AS slope, ${sqlR2("a")} AS intercept
        FROM (SELECT *, row_number() OVER (PARTITION BY flag
                ORDER BY n_inliers DESC, seed) AS pick
              FROM scored)
        WHERE pick = 1 ORDER BY flag"""
      }
    )
  }

  /** McNemar's test (1947, with Edwards' continuity correction) on the
    * PAIRED daily up/down outcomes of the A and R series — the
    * marginal-homogeneity check a paired classifier comparison runs,
    * where the unpaired χ² (q_a17) would be wrong. The discordant-pair
    * counts b (A up, R down) and c (A down, R up) are exact integers
    * from comparisons of identical doubles (each series' up-day flag
    * compares an exact decimal daily mean against its lag), and
    * χ² = (|b−c|−1)²/(b+c) is three IEEE ops. One daily aggregate, one
    * self-join on day, 1-row output.
    */
  val m37McNemar = QueryDef(
    "q_m37_mcnemar",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val daily = t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
        .withColumn("up",
          when(col("y") > lag(col("y"), 1).over(byDay), 1L).otherwise(0L))
        .withColumn("has_prev", lag(col("y"), 1).over(byDay).isNotNull)
        .filter(col("has_prev"))
      val a = daily.filter(col("l_returnflag") === "A")
        .select(col("day"), col("up").as("up_a"))
      val r = daily.filter(col("l_returnflag") === "R")
        .select(col("day"), col("up").as("up_r"))
      a.join(r, Seq("day"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("up_a") === 1L && col("up_r") === 1L, 1L)
            .otherwise(0L)).as("n_both_up"),
          sum(when(col("up_a") === 0L && col("up_r") === 0L, 1L)
            .otherwise(0L)).as("n_both_down"),
          sum(when(col("up_a") === 1L && col("up_r") === 0L, 1L)
            .otherwise(0L)).as("n_b"),
          sum(when(col("up_a") === 0L && col("up_r") === 1L, 1L)
            .otherwise(0L)).as("n_c"))
        .select(col("n_days"), col("n_both_up"), col("n_both_down"),
          col("n_b"), col("n_c"),
          r6((abs(col("n_b") - col("n_c")).cast("double") - lit(1.0)) *
            (abs(col("n_b") - col("n_c")).cast("double") - lit(1.0)) /
            (col("n_b") + col("n_c")).cast("double")).as("mcnemar_chi2"))
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                 AS DOUBLE) / count(*) AS y
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2),
      ud AS (
        SELECT flag, day,
               CASE WHEN y > lag(y, 1) OVER w THEN 1 ELSE 0 END AS up,
               lag(y, 1) OVER w IS NOT NULL AS has_prev
        FROM daily WINDOW w AS (PARTITION BY flag ORDER BY day)),
      p AS (
        SELECT a.day, a.up AS up_a, r.up AS up_r
        FROM (SELECT * FROM ud WHERE flag = 'A' AND has_prev) a
        JOIN (SELECT * FROM ud WHERE flag = 'R' AND has_prev) r
          ON r.day = a.day),
      k AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CASE WHEN up_a = 1 AND up_r = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_both_up,
               CAST(sum(CASE WHEN up_a = 0 AND up_r = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_both_down,
               CAST(sum(CASE WHEN up_a = 1 AND up_r = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN up_a = 0 AND up_r = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_c
        FROM p)
      SELECT n_days, n_both_up, n_both_down, n_b, n_c,
             ${sqlR6("(CAST(abs(n_b - n_c) AS DOUBLE) - 1e0)" +
        " * (CAST(abs(n_b - n_c) AS DOUBLE) - 1e0)" +
        " / CAST(n_b + n_c AS DOUBLE)")} AS mcnemar_chi2
      FROM k""")
  )

  /** Page–Hinkley drift detector (Page 1954; the sequential
    * change-of-mean monitor streaming ML systems run beside PSI/CUSUM —
    * q_a28 bins distributions, q_m16 cusums around the GLOBAL mean,
    * PH tracks deviation from the RUNNING mean, so it needs no training
    * window). Everything is prefix-shaped, no recursion: the running
    * mean is an exact decimal prefix sum ÷ row_number (identical IEEE
    * division), the PH series m_t is a second exact decimal prefix sum
    * of identical per-row terms, and the alarm statistic
    * PH = m_T − min_t m_t is a window min of identical doubles. Scale:
    * three window passes over the calendar-bounded daily series — on a
    * cluster this is SequenceOps.runningSum's range-partitioned scan
    * shape.
    */
  val m39PageHinkley = QueryDef(
    "q_m39_page_hinkley",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val cum = byDay.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val all = Window.partitionBy("l_returnflag")
      val daily = t(s, dir, "lineitem")
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
      val ph = daily
        .withColumn("i", row_number().over(byDay))
        .withColumn("mu",
          decD(sum(col("y").cast("decimal(28,6)")).over(cum)) /
            col("i").cast("double"))
        .withColumn("m",
          decD(sum((col("y") - col("mu")).cast("decimal(28,6)"))
            .over(cum)))
        .withColumn("m_min", min(col("m")).over(all))
        .withColumn("m_fin", last(col("m")).over(
          byDay.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      ph.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_days"),
          r2(max(col("m_fin"))).as("m_final"),
          r2(max(col("m_min"))).as("m_min"),
          r2(max(col("m_fin")) - max(col("m_min"))).as("ph_stat"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                 AS DOUBLE) / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      st AS (
        SELECT l_returnflag, day, y,
               row_number() OVER w AS i,
               ${sqlDecD("sum(CAST(y AS DECIMAL(28,6))) OVER cw")} AS sy
        FROM daily
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY day),
               cw AS (PARTITION BY l_returnflag ORDER BY day
                      ROWS UNBOUNDED PRECEDING)),
      tm AS (
        SELECT l_returnflag, day,
               y - sy / CAST(i AS DOUBLE) AS term
        FROM st),
      ms AS (
        SELECT l_returnflag, day,
               ${sqlDecD("sum(CAST(term AS DECIMAL(28,6))) OVER cw")} AS m
        FROM tm
        WINDOW cw AS (PARTITION BY l_returnflag ORDER BY day
                      ROWS UNBOUNDED PRECEDING)),
      fin AS (
        SELECT l_returnflag, count(*) AS n_days,
               min(m) AS mmin,
               max(CASE WHEN rn = 1 THEN m END) AS mfin
        FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                ORDER BY day DESC) AS rn
              FROM ms)
        GROUP BY 1)
      SELECT l_returnflag, CAST(n_days AS BIGINT) AS n_days,
             ${sqlR2("mfin")} AS m_final, ${sqlR2("mmin")} AS m_min,
             ${sqlR2("mfin - mmin")} AS ph_stat
      FROM fin ORDER BY 1""")
  )

  /** Cohen's d with Hedges' g correction — the effect size behind the
    * A-vs-R Welch test (q_m11 reports the t statistic; a 100 TB A/B
    * readout reports d so significance can't masquerade as magnitude).
    * Means and variances come from exact decimal Σx and Σx² of the two
    * return series (moment formulas, identical per-row doubles), the
    * pooled SD and d/g are a short pinned IEEE chain → r6. Two grouped
    * aggregates and a 1-row broadcast cross join.
    */
  val m40CohensD = QueryDef(
    "q_m40_cohens_d",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val rets = t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
        .withColumn("ret", col("y") / lag(col("y"), 1).over(byDay) - 1)
        .where(col("ret").isNotNull)
      val mom = rets.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          decD(sum(col("ret").cast("decimal(38,18)"))).as("sx"),
          decD(sum((col("ret") * col("ret")).cast("decimal(38,18)")))
            .as("sxx"))
        .select(col("l_returnflag"), col("n"), col("sx"), col("sxx"),
          (col("sx") / col("n").cast("double")).as("mean"),
          ((col("sxx") - col("sx") * col("sx") / col("n").cast("double"))
            / (col("n") - 1).cast("double")).as("v"))
      val a = mom.filter(col("l_returnflag") === "A")
        .select(col("n").as("n_a"), col("mean").as("mean_a"),
          col("v").as("v_a"))
      val r = mom.filter(col("l_returnflag") === "R")
        .select(col("n").as("n_r"), col("mean").as("mean_r"),
          col("v").as("v_r"))
      val nn = (col("n_a") + col("n_r")).cast("double")
      val sp = sqrt(((col("n_a") - 1).cast("double") * col("v_a") +
        (col("n_r") - 1).cast("double") * col("v_r")) / (nn - lit(2.0)))
      val d = (col("mean_a") - col("mean_r")) / sp
      broadcast(a).crossJoin(broadcast(r))
        .select(col("n_a"), col("n_r"),
          r6(col("mean_a")).as("mean_a"), r6(col("mean_r")).as("mean_r"),
          r6(sp).as("pooled_sd"), r6(d).as("cohens_d"),
          r6(d * (lit(1.0) - lit(3.0) / (lit(4.0) * nn - lit(9.0))))
            .as("hedges_g"))
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                 AS DOUBLE) / count(*) AS y
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2),
      rets AS (
        SELECT l_returnflag, y / lag(y, 1) OVER w - 1 AS ret
        FROM daily
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)),
      mom AS (
        SELECT l_returnflag, count(*) AS n,
               ${sqlDecD("sum(CAST(ret AS DECIMAL(38,18)))")} AS sx,
               ${sqlDecD("sum(CAST(ret * ret AS DECIMAL(38,18)))")} AS sxx
        FROM rets WHERE ret IS NOT NULL GROUP BY 1),
      mv AS (
        SELECT l_returnflag, n, sx / CAST(n AS DOUBLE) AS mean,
               (sxx - sx * sx / CAST(n AS DOUBLE))
                 / CAST(n - 1 AS DOUBLE) AS v
        FROM mom),
      ab AS (
        SELECT a.n AS n_a, a.mean AS mean_a, a.v AS v_a,
               r.n AS n_r, r.mean AS mean_r, r.v AS v_r
        FROM (SELECT * FROM mv WHERE l_returnflag = 'A') a
        CROSS JOIN (SELECT * FROM mv WHERE l_returnflag = 'R') r)
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_r AS BIGINT) AS n_r,
             ${sqlR6("mean_a")} AS mean_a, ${sqlR6("mean_r")} AS mean_r,
             ${sqlR6("""sqrt((CAST(n_a - 1 AS DOUBLE) * v_a
               + CAST(n_r - 1 AS DOUBLE) * v_r)
               / (CAST(n_a + n_r AS DOUBLE) - 2e0))""")} AS pooled_sd,
             ${sqlR6("""(mean_a - mean_r) / sqrt((CAST(n_a - 1 AS DOUBLE)
               * v_a + CAST(n_r - 1 AS DOUBLE) * v_r)
               / (CAST(n_a + n_r AS DOUBLE) - 2e0))""")} AS cohens_d,
             ${sqlR6("""(mean_a - mean_r) / sqrt((CAST(n_a - 1 AS DOUBLE)
               * v_a + CAST(n_r - 1 AS DOUBLE) * v_r)
               / (CAST(n_a + n_r AS DOUBLE) - 2e0))
               * (1e0 - 3e0 / (4e0 * CAST(n_a + n_r AS DOUBLE) - 9e0))""")}
               AS hedges_g
      FROM ab""")
  )

  /** Weighted median (quantity-weighted price per flag) — the
    * order-statistic the plain median family (q_m13, q_w14) can't
    * express: the smallest price whose cumulative weight covers half
    * the total. Entirely exact: prices become integer cents via a
    * DECIMAL(18,2) cast (they carry 2 decimals by construction),
    * weights are integer quantities, and the selection predicate is
    * the integer comparison 2·cum ≥ W — no halving, no floats until
    * the final cents→price division. Histogram + prefix sum per flag
    * (the q_a20_gini shape), never a global sort of raw rows.
    */
  val m41WeightedMedian = QueryDef(
    "q_m41_weighted_median",
    (s, dir) => {
      val byPrice = Window.partitionBy("l_returnflag").orderBy("cents")
      val hist = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"),
          col("l_quantity").cast("long").as("w"))
        .groupBy("l_returnflag", "cents")
        .agg(sum(col("w")).as("cw"))
      val cum = hist
        .withColumn("cum", sum(col("cw")).over(
          byPrice.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .withColumn("tot", sum(col("cw")).over(
          Window.partitionBy("l_returnflag")))
      cum.filter(col("cum") * 2 >= col("tot"))
        .groupBy("l_returnflag")
        .agg(max(col("tot")).as("w_total"),
          min(col("cents")).as("med_cents"))
        .select(col("l_returnflag"), col("w_total"),
          (col("med_cents").cast("double") / 100.0)
            .as("weighted_median"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH h AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                 AS BIGINT) AS cents,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS cw
        FROM lineitem GROUP BY 1, 2),
      c AS (
        SELECT l_returnflag, cents, cw,
               sum(cw) OVER (PARTITION BY l_returnflag ORDER BY cents
                 ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cw) OVER (PARTITION BY l_returnflag) AS tot
        FROM h)
      SELECT l_returnflag, CAST(max(tot) AS BIGINT) AS w_total,
             CAST(min(cents) AS DOUBLE) / 100e0 AS weighted_median
      FROM c WHERE cum * 2 >= tot
      GROUP BY 1 ORDER BY 1""")
  )

  /** M42 capability: ROC AUC + Gini coefficient for a binary classifier
    * (score = event value in cents, positive class = 'purchase') — the
    * classifier-evaluation primitive every training pipeline reports.
    * Shaped for scale exactly like M7/M8: one groupBy builds the score
    * HISTOGRAM, plans.SequenceOps.runningSum (range-partitioned exact
    * prefix sum — no global sort, no single-partition window) accumulates
    * TP down the descending-score axis, and the trapezoid area under the
    * ROC curve is the EXACT INTEGER Σ fp·(2·cumTP − tp) (tie-handling
    * identical to the rank/Mann-Whitney formulation). Only the final
    * AUC division composes in double from identical operands →
    * bit-exact with no rounding at all.
    */
  val m42Auc = QueryDef(
    "q_m42_auc",
    (s, dir) => {
      import graft.plans.SequenceOps
      val h = t(s, dir, "events")
        .select(
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        .groupBy("cents")
        .agg(sum(col("pos")).as("tp"),
          (count(lit(1)) - sum(col("pos"))).as("fp"))
        // descending-score sweep: classify score ≥ t as positive
        .withColumn("neg_cents", -col("cents"))
      val c = SequenceOps.runningSum(h, Nil, Seq("neg_cents"), "tp", "cum_tp")
      val a = c
        .agg(
          sum((col("fp") * (lit(2L) * col("cum_tp") - col("tp")))
            .cast("decimal(38,0)")).as("area2"),
          sum(col("tp")).as("n_pos"), sum(col("fp")).as("n_neg"))
      val auc = col("area2").cast("double") /
        (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double"))
      a.select(col("n_pos"), col("n_neg"), auc.as("auc"),
        (lit(2.0) * auc - lit(1.0)).as("gini"))
    },
    Some(s"""
      WITH src AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events),
      h AS (
        SELECT cents, CAST(sum(pos) AS BIGINT) AS tp,
               CAST(count(*) - sum(pos) AS BIGINT) AS fp
        FROM src GROUP BY 1),
      c AS (
        SELECT tp, fp,
               CAST(sum(tp) OVER (ORDER BY cents DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_tp
        FROM h),
      a AS (
        SELECT CAST(sum(CAST(fp * (2 * cum_tp - tp) AS DECIMAL(38,0)))
                 AS DECIMAL(38,0)) AS area2,
               CAST(sum(tp) AS BIGINT) AS n_pos,
               CAST(sum(fp) AS BIGINT) AS n_neg
        FROM c)
      SELECT n_pos, n_neg,
             CAST(area2 AS DOUBLE)
               / (2e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc,
             2e0 * (CAST(area2 AS DOUBLE)
               / (2e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
               - 1e0 AS gini
      FROM a""")
  )

  /** M43 capability: decision-stump split finding — the histogram-based
    * best-split scan at the heart of every distributed tree learner
    * (XGBoost/LightGBM grow trees from exactly this primitive). Predicts
    * order fulfillment (o_orderstatus = 'F') from the order date; every
    * distinct day is a candidate threshold. One groupBy builds the
    * (day → count, positives) histogram, two runningSum passes give exact
    * integer left-side totals, and the split criterion
    * Σside (pos² + neg²)/|side| (monotone in Gini-impurity decrease)
    * composes in double from EXACT INTEGER operands in a pinned op order
    * — so the argmax (score desc, day asc tie-break) is deterministic
    * cross-engine with no rounding. No global sort anywhere; the argmax
    * is a top-1 TakeOrdered.
    */
  val m43Stump = QueryDef(
    "q_m43_stump",
    (s, dir) => {
      import graft.plans.SequenceOps
      val h = t(s, dir, "orders")
        .select(
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("d"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
        .groupBy("d")
        .agg(sum(col("pos")).as("p"), count(lit(1)).as("n"))
      val c = SequenceOps.runningSum(
        SequenceOps.runningSum(h, Nil, Seq("d"), "p", "cp"),
        Nil, Seq("d"), "n", "cn")
      val tot = h.agg(sum(col("p")).as("tp"), sum(col("n")).as("tn"))
      val sc = c.crossJoin(broadcast(tot))
        .filter(col("cn") < col("tn")) // both sides non-empty
        .withColumn("s",
          (col("cp") * col("cp")
            + (col("cn") - col("cp")) * (col("cn") - col("cp")))
            .cast("double") / col("cn").cast("double")
            + ((col("tp") - col("cp")) * (col("tp") - col("cp"))
              + (col("tn") - col("cn") - (col("tp") - col("cp")))
                * (col("tn") - col("cn") - (col("tp") - col("cp"))))
              .cast("double") / (col("tn") - col("cn")).cast("double"))
      val parent = (col("tp") * col("tp")
        + (col("tn") - col("tp")) * (col("tn") - col("tp")))
        .cast("double") / col("tn").cast("double")
      sc.orderBy(desc("s"), col("d")).limit(1)
        .select(col("d").as("split_day"),
          col("cn").as("n_left"), (col("tn") - col("cn")).as("n_right"),
          col("cp").as("pos_left"), (col("tp") - col("cp")).as("pos_right"),
          (col("s") / col("tn").cast("double")).as("purity"),
          ((col("s") - parent) / col("tn").cast("double")).as("gain"))
    },
    Some(s"""
      WITH src AS (
        SELECT date_diff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) AS d,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        FROM orders),
      h AS (
        SELECT d, CAST(sum(pos) AS BIGINT) AS p, count(*) AS n
        FROM src GROUP BY 1),
      c AS (
        SELECT d,
               CAST(sum(p) OVER w AS BIGINT) AS cp,
               CAST(sum(n) OVER w AS BIGINT) AS cn
        FROM h
        WINDOW w AS (ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      tot AS (
        SELECT CAST(sum(p) AS BIGINT) AS tp, CAST(sum(n) AS BIGINT) AS tn
        FROM h),
      sc AS (
        SELECT d, cp, cn, tp, tn,
               CAST(cp * cp + (cn - cp) * (cn - cp) AS DOUBLE)
                 / CAST(cn AS DOUBLE)
               + CAST((tp - cp) * (tp - cp)
                   + (tn - cn - (tp - cp)) * (tn - cn - (tp - cp))
                   AS DOUBLE) / CAST(tn - cn AS DOUBLE) AS s
        FROM c CROSS JOIN tot
        WHERE cn < tn)
      SELECT d AS split_day, cn AS n_left, tn - cn AS n_right,
             cp AS pos_left, tp - cp AS pos_right,
             s / CAST(tn AS DOUBLE) AS purity,
             (s - CAST(tp * tp + (tn - tp) * (tn - tp) AS DOUBLE)
                / CAST(tn AS DOUBLE)) / CAST(tn AS DOUBLE) AS gain
      FROM sc ORDER BY s DESC, d LIMIT 1""")
  )

  /** M44 capability: calibration-reliability table + Brier decomposition
    * — the probability-quality eval that pairs with M42's AUC (AUC ranks,
    * calibration checks the probabilities themselves). The "model" is the
    * rank-percentile predictor p = (rank−½)/n over tie-averaged score
    * ranks, so every prediction is the exact rational pr_num/(2n) and the
    * whole table — decile bins via integer division, per-bin Σp, and the
    * Brier numerator Σ y·(pr−2n)² + (1−y)·pr² — is EXACT INTEGER
    * arithmetic over the score histogram (cells carry row weights; no
    * per-row pass). Three final divisions compose in double from
    * identical operands; Σ brier_part over bins IS the Brier score.
    */
  val m44Calibration = QueryDef(
    "q_m44_calibration",
    (s, dir) => {
      import graft.plans.SequenceOps
      val h = t(s, dir, "events")
        .select(
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        .groupBy("cents")
        .agg(sum(col("pos")).as("p"), count(lit(1)).as("n"))
      val c = SequenceOps.runningSum(h, Nil, Seq("cents"), "n", "cum")
      val tot = h.agg(sum(col("n")).as("nt"))
      val cells = c.crossJoin(broadcast(tot))
        .withColumn("pr_num", lit(2L) * col("cum") - col("n"))
        .withColumn("bin", expr("pr_num * 10 div (2 * nt)"))
        .withColumn("bnum",
          (col("p") * (col("pr_num") - lit(2L) * col("nt"))
            * (col("pr_num") - lit(2L) * col("nt"))
            + (col("n") - col("p")) * col("pr_num") * col("pr_num"))
            .cast("decimal(38,0)"))
      cells.groupBy("bin")
        .agg(sum(col("n")).as("n"), sum(col("p")).as("n_pos"),
          sum((col("n") * col("pr_num")).cast("decimal(38,0)"))
            .as("sum_pr"),
          sum(col("bnum")).as("brier_num"),
          max(col("nt")).as("nt"))
        .select(col("bin"), col("n"), col("n_pos"),
          (col("sum_pr").cast("double")
            / (lit(2.0) * col("nt").cast("double") * col("n").cast("double")))
            .as("mean_pred"),
          (col("n_pos").cast("double") / col("n").cast("double"))
            .as("obs_rate"),
          (col("brier_num").cast("double")
            / (lit(4.0) * col("nt").cast("double") * col("nt").cast("double")
              * col("nt").cast("double"))).as("brier_part"))
        .orderBy("bin")
    },
    Some(s"""
      WITH src AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events),
      h AS (
        SELECT cents, CAST(sum(pos) AS BIGINT) AS p, count(*) AS n
        FROM src GROUP BY 1),
      c AS (
        SELECT p, n,
               CAST(sum(n) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM h),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM h),
      cells AS (
        SELECT p, n, nt, 2 * cum - n AS pr_num
        FROM c CROSS JOIN tot),
      b AS (
        SELECT pr_num * 10 // (2 * nt) AS bin, p, n, nt, pr_num,
               p * (pr_num - 2 * nt) * (pr_num - 2 * nt)
                 + (n - p) * pr_num * pr_num AS bnum
        FROM cells),
      a AS (
        SELECT bin, CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(p) AS BIGINT) AS n_pos,
               CAST(sum(CAST(n * pr_num AS DECIMAL(38,0)))
                 AS DECIMAL(38,0)) AS sum_pr,
               CAST(sum(CAST(bnum AS DECIMAL(38,0)))
                 AS DECIMAL(38,0)) AS brier_num,
               max(nt) AS nt
        FROM b GROUP BY 1)
      SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
             CAST(sum_pr AS DOUBLE)
               / (2e0 * CAST(nt AS DOUBLE) * CAST(n AS DOUBLE))
               AS mean_pred,
             CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS obs_rate,
             CAST(brier_num AS DOUBLE)
               / (4e0 * CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                  * CAST(nt AS DOUBLE)) AS brier_part
      FROM a ORDER BY bin""")
  )

  /** M45 capability: Kruskal–Wallis H — the rank-based one-way test over
    * ALL THREE returnflag groups (the nonparametric complement of M14's
    * ANOVA, extending M7's two-sample machinery to k groups). Same
    * scale shape as M7/M8: one value-histogram groupBy carries per-group
    * counts, one range-partitioned prefix sum yields tie-averaged ranks
    * as 2×-SCALED INTEGERS, and per-group rank sums + the tie term
    * Σ(t³−t) are exact integers. Groups pivot to COLUMNS (conditional
    * aggregation), so H composes from three explicitly-ordered terms —
    * no order-dependent double sum anywhere.
    */
  val m45Kruskal = QueryDef(
    "q_m45_kruskal",
    (s, dir) => {
      import graft.plans.SequenceOps
      val h = t(s, dir, "lineitem")
        .select(
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"),
          col("l_returnflag").as("g"))
        .groupBy("cents")
        .agg(count(lit(1)).as("n"),
          sum(when(col("g") === "A", 1L).otherwise(0L)).as("na"),
          sum(when(col("g") === "N", 1L).otherwise(0L)).as("nn"),
          sum(when(col("g") === "R", 1L).otherwise(0L)).as("nr"))
      val c = SequenceOps.runningSum(h, Nil, Seq("cents"), "n", "cum")
        .withColumn("rank2", lit(2L) * col("cum") - col("n") + lit(1L))
      val a = c.agg(
        sum(col("na")).as("n_a"), sum(col("nn")).as("n_n"),
        sum(col("nr")).as("n_r"),
        sum(col("na") * col("rank2")).as("r2a"),
        sum(col("nn") * col("rank2")).as("r2n"),
        sum(col("nr") * col("rank2")).as("r2r"),
        sum(col("n") * col("n") * col("n") - col("n")).as("sum_t"))
      def term(r2: Column, n: Column): Column = {
        val half = r2.cast("double") / lit(2.0)
        half * half / n.cast("double")
      }
      val nTot = (col("n_a") + col("n_n") + col("n_r"))
      val nD = nTot.cast("double")
      val hStat = lit(12.0) / (nD * (nD + lit(1.0))) *
        ((term(col("r2a"), col("n_a")) + term(col("r2n"), col("n_n"))) +
          term(col("r2r"), col("n_r"))) -
        lit(3.0) * (nD + lit(1.0))
      val tieCorr = lit(1.0) - col("sum_t").cast("double")
        ./((nTot * nTot * nTot - nTot).cast("double"))
      a.select(col("n_a"), col("n_n"), col("n_r"),
        r6(hStat).as("h"), r6(hStat / tieCorr).as("h_tie"))
    },
    Some(s"""
      WITH src AS (
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               l_returnflag AS g
        FROM lineitem),
      h AS (
        SELECT cents, count(*) AS n,
               CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
               CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT)
                 AS nn,
               CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                 AS nr
        FROM src GROUP BY 1),
      c AS (
        SELECT n, na, nn, nr,
               2 * CAST(sum(n) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) - n + 1 AS rank2
        FROM h),
      a AS (
        SELECT CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(nn) AS BIGINT) AS n_n,
               CAST(sum(nr) AS BIGINT) AS n_r,
               CAST(sum(na * rank2) AS BIGINT) AS r2a,
               CAST(sum(nn * rank2) AS BIGINT) AS r2n,
               CAST(sum(nr * rank2) AS BIGINT) AS r2r,
               CAST(sum(n * n * n - n) AS BIGINT) AS sum_t
        FROM c),
      z AS (
        SELECT n_a, n_n, n_r, sum_t, n_a + n_n + n_r AS nt,
               CAST(n_a + n_n + n_r AS DOUBLE) AS nd,
               (CAST(r2a AS DOUBLE) / 2e0) * (CAST(r2a AS DOUBLE) / 2e0)
                 / CAST(n_a AS DOUBLE) AS ta,
               (CAST(r2n AS DOUBLE) / 2e0) * (CAST(r2n AS DOUBLE) / 2e0)
                 / CAST(n_n AS DOUBLE) AS tn,
               (CAST(r2r AS DOUBLE) / 2e0) * (CAST(r2r AS DOUBLE) / 2e0)
                 / CAST(n_r AS DOUBLE) AS tr
        FROM a),
      f AS (
        SELECT n_a, n_n, n_r,
               12e0 / (nd * (nd + 1e0)) * ((ta + tn) + tr)
                 - 3e0 * (nd + 1e0) AS hs,
               1e0 - CAST(sum_t AS DOUBLE)
                 / CAST(nt * nt * nt - nt AS DOUBLE) AS tc
        FROM z)
      SELECT n_a, n_n, n_r, ${sqlR6("hs")} AS h,
             ${sqlR6("hs / tc")} AS h_tie
      FROM f""")
  )

  /** M46 capability: partial correlation r_xy·z — quantity↔price with the
    * discount's influence removed (the multivariate-dependence primitive
    * behind feature-selection and causal screens). All three pairwise
    * correlations come from ONE pass of exact decimal moments (Σx, Σx²,
    * Σxy …), so each r and the closed-form partial compose in double
    * from identical operands; only the published values take r6.
    */
  val m46PartialCorr = QueryDef(
    "q_m46_pcorr",
    (s, dir) => {
      def s18(c: Column) = sum(c.cast("decimal(38,6)")).cast("double")
      val m = t(s, dir, "lineitem")
        .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"),
          col("l_discount").as("z"))
        .agg(count(lit(1)).as("n"),
          s18(col("x")).as("sx"), s18(col("y")).as("sy"),
          s18(col("z")).as("sz"),
          s18(col("x") * col("x")).as("sxx"),
          s18(col("y") * col("y")).as("syy"),
          s18(col("z") * col("z")).as("szz"),
          s18(col("x") * col("y")).as("sxy"),
          s18(col("x") * col("z")).as("sxz"),
          s18(col("y") * col("z")).as("syz"))
      val nD = col("n").cast("double")
      def r(sab: Column, sa: Column, sb: Column,
          saa: Column, sbb: Column): Column =
        (nD * sab - sa * sb)
          ./(sqrt((nD * saa - sa * sa) * (nD * sbb - sb * sb)))
      val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
      val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
      val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
      val pc = (rxy - rxz * ryz)
        ./(sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)))
      m.select(col("n"), r6(rxy).as("r_xy"), r6(rxz).as("r_xz"),
        r6(ryz).as("r_yz"), r6(pc).as("pcorr_xy_z"))
    },
    Some(s"""
      WITH m AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS sy,
               CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sz,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6)))
                 AS DOUBLE) AS sxx,
               CAST(sum(CAST(l_extendedprice * l_extendedprice
                 AS DECIMAL(38,6))) AS DOUBLE) AS syy,
               CAST(sum(CAST(l_discount * l_discount AS DECIMAL(38,6)))
                 AS DOUBLE) AS szz,
               CAST(sum(CAST(l_quantity * l_extendedprice
                 AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(38,6)))
                 AS DOUBLE) AS sxz,
               CAST(sum(CAST(l_extendedprice * l_discount
                 AS DECIMAL(38,6))) AS DOUBLE) AS syz
        FROM lineitem),
      rr AS (
        SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, sz, sxx, syy, szz,
               sxy, sxz, syz
        FROM m),
      c AS (
        SELECT n,
               (nd * sxy - sx * sy)
                 / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS rxy,
               (nd * sxz - sx * sz)
                 / sqrt((nd * sxx - sx * sx) * (nd * szz - sz * sz)) AS rxz,
               (nd * syz - sy * sz)
                 / sqrt((nd * syy - sy * sy) * (nd * szz - sz * sz)) AS ryz
        FROM rr)
      SELECT n, ${sqlR6("rxy")} AS r_xy, ${sqlR6("rxz")} AS r_xz,
             ${sqlR6("ryz")} AS r_yz,
             ${sqlR6("""(rxy - rxz * ryz)
               / sqrt((1e0 - rxz * rxz) * (1e0 - ryz * ryz))""")}
               AS pcorr_xy_z
      FROM c""")
  )

  // The (name, integral-feature SQL) candidates M47 ranks — shared text
  // between the Spark expr() and the oracle CTEs so they cannot drift.
  private val StumpFeatures: Seq[(String, String)] = Seq(
    "order_day" ->
      "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)",
    "price_cents" -> "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)",
    "cust_key" -> "CAST(o_custkey AS BIGINT)")

  // DuckDB spelling of each feature (datediff has no 2-arg DuckDB form).
  private val StumpFeaturesSql: Seq[(String, String)] = Seq(
    "order_day" ->
      "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))",
    "price_cents" -> "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)",
    "cust_key" -> "CAST(o_custkey AS BIGINT)")

  /** M47 capability: feature ranking by split gain — M43's histogram
    * best-split scan applied to EVERY candidate feature, ranked by the
    * impurity decrease of its best threshold (the single-feature
    * importance a tree learner's level-0 evaluation computes; the
    * feature-selection step before training). Each feature runs the
    * same exact-integer machinery (histogram, two prefix sums, pinned
    * double criterion, top-1 argmax); the published ranking orders by
    * gain desc with the feature name as tiebreak.
    */
  val m47FeatureRank = QueryDef(
    "q_m47_feature_rank",
    (s, dir) => {
      import graft.plans.SequenceOps
      import org.apache.spark.sql.expressions.Window
      // ONE tagged pass for all features (r18 optimization: the previous
      // per-feature loop ran 3 separate scans of orders and 6 runningSum
      // stitches — one explode shares the scan, one (feature)-grouped
      // prefix-sum pair replaces six, and the per-feature top-1 becomes a
      // window instead of three orderBy/limit subtrees; per-feature
      // histogram, cumulative counts, and gain arithmetic are the
      // IDENTICAL expressions, so values are unchanged)
      val h = t(s, dir, "orders")
        .select(explode(array(StumpFeatures.map { case (name, fe) =>
            struct(lit(name).as("feature"), expr(fe).as("f"))
          }: _*)).as("x"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
        .select(col("x.feature").as("feature"), col("x.f").as("f"),
          col("pos"))
        .groupBy("feature", "f")
        .agg(sum(col("pos")).as("p"), count(lit(1)).as("n"))
      val c = SequenceOps.runningSum(
        SequenceOps.runningSum(h, Seq("feature"), Seq("f"), "p", "cp"),
        Seq("feature"), Seq("f"), "n", "cn")
      val tot = h.groupBy("feature")
        .agg(sum(col("p")).as("tp"), sum(col("n")).as("tn"))
      val sc = c.join(broadcast(tot), "feature")
        .filter(col("cn") < col("tn"))
        .withColumn("s",
          (col("cp") * col("cp")
            + (col("cn") - col("cp")) * (col("cn") - col("cp")))
            .cast("double") / col("cn").cast("double")
            + ((col("tp") - col("cp")) * (col("tp") - col("cp"))
              + (col("tn") - col("cn") - (col("tp") - col("cp")))
                * (col("tn") - col("cn") - (col("tp") - col("cp"))))
              .cast("double") / (col("tn") - col("cn")).cast("double"))
      val parent = (col("tp") * col("tp")
        + (col("tn") - col("tp")) * (col("tn") - col("tp")))
        .cast("double") / col("tn").cast("double")
      sc.withColumn("__rk", row_number().over(Window
          .partitionBy("feature").orderBy(desc("s"), col("f"))))
        .filter(col("__rk") === 1)
        .select(col("feature"), col("f").as("split_value"),
          col("cn").as("n_left"), (col("tn") - col("cn")).as("n_right"),
          ((col("s") - parent) / col("tn").cast("double")).as("gain"))
        .orderBy(desc("gain"), col("feature"))
    },
    Some {
      val blocks = StumpFeaturesSql.map { case (name, fe) =>
        s"""h_$name AS (
        SELECT $fe AS f,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                 AS BIGINT) AS p,
               count(*) AS n
        FROM orders GROUP BY 1),
      c_$name AS (
        SELECT f,
               CAST(sum(p) OVER w AS BIGINT) AS cp,
               CAST(sum(n) OVER w AS BIGINT) AS cn
        FROM h_$name
        WINDOW w AS (ORDER BY f
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      t_$name AS (
        SELECT CAST(sum(p) AS BIGINT) AS tp, CAST(sum(n) AS BIGINT) AS tn
        FROM h_$name),
      b_$name AS (
        SELECT '$name' AS feature, f AS split_value, cn AS n_left,
               tn - cn AS n_right,
               (CAST(cp * cp + (cn - cp) * (cn - cp) AS DOUBLE)
                  / CAST(cn AS DOUBLE)
                + CAST((tp - cp) * (tp - cp)
                    + (tn - cn - (tp - cp)) * (tn - cn - (tp - cp))
                    AS DOUBLE) / CAST(tn - cn AS DOUBLE)
                - CAST(tp * tp + (tn - tp) * (tn - tp) AS DOUBLE)
                  / CAST(tn AS DOUBLE)) / CAST(tn AS DOUBLE) AS gain
        FROM c_$name CROSS JOIN t_$name
        WHERE cn < tn
        ORDER BY CAST(cp * cp + (cn - cp) * (cn - cp) AS DOUBLE)
                   / CAST(cn AS DOUBLE)
                 + CAST((tp - cp) * (tp - cp)
                     + (tn - cn - (tp - cp)) * (tn - cn - (tp - cp))
                     AS DOUBLE)
                   / CAST(tn - cn AS DOUBLE) DESC, f
        LIMIT 1)"""
      }.mkString(",\n      ")
      s"""
      WITH $blocks
      SELECT * FROM b_order_day
      UNION ALL SELECT * FROM b_price_cents
      UNION ALL SELECT * FROM b_cust_key
      ORDER BY gain DESC, feature"""
    }
  )

  /** Threshold sweep of the full confusion-matrix scorecard — precision,
    * recall, F1, accuracy, and Matthews correlation for a fixed rule
    * (predict "purchase" when value ≥ θ) at three operating points. The
    * four cells are exact integers from one pass; every metric is then a
    * single pinned IEEE chain per row (MCC's denominator multiplies the
    * four marginals as doubles — the integer product would overflow BIGINT
    * at scale — and sqrt is correctly rounded in both engines).
    */
  val m48Prf = QueryDef(
    "q_m48_prf",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      val base = t(s, dir, "events")
        .select(col("value"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      val cm = base
        .crossJoin(broadcast(Seq(50L, 100L, 200L).toDF("thr")))
        .withColumn("pred",
          when(col("value") >= col("thr").cast("double"), 1L).otherwise(0L))
        .groupBy("thr")
        .agg(
          sum(when(col("pred") === 1L && col("y") === 1L, 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("pred") === 1L && col("y") === 0L, 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("pred") === 0L && col("y") === 1L, 1L).otherwise(0L))
            .as("fn"),
          sum(when(col("pred") === 0L && col("y") === 0L, 1L).otherwise(0L))
            .as("tn"))
      cm.select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0L,
          r6(col("tp").cast("double")
            / (col("tp") + col("fp")).cast("double"))).as("precision"),
        when(col("tp") + col("fn") > 0L,
          r6(col("tp").cast("double")
            / (col("tp") + col("fn")).cast("double"))).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          r6(lit(2.0) * col("tp").cast("double")
            / (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double")))
          .as("f1"),
        r6((col("tp") + col("tn")).cast("double")
          / (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"))
          .as("accuracy"),
        r6((col("tp") * col("tn") - col("fp") * col("fn")).cast("double")
          / sqrt((col("tp") + col("fp")).cast("double")
            * (col("tp") + col("fn")).cast("double")
            * (col("tn") + col("fp")).cast("double")
            * (col("tn") + col("fn")).cast("double"))).as("mcc"))
        .orderBy("thr")
    },
    Some(s"""
      WITH base AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events),
      cm AS (
        SELECT thr,
               CAST(sum(CASE WHEN value >= CAST(thr AS DOUBLE) AND y = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN value >= CAST(thr AS DOUBLE) AND y = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN value < CAST(thr AS DOUBLE) AND y = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN value < CAST(thr AS DOUBLE) AND y = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM base CROSS JOIN (VALUES (CAST(50 AS BIGINT)), (100), (200))
          t(thr)
        GROUP BY 1)
      SELECT thr, tp, fp, fn, tn,
             CASE WHEN tp + fp > 0 THEN
               ${sqlR6("CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)")}
             END AS precision,
             CASE WHEN tp + fn > 0 THEN
               ${sqlR6("CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)")}
             END AS recall,
             CASE WHEN 2 * tp + fp + fn > 0 THEN
               ${sqlR6("""2e0 * CAST(tp AS DOUBLE)
                 / CAST(2 * tp + fp + fn AS DOUBLE)""")}
             END AS f1,
             ${sqlR6("""CAST(tp + tn AS DOUBLE)
               / CAST(tp + fp + fn + tn AS DOUBLE)""")} AS accuracy,
             ${sqlR6("""CAST(tp * tn - fp * fn AS DOUBLE)
               / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                 * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))""")}
               AS mcc
      FROM cm ORDER BY thr""")
  )

  /** Mood's median test — the nonparametric ANOVA alternative that only
    * needs counts: is each flag's share of values above the POOLED median
    * what the margins predict? The pooled median is an exact type-1
    * order-statistic selection over the global cents histogram (the
    * boxplot/medianMad idiom: runningSum prefix + Σ v·indicator at rank
    * ⌈(N+1)/2⌉, broadcast as one row); per-group above/below cells are
    * exact integers, and each χ² contribution is one pinned double chain
    * from those integers. Scale shape: two histogram aggregations + two
    * broadcast one-row joins — no global sort.
    */
  val m49Mood = QueryDef(
    "q_m49_mood",
    (s, dir) => {
      import graft.plans.SequenceOps
      val src = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
      val h = src.groupBy("cents").agg(count(lit(1)).as("n"))
      val cum = SequenceOps.runningSum(h, Nil, Seq("cents"), "n", "cum")
      val tot = h.agg(sum(col("n")).as("nt"))
      val med = cum.crossJoin(broadcast(tot))
        .withColumn("rm", expr("(nt + 1) div 2"))
        .agg(sum(col("cents")
          * when(col("cum") - col("n") < col("rm") && col("rm") <= col("cum"),
            1L).otherwise(0L)).as("med"))
      val g = src.crossJoin(broadcast(med))
        .groupBy("flag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("cents") > col("med"), 1L).otherwise(0L))
            .as("n_above"))
      val m = g.agg(sum(col("n")).as("nt"), sum(col("n_above")).as("a"))
      val ea = col("n").cast("double") * col("a").cast("double") /
        col("nt").cast("double")
      val el = col("n").cast("double") *
        (col("nt") - col("a")).cast("double") / col("nt").cast("double")
      val da = col("n_above").cast("double") - ea
      val dl = (col("n") - col("n_above")).cast("double") - el
      g.crossJoin(broadcast(m))
        .select(col("flag"), col("n"), col("n_above"),
          (col("n") - col("n_above")).as("n_le"),
          r6(ea).as("exp_above"),
          r6(da * da / ea + dl * dl / el).as("chi2_part"))
        .orderBy("flag")
    },
    Some(s"""
      WITH src AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem),
      h AS (SELECT cents, count(*) AS n FROM src GROUP BY 1),
      c AS (
        SELECT cents, n,
               CAST(sum(n) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM h),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM h),
      med AS (
        SELECT CAST(sum(cents * CASE WHEN cum - n < (nt + 1) // 2
                 AND (nt + 1) // 2 <= cum THEN 1 ELSE 0 END) AS BIGINT)
               AS med
        FROM c CROSS JOIN tot),
      g AS (
        SELECT flag, count(*) AS n,
               CAST(sum(CASE WHEN cents > med THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_above
        FROM src CROSS JOIN med GROUP BY 1),
      m AS (
        SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(n_above) AS BIGINT)
               AS a
        FROM g)
      SELECT flag, n, n_above, n - n_above AS n_le,
             ${sqlR6("""CAST(n AS DOUBLE) * CAST(a AS DOUBLE)
               / CAST(nt AS DOUBLE)""")} AS exp_above,
             ${sqlR6("""(CAST(n_above AS DOUBLE) - CAST(n AS DOUBLE)
                 * CAST(a AS DOUBLE) / CAST(nt AS DOUBLE))
               * (CAST(n_above AS DOUBLE) - CAST(n AS DOUBLE)
                 * CAST(a AS DOUBLE) / CAST(nt AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(a AS DOUBLE)
                 / CAST(nt AS DOUBLE))
               + (CAST(n - n_above AS DOUBLE) - CAST(n AS DOUBLE)
                 * CAST(nt - a AS DOUBLE) / CAST(nt AS DOUBLE))
               * (CAST(n - n_above AS DOUBLE) - CAST(n AS DOUBLE)
                 * CAST(nt - a AS DOUBLE) / CAST(nt AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(nt - a AS DOUBLE)
                 / CAST(nt AS DOUBLE))""")} AS chi2_part
      FROM g CROSS JOIN m ORDER BY flag""")
  )

  /** Brown–Forsythe homogeneity-of-variance test (the robust Levene
    * variant): one-way ANOVA on |x − group MEDIAN|. Medians are exact
    * type-1 order statistics per flag (grouped runningSum + Σ v·indicator
    * selection); deviations are then INTEGERS, so the group sums Σd and
    * Σd² are exact (Σd² accumulated as DECIMAL(38,0) — a long would
    * overflow around 10⁹ rows; the scale-0 decimal→double cast is one
    * correctly-rounded conversion in both engines). The three groups are
    * pivoted to COLUMNS so the final F chain is a fixed-order IEEE
    * sequence — no order-dependent double sum over rows anywhere.
    */
  val m50Levene = QueryDef(
    "q_m50_levene",
    (s, dir) => {
      import graft.plans.SequenceOps
      val src = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
      val h = src.groupBy("flag", "cents").agg(count(lit(1)).as("n"))
      val cum = SequenceOps.runningSum(h, Seq("flag"), Seq("cents"),
        "n", "cum")
      val tot = h.groupBy("flag").agg(sum(col("n")).as("nt"))
      val med = cum.join(broadcast(tot), Seq("flag"))
        .withColumn("rm", expr("(nt + 1) div 2"))
        .groupBy("flag")
        .agg(sum(col("cents")
          * when(col("cum") - col("n") < col("rm") && col("rm") <= col("cum"),
            1L).otherwise(0L)).as("med"))
      val g = src.join(broadcast(med), Seq("flag"))
        .select(col("flag"), abs(col("cents") - col("med")).as("dev"),
          col("med"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n"), sum(col("dev")).as("s1"),
          sum((col("dev") * col("dev")).cast("decimal(38,0)")).as("s2"),
          max(col("med")).as("med"))
      def pick(f: String, c: String) =
        max(when(col("flag") === f, col(c))).as(s"${c}_${f.toLowerCase}")
      val p = g.agg(pick("A", "n"), pick("A", "s1"), pick("A", "s2"),
        pick("A", "med"), pick("N", "n"), pick("N", "s1"), pick("N", "s2"),
        pick("N", "med"), pick("R", "n"), pick("R", "s1"), pick("R", "s2"),
        pick("R", "med"))
      def d(c: String) = col(c).cast("double")
      def b(f: String) = d(s"s1_$f") * d(s"s1_$f") / d(s"n_$f")
      val nTot = (col("n_a") + col("n_n") + col("n_r")).cast("double")
      val grand = (col("s1_a") + col("s1_n") + col("s1_r")).cast("double")
      val ssb = b("a") + b("n") + b("r") - grand * grand / nTot
      val ssw = (d("s2_a") - b("a")) + (d("s2_n") - b("n")) +
        (d("s2_r") - b("r"))
      p.select((col("n_a") + col("n_n") + col("n_r")).as("n"),
        col("med_a"), col("med_n"), col("med_r"),
        ssb.as("ssb"), ssw.as("ssw"),
        r6((ssb / lit(2.0)) / (ssw / (nTot - lit(3.0)))).as("f_stat"))
    },
    Some(s"""
      WITH src AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem),
      h AS (SELECT flag, cents, count(*) AS n FROM src GROUP BY 1, 2),
      c AS (
        SELECT flag, cents, n,
               CAST(sum(n) OVER (PARTITION BY flag ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM h),
      tot AS (
        SELECT flag, CAST(sum(n) AS BIGINT) AS nt FROM h GROUP BY 1),
      med AS (
        SELECT c.flag,
               CAST(sum(cents * CASE WHEN cum - n < (nt + 1) // 2
                 AND (nt + 1) // 2 <= cum THEN 1 ELSE 0 END) AS BIGINT)
                 AS med
        FROM c JOIN tot ON tot.flag = c.flag GROUP BY 1),
      g AS (
        SELECT src.flag, count(*) AS n,
               CAST(sum(abs(cents - med)) AS BIGINT) AS s1,
               sum(CAST(abs(cents - med) * abs(cents - med)
                 AS DECIMAL(38,0))) AS s2,
               max(med) AS med
        FROM src JOIN med ON med.flag = src.flag GROUP BY 1),
      p AS (
        SELECT max(CASE WHEN flag = 'A' THEN n END) AS n_a,
               max(CASE WHEN flag = 'A' THEN s1 END) AS s1_a,
               max(CASE WHEN flag = 'A' THEN s2 END) AS s2_a,
               max(CASE WHEN flag = 'A' THEN med END) AS med_a,
               max(CASE WHEN flag = 'N' THEN n END) AS n_n,
               max(CASE WHEN flag = 'N' THEN s1 END) AS s1_n,
               max(CASE WHEN flag = 'N' THEN s2 END) AS s2_n,
               max(CASE WHEN flag = 'N' THEN med END) AS med_n,
               max(CASE WHEN flag = 'R' THEN n END) AS n_r,
               max(CASE WHEN flag = 'R' THEN s1 END) AS s1_r,
               max(CASE WHEN flag = 'R' THEN s2 END) AS s2_r,
               max(CASE WHEN flag = 'R' THEN med END) AS med_r
        FROM g),
      e AS (
        SELECT n_a + n_n + n_r AS n, med_a, med_n, med_r,
               CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE)
                 / CAST(n_a AS DOUBLE) AS b_a,
               CAST(s1_n AS DOUBLE) * CAST(s1_n AS DOUBLE)
                 / CAST(n_n AS DOUBLE) AS b_n,
               CAST(s1_r AS DOUBLE) * CAST(s1_r AS DOUBLE)
                 / CAST(n_r AS DOUBLE) AS b_r,
               CAST(s1_a + s1_n + s1_r AS DOUBLE) AS grand,
               CAST(n_a + n_n + n_r AS DOUBLE) AS ntd,
               CAST(s2_a AS DOUBLE) AS s2a, CAST(s2_n AS DOUBLE) AS s2n,
               CAST(s2_r AS DOUBLE) AS s2r
        FROM p),
      f AS (
        SELECT n, med_a, med_n, med_r,
               b_a + b_n + b_r - grand * grand / ntd AS ssb,
               (s2a - b_a) + (s2n - b_n) + (s2r - b_r) AS ssw,
               ntd
        FROM e)
      SELECT n, med_a, med_n, med_r, ssb, ssw,
             ${sqlR6("(ssb / 2e0) / (ssw / (ntd - 3e0))")} AS f_stat
      FROM f""")
  )

  /** Two-sample log-rank test (Mantel–Cox) on time-to-ship with
    * administrative censoring at day 365: arm 1 = returned lines. The
    * survival counting process collapses to a ≤366-row (time × arm)
    * histogram after one aggregation — at-risk counts come from a tiny
    * broadcast theta-join (obs with t' < t) rather than a per-row scan, so
    * the heavy table is touched exactly once at any scale. Every per-time
    * hypergeometric term (E₁ₜ = dₜ·n₁ₜ/nₜ and its variance) is a pinned
    * double from exact integers; the Σ over times accumulates in
    * DECIMAL(38,18) and converts back via the split decD cast (scaled
    * integer > 2⁵³). χ² = (O₁−E₁)²/V is the final pinned chain.
    */
  val m51Logrank = QueryDef(
    "q_m51_logrank",
    (s, dir) => {
      val obs = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("arm"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("traw"))
        .where(col("traw") >= 0L)
        .select(col("arm"), least(col("traw"), lit(365L)).as("tobs"),
          when(col("traw") <= 365L, 1L).otherwise(0L).as("event"))
      val h = obs.groupBy("arm", "tobs")
        .agg(count(lit(1)).as("n"), sum(col("event")).as("d"))
        .localCheckpoint(false)
      val totals = h.groupBy("arm").agg(sum(col("n")).as("n_arm"))
      val times = h.where(col("d") > 0L).select(col("tobs").as("t"))
        .distinct()
      // at-risk in `arm` at t = n_arm − #obs with tobs < t (tiny theta join)
      val before = times.crossJoin(broadcast(totals))
        .join(broadcast(h.select(col("arm").as("ha"), col("tobs"),
          col("n").as("hn"))),
          col("ha") === col("arm") && col("tobs") < col("t"), "left")
        .groupBy("t", "arm", "n_arm")
        .agg(coalesce(sum(col("hn")), lit(0L)).as("gone"))
        .select(col("t"), col("arm"), (col("n_arm") - col("gone")).as("nr"))
      val deaths = h.select(col("arm"), col("tobs").as("t"), col("d"))
      val cells = before.join(broadcast(deaths), Seq("t", "arm"), "left")
        .na.fill(0L, Seq("d"))
      val row = cells.groupBy("t")
        .agg(sum(when(col("arm") === 1L, col("nr")).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0L, col("nr")).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1L, col("d")).otherwise(0L)).as("d1"),
          sum(when(col("arm") === 0L, col("d")).otherwise(0L)).as("d0"))
        .withColumn("nt", col("n1") + col("n0"))
        .withColumn("dt", col("d1") + col("d0"))
        .where(col("dt") > 0L && col("nt") > 1L)
      val n1d = col("n1").cast("double")
      val ntd = col("nt").cast("double")
      val dtd = col("dt").cast("double")
      val agg = row.agg(
        count(lit(1)).as("n_times"),
        sum(col("d1")).as("o1"),
        sum((dtd * n1d / ntd).cast("decimal(38,18)")).as("e1dec"),
        sum((dtd * (n1d / ntd) * (lit(1.0) - n1d / ntd)
          * ((ntd - dtd) / (ntd - lit(1.0)))).cast("decimal(38,18)"))
          .as("vdec"))
      agg.select(col("n_times"), col("o1"),
        r6(decD(col("e1dec"))).as("e1"),
        r6(decD(col("vdec"))).as("v"),
        r6((col("o1").cast("double") - decD(col("e1dec")))
          * (col("o1").cast("double") - decD(col("e1dec")))
          / decD(col("vdec"))).as("chi2"))
    },
    Some(s"""
      WITH obs AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS arm,
               least(date_diff('day', o_orderdate, l_shipdate), 365)
                 AS tobs,
               CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 365
                 THEN 1 ELSE 0 END AS event
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE date_diff('day', o_orderdate, l_shipdate) >= 0),
      h AS (
        SELECT arm, tobs, count(*) AS n, CAST(sum(event) AS BIGINT) AS d
        FROM obs GROUP BY 1, 2),
      totals AS (
        SELECT arm, CAST(sum(n) AS BIGINT) AS n_arm FROM h GROUP BY 1),
      times AS (SELECT DISTINCT tobs AS t FROM h WHERE d > 0),
      brisk AS (
        SELECT t, totals.arm, n_arm,
               n_arm - COALESCE(CAST(sum(CASE WHEN h.tobs < t THEN h.n END)
                 AS BIGINT), 0) AS nr
        FROM times CROSS JOIN totals
          LEFT JOIN h ON h.arm = totals.arm AND h.tobs < t
        GROUP BY 1, 2, 3),
      cells AS (
        SELECT b.t, b.arm, b.nr, COALESCE(h.d, 0) AS d
        FROM brisk b LEFT JOIN h ON h.arm = b.arm AND h.tobs = b.t),
      r AS (
        SELECT t,
               CAST(sum(CASE WHEN arm = 1 THEN nr ELSE 0 END) AS BIGINT)
                 AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN nr ELSE 0 END) AS BIGINT)
                 AS n0,
               CAST(sum(CASE WHEN arm = 1 THEN d ELSE 0 END) AS BIGINT)
                 AS d1,
               CAST(sum(CASE WHEN arm = 0 THEN d ELSE 0 END) AS BIGINT)
                 AS d0
        FROM cells GROUP BY 1),
      rr AS (
        SELECT t, n1, d1, n1 + n0 AS nt, d1 + d0 AS dt FROM r
        WHERE d1 + d0 > 0 AND n1 + n0 > 1),
      a AS (
        SELECT count(*) AS n_times, CAST(sum(d1) AS BIGINT) AS o1,
               sum(CAST(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
                 / CAST(nt AS DOUBLE) AS DECIMAL(38,18))) AS e1dec,
               sum(CAST(CAST(dt AS DOUBLE)
                 * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
                 * (1e0 - CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
                 * ((CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
                   / (CAST(nt AS DOUBLE) - 1e0)) AS DECIMAL(38,18)))
                 AS vdec
        FROM rr)
      SELECT n_times, o1,
             ${sqlR6(sqlDecD("e1dec"))} AS e1,
             ${sqlR6(sqlDecD("vdec"))} AS v,
             ${sqlR6(s"""(CAST(o1 AS DOUBLE) - ${sqlDecD("e1dec")})
               * (CAST(o1 AS DOUBLE) - ${sqlDecD("e1dec")})
               / ${sqlDecD("vdec")}""")} AS chi2
      FROM a""")
  )

  /** Somers' D — the ASYMMETRIC rank association (Somers 1962): the
    * q_m15_kendall pair machinery re-read with a dependent variable, as
    * used for ordinal regression diagnostics and credit-scoring
    * concordance (D(Y|X) is the Gini/AUC analogue for ordered pairs).
    * Identical exact pair counts; the two directed coefficients divide by
    * the pairs UNTIED on the conditioning variable only.
    */
  val m52SomersD = QueryDef(
    "q_m52_somersd",
    (s, dir) => {
      val m = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("g"),
          date_trunc("month", col("l_shipdate")).cast("timestamp_ntz")
            .as("mth"))
        .agg(avgE(col("l_quantity")).as("x"),
          avgE(col("l_extendedprice")).as("y"))
      val a = m.select(col("g"), col("mth").as("m1"), col("x").as("x1"),
        col("y").as("y1"))
      val b = m.select(col("g").as("g2"), col("mth").as("m2"),
        col("x").as("x2"), col("y").as("y2"))
      val pairs = a.join(b, col("g") === col("g2") && col("m1") < col("m2"))
      val c = sum(when((col("x1") < col("x2") && col("y1") < col("y2")) ||
        (col("x1") > col("x2") && col("y1") > col("y2")), 1L)
        .otherwise(0L))
      val d = sum(when((col("x1") < col("x2") && col("y1") > col("y2")) ||
        (col("x1") > col("x2") && col("y1") < col("y2")), 1L)
        .otherwise(0L))
      val tx = sum(when(col("x1") === col("x2") && col("y1") =!= col("y2"),
        1L).otherwise(0L))
      val ty = sum(when(col("y1") === col("y2") && col("x1") =!= col("x2"),
        1L).otherwise(0L))
      pairs.groupBy("g")
        .agg(c.as("conc"), d.as("disc"), tx.as("ties_x"), ty.as("ties_y"))
        .select(col("g"), col("conc"), col("disc"), col("ties_x"),
          col("ties_y"),
          r6((col("conc") - col("disc")).cast("double")
            / (col("conc") + col("disc") + col("ties_y")).cast("double"))
            .as("d_yx"),
          r6((col("conc") - col("disc")).cast("double")
            / (col("conc") + col("disc") + col("ties_x")).cast("double"))
            .as("d_xy"))
        .orderBy("g")
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag AS g,
               date_trunc('month', l_shipdate) AS mth,
               ${sqlAvgE("l_quantity")} AS x,
               ${sqlAvgE("l_extendedprice")} AS y
        FROM lineitem GROUP BY 1, 2),
      p AS (
        SELECT a.g,
          CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                          OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END)
            AS BIGINT) AS conc,
          CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                          OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END)
            AS BIGINT) AS disc,
          CAST(sum(CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END)
            AS BIGINT) AS ties_x,
          CAST(sum(CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END)
            AS BIGINT) AS ties_y
        FROM m a JOIN m b ON a.g = b.g AND a.mth < b.mth
        GROUP BY a.g)
      SELECT g, conc, disc, ties_x, ties_y,
             ${sqlR6("""CAST(conc - disc AS DOUBLE)
               / CAST(conc + disc + ties_y AS DOUBLE)""")} AS d_yx,
             ${sqlR6("""CAST(conc - disc AS DOUBLE)
               / CAST(conc + disc + ties_x AS DOUBLE)""")} AS d_xy
      FROM p ORDER BY g""")
  )

  /** Regression stump (variance-reduction split) — the CART/GBM base
    * learner beside q_m43's classification twin: best threshold on
    * quantity predicting price, scored by the SSE decomposition
    * Σ_L²/n_L + Σ_R²/n_R (equivalent to variance reduction, but computed
    * from EXACT integer sums so no residual ever materializes). The
    * candidate scan is a prefix sum over the ≤50-level quantity histogram;
    * scores are pinned doubles compared exactly, ties broken by
    * threshold. gain is left unrounded — it is one pinned chain from
    * integers (magnitude too large for the r-helpers' long floor).
    */
  val m53RegStump = QueryDef(
    "q_m53_regstump",
    (s, dir) => {
      import graft.plans.SequenceOps
      val h = t(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("q"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
        .groupBy("q")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sv"))
      val c = SequenceOps.runningSum(
        SequenceOps.runningSum(h, Nil, Seq("q"), "n", "cn"),
        Nil, Seq("q"), "sv", "cs")
      val tot = h.agg(sum(col("n")).as("tn"), sum(col("sv")).as("ts"))
      val csd = col("cs").cast("double")
      val cnd = col("cn").cast("double")
      val tsd = col("ts").cast("double")
      val tnd = col("tn").cast("double")
      val rsd = (col("ts") - col("cs")).cast("double")
      val rnd = (col("tn") - col("cn")).cast("double")
      val sc = c.crossJoin(broadcast(tot))
        .filter(col("cn") < col("tn"))
        .withColumn("s", csd * csd / cnd + rsd * rsd / rnd)
      sc.orderBy(desc("s"), col("q")).limit(1)
        .select(col("q").as("split_qty"),
          col("cn").as("n_left"), (col("tn") - col("cn")).as("n_right"),
          col("cs").as("sum_left"), (col("ts") - col("cs")).as("sum_right"),
          ((col("s") - tsd * tsd / tnd) / tnd).as("gain"))
    },
    Some(s"""
      WITH src AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem),
      h AS (
        SELECT q, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sv
        FROM src GROUP BY 1),
      c AS (
        SELECT q,
               CAST(sum(n) OVER w AS BIGINT) AS cn,
               CAST(sum(sv) OVER w AS BIGINT) AS cs
        FROM h
        WINDOW w AS (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(sv) AS BIGINT) AS ts
        FROM h),
      sc AS (
        SELECT q, cn, cs, tn, ts,
               CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE)
                 + CAST(ts - cs AS DOUBLE) * CAST(ts - cs AS DOUBLE)
                   / CAST(tn - cn AS DOUBLE) AS s
        FROM c CROSS JOIN tot WHERE cn < tn)
      SELECT q AS split_qty, cn AS n_left, tn - cn AS n_right,
             cs AS sum_left, ts - cs AS sum_right,
             (s - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)
               / CAST(tn AS DOUBLE)) / CAST(tn AS DOUBLE) AS gain
      FROM sc ORDER BY s DESC, q LIMIT 1""")
  )

  /** Two-sample Poisson rate comparison (conditional/C-test): are errors
    * and purchases arriving at the same rate? Under H₀ the error count is
    * Binomial(k₁+k₂, ½), so z = (2k₁−n)/√n needs only two exact integers;
    * the per-day dispersion index (variance/mean of daily error counts)
    * audits the Poisson assumption itself — overdispersion means the z
    * test is anticonservative. All counts exact; three pinned chains.
    */
  val m54Poisson = QueryDef(
    "q_m54_poisson",
    (s, dir) => {
      val e = t(s, dir, "events")
        .where(col("event_type").isin("error", "purchase"))
        .select(date_trunc("day", timestamp_micros(col("ts"))).as("day"),
          when(col("event_type") === "error", 1L).otherwise(0L).as("is_err"))
      val daily = e.groupBy("day")
        .agg(sum(col("is_err")).as("k_err"),
          sum(lit(1L) - col("is_err")).as("k_pur"))
      val a = daily.agg(count(lit(1)).as("n_days"),
        sum(col("k_err")).as("k1"), sum(col("k_pur")).as("k2"),
        sum(col("k_err") * col("k_err")).as("s2"))
      val k1d = col("k1").cast("double")
      val k2d = col("k2").cast("double")
      val nd = (col("k1") + col("k2")).cast("double")
      val ndays = col("n_days").cast("double")
      val mean = k1d / ndays
      val variance = col("s2").cast("double") / ndays - mean * mean
      a.select(col("n_days"), col("k1").as("n_errors"),
        col("k2").as("n_purchases"),
        r6(k1d / k2d).as("rate_ratio"),
        r6((lit(2.0) * k1d - nd) / sqrt(nd)).as("z"),
        r6(variance / mean).as("dispersion"))
    },
    Some(s"""
      WITH e AS (
        SELECT date_trunc('day', ts) AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        FROM events WHERE event_type IN ('error', 'purchase')),
      daily AS (
        SELECT day, CAST(sum(is_err) AS BIGINT) AS k_err,
               CAST(sum(1 - is_err) AS BIGINT) AS k_pur
        FROM e GROUP BY 1),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(k_err) AS BIGINT) AS k1,
               CAST(sum(k_pur) AS BIGINT) AS k2,
               CAST(sum(k_err * k_err) AS BIGINT) AS s2
        FROM daily)
      SELECT n_days, k1 AS n_errors, k2 AS n_purchases,
             ${sqlR6("CAST(k1 AS DOUBLE) / CAST(k2 AS DOUBLE)")}
               AS rate_ratio,
             ${sqlR6("""(2e0 * CAST(k1 AS DOUBLE) - CAST(k1 + k2 AS DOUBLE))
               / sqrt(CAST(k1 + k2 AS DOUBLE))""")} AS z,
             ${sqlR6("""(CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE)
                 - (CAST(k1 AS DOUBLE) / CAST(n_days AS DOUBLE))
                   * (CAST(k1 AS DOUBLE) / CAST(n_days AS DOUBLE)))
               / (CAST(k1 AS DOUBLE) / CAST(n_days AS DOUBLE))""")}
               AS dispersion
      FROM a""")
  )

  /** Composed ML train/serve pipeline — the last mile a feature table
    * feeds: per-flag daily series → lag-1 feature assembly → DETERMINISTIC
    * content-addressed 80/20 split (portable md5-60 of flag#day, the
    * q_t_split mechanism — membership survives re-runs and engine
    * migration, unlike rand()) → OLS y~lag1 fit on train via EXACT
    * integer moments → held-out MSE/R² on test. Every float-sensitive
    * spot is quantized to integer units FIRST (milli-units of y/x,
    * micro-units of residuals and deviations — identical doubles →
    * identical BIGINTs in both engines), so all moments, the normal
    * equations' numerators/denominators, and both score sums are exact
    * integer/decimal arithmetic with one correctly-rounded cast at the
    * end — bit-exact with no tolerance anywhere. One row: the audit a
    * model registry stores per training run.
    */
  /** Feature frame for the ML gate — exposed separately so
    * PipelineE2eSpec can pick a split threshold that leaves exactly ONE
    * training row (the degenerate-fit property test: a single point has
    * zero x-variance, the normal equations divide by zero, and the
    * pipeline must still produce its one audit row instead of erroring).
    */
  private[graft] def mlE2eFeat(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import graft.text.TextAnalysis
    val daily = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        date_trunc("day", col("l_shipdate")).as("day"),
        col("l_extendedprice"))
      .groupBy("flag", "day")
      .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
        .cast("double") / count(lit(1))).as("y"))
    val w = Window.partitionBy("flag").orderBy("day")
    daily
      .withColumn("lag1", lag(col("y"), 1).over(w))
      .filter(col("lag1").isNotNull)
      .withColumn("u", TextAnalysis.contentUniform(
        concat_ws("#", col("flag"), col("day").cast("date").cast("string"))))
      .withColumn("xm", floor(col("lag1") * 1000 + lit(0.5)).cast("long"))
      .withColumn("ym", floor(col("y") * 1000 + lit(0.5)).cast("long"))
      .localCheckpoint(true)
  }

  /** Train/score tail of the ML gate over a prebuilt feature frame. */
  private[graft] def mlE2eFit(feat: org.apache.spark.sql.DataFrame,
      trainFrac: Double): org.apache.spark.sql.DataFrame = {
      val dec0 = "decimal(38,0)"
      val train = feat.filter(col("u") < trainFrac)
      val test = feat.filter(col("u") >= trainFrac)
      val mom = broadcast(train.agg(
        count(lit(1)).as("n"),
        sum(col("xm")).as("sx"), sum(col("ym")).as("sy"),
        sum(col("xm").cast(dec0) * col("ym")).as("sxy"),
        sum(col("xm").cast(dec0) * col("xm")).as("sxx"))
        .select(col("n"), col("sx"), col("sy"),
          // slope is unit-free (both axes scaled 1e3); numerator and
          // denominator are exact DECIMAL(38,0) integers, their double
          // casts correctly rounded in both engines (scale-0 casts have
          // no fractional-scale double-rounding), the division identical
          ((col("n").cast(dec0) * col("sxy")
            - col("sx").cast(dec0) * col("sy")).cast("double")
            / (col("n").cast(dec0) * col("sxx")
              - col("sx").cast(dec0) * col("sx")).cast("double")).as("b")))
      // intercept in milli-y: one double chain on identical operands
      val fit = broadcast(mom.select(col("n"), col("b"),
        ((col("sy").cast("double") - col("b") * col("sx").cast("double"))
          / col("n").cast("double")).as("am")))
      // held-out residuals, quantized to micro-y before squaring
      val scored = test.crossJoin(fit)
        .withColumn("rq",
          floor((col("ym").cast("double") - (col("am") + col("b")
            * col("xm").cast("double"))) * 1000 + lit(0.5)).cast("long"))
      val tmean = broadcast(test.agg(count(lit(1)).as("nt"),
        sum(col("ym")).as("syt")))
      val dev = test.crossJoin(tmean)
        .withColumn("dq",
          floor((col("ym").cast("double") - col("syt").cast("double")
            / col("nt").cast("double")) * 1000 + lit(0.5)).cast("long"))
      val sums = broadcast(scored
        .agg(sum(col("rq").cast(dec0) * col("rq")).as("sr2")))
      val dsum = broadcast(dev
        .agg(sum(col("dq").cast(dec0) * col("dq")).as("sd2")))
      fit.crossJoin(tmean).crossJoin(sums).crossJoin(dsum)
        .select(col("n").as("n_train"), col("nt").as("n_test"),
          r6(col("b")).as("slope"),
          r2(col("am") / lit(1000.0)).as("intercept"),
          // mse in y² units: rq is y·1e6 ⇒ rq²/1e12, averaged over test
          r2(col("sr2").cast("double")
            / (col("nt").cast("double") * lit(1e12))).as("mse"),
          r6(lit(1.0) - col("sr2").cast("double")
            / col("sd2").cast("double")).as("r2_score"))
  }

  val m53MlE2e = QueryDef(
    "q_pipeline_ml_e2e",
    (s, dir) => mlE2eFit(mlE2eFeat(s, dir), trainFrac = 0.8),
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      feat AS MATERIALIZED (
        SELECT flag, day, y, lag1,
               (CAST(('0x' || substr(md5(flag || '#' ||
                  CAST(CAST(day AS DATE) AS VARCHAR)), 1, 15)) AS BIGINT)
                 + 1.0) / 1152921504606846976.0 AS u,
               CAST(floor(lag1 * 1000 + 0.5) AS BIGINT) AS xm,
               CAST(floor(y * 1000 + 0.5) AS BIGINT) AS ym
        FROM (SELECT flag, day, y,
                     lag(y, 1) OVER (PARTITION BY flag ORDER BY day) AS lag1
              FROM daily)
        WHERE lag1 IS NOT NULL),
      mom AS (
        SELECT count(*) AS n,
               CAST(sum(xm) AS BIGINT) AS sx, CAST(sum(ym) AS BIGINT) AS sy,
               CAST(sum(CAST(xm AS DECIMAL(38,0)) * ym) AS DECIMAL(38,0))
                 AS sxy,
               CAST(sum(CAST(xm AS DECIMAL(38,0)) * xm) AS DECIMAL(38,0))
                 AS sxx
        FROM feat WHERE u < 0.8),
      fit AS (
        SELECT n, CAST(CAST(n AS DECIMAL(38,0)) * sxy
                 - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
               / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                 - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS b,
               sx, sy
        FROM mom),
      fit2 AS (
        SELECT n, b,
               (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) AS am
        FROM fit),
      tst AS MATERIALIZED (SELECT * FROM feat WHERE u >= 0.8),
      tmean AS (SELECT count(*) AS nt, CAST(sum(ym) AS BIGINT) AS syt
                FROM tst),
      scored AS (
        SELECT CAST(floor((CAST(ym AS DOUBLE) - (f.am + f.b
                 * CAST(xm AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS rq
        FROM tst, fit2 f),
      devs AS (
        SELECT CAST(floor((CAST(ym AS DOUBLE) - CAST(syt AS DOUBLE)
                 / CAST(nt AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS dq
        FROM tst, tmean),
      sr AS (SELECT CAST(sum(CAST(rq AS DECIMAL(38,0)) * rq)
               AS DECIMAL(38,0)) AS sr2 FROM scored),
      sd AS (SELECT CAST(sum(CAST(dq AS DECIMAL(38,0)) * dq)
               AS DECIMAL(38,0)) AS sd2 FROM devs)
      SELECT CAST(n AS BIGINT) AS n_train, CAST(nt AS BIGINT) AS n_test,
             ${sqlR6("b")} AS slope,
             ${sqlR2("am / 1000e0")} AS intercept,
             ${sqlR2("CAST(sr2 AS DOUBLE) / (CAST(nt AS DOUBLE) * 1e12)")}
               AS mse,
             ${sqlR6("1e0 - CAST(sr2 AS DOUBLE) / CAST(sd2 AS DOUBLE)")}
               AS r2_score
      FROM fit2, tmean, sr, sd""")
  )

  val all: Seq[QueryDef] = Seq(m1Ols, m2OlsNextDay, m4Anomalies, m5Ridge,
    m6Cv, m7Mwu, m8Ks, m9Nbayes, m10LogregStep, m11Welch, m12Spearman,
    m13Robust, m14Anova, m15Kendall, m16Cusum, m17TheilSen, m18Pca,
    m19Bootstrap, m20JarqueBera, m21Assoc, m22Adamic, m23Isotonic,
    m24Mahalanobis, m25EmStep, m26Pettitt, m27Wilcoxon, m28Huber,
    m29Granger, m30RunsTest, m31Lift, m32Conformal, m33Dbscan, m34Chow,
    m35LjungBox, m36Ransac, m37McNemar, m39PageHinkley, m40CohensD,
    m41WeightedMedian, m42Auc, m43Stump, m44Calibration, m45Kruskal,
    m46PartialCorr, m47FeatureRank, m48Prf, m49Mood, m50Levene,
    m51Logrank, m52SomersD, m53MlE2e)
}
