package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef._

/** Financial-indicator twins — the chart-feed computations the reference's
  * visualization layer derives from the cleaned stock table
  * (datavisualization.py's moving-average/band/summary feeds, streamlit.py's
  * OHLC-style tab): candle resampling, Bollinger bands, market beta, and
  * calendar gap-fill. Twinned on the testdata star schema like every other
  * family (series = lineitem/orders ordered by the proven-total key sets).
  *
  * Scale notes: every query is one shuffle on its grouping key (the two
  * row_number windows in OHLC/ffill share the aggregation's partitioning, so
  * Catalyst plans a single exchange + sorts); the calendar spine is bounded
  * by days×groups regardless of input SF; no driver-side data loops.
  */
object FinanceCatalog {

  // proven total order for lineitem rows (same key set q_m2/q_w12 rely on)
  private val liOrder = Seq("l_shipdate", "l_orderkey", "l_linenumber")
  private val liOrderSql = "l_shipdate, l_orderkey, l_linenumber"
  private val liOrderDescSql =
    "l_shipdate DESC, l_orderkey DESC, l_linenumber DESC"

  // the total-order key + payload, as a lexicographically-ordered struct:
  // min/max of it select the first/last trade's price with ONE
  // partial-aggregatable pass (map-side combine) — no row_number window
  // sort over the full fact table (the window version cost ~3 s of each
  // cold q_f_* time at sf0.1; the key prefix is a proven total order, so
  // the trailing price field never participates in a comparison)
  private def orderedTrade =
    struct((liOrder :+ "l_extendedprice").map(col): _*)

  /** Weekly OHLC + VWAP candle resample per returnflag (the daily→weekly
    * downsample every charting layer performs; pandas `resample('W').ohlc()`
    * in the reference's visualization shape). open/close are the first/last
    * trade by the total order — selected values, not aggregates, so they
    * need no rounding; VWAP divides two exact decimal sums (deterministic
    * operands in both engines) and rounds at r4. The oracle spells
    * first/last as row_number = 1 under the same total order — identical
    * selection, window-free on the Spark side.
    */
  val ohlcWeekly = QueryDef(
    "q_f_ohlc_weekly",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select((Seq("l_returnflag") ++ liOrder ++
          Seq("l_extendedprice", "l_quantity")).map(col): _*)
        // date_trunc returns LTZ (implicit NTZ->LTZ cast); cast back so the
        // dump is NTZ micros like every other timestamp column the driver hashes
        .withColumn("wk",
          date_trunc("week", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "wk")
        .agg(
          min(orderedTrade).getField("l_extendedprice").as("open"),
          max(col("l_extendedprice")).as("high"),
          min(col("l_extendedprice")).as("low"),
          max(orderedTrade).getField("l_extendedprice").as("close"),
          r4(sumE(col("l_extendedprice") * col("l_quantity"))
            / sumE(col("l_quantity"))).as("vwap"),
          count(lit(1)).as("n_trades"))
        .orderBy("l_returnflag", "wk"),
    Some(s"""
      WITH b AS (
        SELECT l_returnflag,
               date_trunc('week', l_shipdate) AS wk,
               l_extendedprice, l_quantity,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('week', l_shipdate)
                 ORDER BY $liOrderSql) AS rn_a,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('week', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn_d
        FROM lineitem)
      SELECT l_returnflag, wk,
             max(CASE WHEN rn_a = 1 THEN l_extendedprice END) AS open,
             max(l_extendedprice) AS high,
             min(l_extendedprice) AS low,
             max(CASE WHEN rn_d = 1 THEN l_extendedprice END) AS close,
             ${sqlR4(s"${sqlSumE("l_extendedprice * l_quantity")} / ${sqlSumE("l_quantity")}")} AS vwap,
             count(*) AS n_trades
      FROM b GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** Bollinger bands over the orders series (W4's rolling mean/stddev frame
    * widened to the indicator: mid ± 2σ and %B), pandas
    * `rolling(20, min_periods=20)` semantics — null until the frame fills.
    * %B is guarded by an EXACT flat-frame predicate (min = max over the
    * frame) rather than σ = 0.0 — float equality on an aggregate would be
    * engine-dependent; min/max of the same 20 doubles are not.
    */
  val bollinger = QueryDef(
    "q_f_bollinger",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-19, 0)
      val full = count(lit(1)).over(w) === 20
      val flat = max(col("o_totalprice")).over(w) ===
        min(col("o_totalprice")).over(w)
      // rolling mean/σ on INTEGER cents: the raw price doubles are
      // bit-identical across engines, so floor(p·100+0.5) is the same
      // BIGINT in both and every windowed moment after it is exact
      // integer/decimal arithmetic — the plain windowed avg/stddev_samp
      // diverged at sf0.1 (DuckDB's segment-tree frame summation vs
      // Spark's in-order recompute round differently on 20 doubles, and
      // r2's granularity was straddled)
      val pc = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
      val s1 = sum(pc).over(w).cast("decimal(38,0)")
      val s2 = sum((pc * pc).cast("decimal(38,0)")).over(w)
      val mid = s1.cast("double") / lit(2000.0)
      val sd = sqrt((s2 * lit(20) - s1 * s1).cast("double")
        / lit(20.0 * 19.0 * 10000.0))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .select(col("o_custkey"), col("o_orderkey"),
          when(full, r2(mid)).as("mid"),
          when(full, r2(mid + lit(2) * sd)).as("upper"),
          when(full, r2(mid - lit(2) * sd)).as("lower"),
          when(full && !flat,
            r6((col("o_totalprice") - mid + lit(2) * sd) / (lit(4) * sd)))
            .as("pct_b"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some {
      val over = "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, " +
        "o_orderkey ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"
      s"""
      WITH p AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
        FROM orders),
      b AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(sum(pc) $over AS DECIMAL(38,0)) AS s1,
               CAST(sum(CAST(pc * pc AS DECIMAL(38,0))) $over
                 AS DECIMAL(38,0)) AS s2,
               count(*) $over AS n,
               max(o_totalprice) $over = min(o_totalprice) $over AS flat
        FROM p),
      c AS (
        SELECT o_custkey, o_orderkey, o_totalprice, n, flat,
               CAST(s1 AS DOUBLE) / 2000e0 AS mid,
               sqrt(CAST(s2 * 20 - s1 * s1 AS DOUBLE)
                 / (20e0 * 19e0 * 10000e0)) AS sd
        FROM b)
      SELECT o_custkey, o_orderkey,
             CASE WHEN n = 20 THEN ${sqlR2("mid")} END AS mid,
             CASE WHEN n = 20 THEN ${sqlR2("mid + 2 * sd")} END AS upper,
             CASE WHEN n = 20 THEN ${sqlR2("mid - 2 * sd")} END AS lower,
             CASE WHEN n = 20 AND NOT flat
               THEN ${sqlR6("(o_totalprice - mid + 2 * sd) / (4 * sd)")}
             END AS pct_b
      FROM c ORDER BY o_custkey, o_orderkey"""
    }
  )

  /** Market beta per returnflag: regress the flag's daily mean price on the
    * whole-market daily mean (the index-relative risk measure of the
    * reference's risk stats, F13's cousin). Daily means divide exact
    * decimal sums by counts — bit-identical operands in both engines — so
    * only the final covariance/variance aggregates are float-order
    * sensitive (r6, same contract as the A11 correlation matrix). alpha is
    * derived from the ALREADY-ROUNDED beta so both engines compute it from
    * identical operands.
    */
  val beta = QueryDef(
    "q_f_beta",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_shipdate").cast("date").as("day"),
          col("l_extendedprice"))
      val daily = li.groupBy("l_returnflag", "day")
        .agg(sum(col("l_extendedprice").cast("decimal(28,6)")).as("sdec"),
          count(lit(1)).as("n"))
      val market = daily.groupBy("day")
        .agg((sum(col("sdec")).cast("double") / sum(col("n")))
          .as("m"))
      val joined = daily
        .select(col("l_returnflag"), col("day"),
          (col("sdec").cast("double") / col("n")).as("y"))
        .join(market, "day")
      val betaRaw = covar_pop(col("y"), col("m")) / var_pop(col("m"))
      joined.groupBy("l_returnflag")
        .agg(
          r6(betaRaw).as("beta"),
          r2(sumE(col("y")) / count(lit(1))
            - r6(betaRaw) * (sumE(col("m")) / count(lit(1)))).as("alpha"),
          r6(corr(col("y"), col("m"))).as("mkt_corr"),
          count(lit(1)).as("n_days"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
               sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS sdec,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2),
      market AS (
        SELECT day, CAST(sum(sdec) AS DOUBLE) / sum(n) AS m
        FROM daily GROUP BY 1),
      j AS (
        SELECT d.l_returnflag, d.day, CAST(d.sdec AS DOUBLE) / d.n AS y, m.m
        FROM daily d JOIN market m USING (day)),
      g AS (
        SELECT l_returnflag,
               covar_pop(y, m) / var_pop(m) AS b,
               ${sqlSumE("y")} AS sy, ${sqlSumE("m")} AS sm,
               corr(y, m) AS r, count(*) AS n_days
        FROM j GROUP BY 1)
      SELECT l_returnflag, ${sqlR6("b")} AS beta,
             ${sqlR2(s"sy / n_days - ${sqlR6("b")} * (sm / n_days)")} AS alpha,
             ${sqlR6("r")} AS mkt_corr, n_days
      FROM g ORDER BY l_returnflag""")
  )

  /** Last trade's price per (flag, calendar day): one partial-aggregatable
    * max(orderedTrade) pass — shared by q_f_ffill and q_f_rsi; both oracles
    * spell the same selection as row_number = 1 under the reversed total
    * order.
    */
  private def dailyClose(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "lineitem")
      .select((Seq("l_returnflag") ++ liOrder :+ "l_extendedprice")
        .map(col): _*)
      .withColumn("day",
        date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
      .groupBy("l_returnflag", "day")
      .agg(max(orderedTrade).getField("l_extendedprice").as("close"))

  /** Calendar resample + forward fill: a per-flag daily date spine (every
    * calendar day between the flag's first and last trade) left-joined to
    * the daily close, gaps carried forward — pandas
    * `asfreq('D').ffill()`, the step the reference's charts need before
    * plotting a continuous line. Closes are SELECTED raw values (no float
    * aggregation), so the filled series needs no rounding. Spine size is
    * days × |flags| — calendar-bounded, independent of input SF.
    */
  val ffill = QueryDef(
    "q_f_ffill",
    (s, dir) => {
      val closes = dailyClose(s, dir)
      val spine = closes.groupBy("l_returnflag")
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(col("l_returnflag"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
            .as("day"))
      val ff = Window.partitionBy("l_returnflag").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(closes, Seq("l_returnflag", "day"), "left")
        .select(col("l_returnflag"), col("day"),
          last(col("close"), ignoreNulls = true).over(ff).as("close_ff"),
          col("close").isNull.as("gap_filled"))
        .orderBy("l_returnflag", "day")
    },
    Some(s"""
      WITH r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day, l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn = 1),
      span AS (
        SELECT l_returnflag, min(day) AS lo, max(day) AS hi
        FROM cl GROUP BY 1),
      spine AS (
        SELECT l_returnflag,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        FROM span),
      f AS (
        SELECT s.l_returnflag, s.day, cl.close
        FROM spine s LEFT JOIN cl USING (l_returnflag, day))
      SELECT l_returnflag, day,
             last_value(close IGNORE NULLS) OVER (
               PARTITION BY l_returnflag ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ff,
             close IS NULL AS gap_filled
      FROM f ORDER BY l_returnflag, day""")
  )

  // q_f_rsi parameters — interpolated into the Spark scans, the aux dumps,
  // and the oracle SQL so the replay can never drift from the query
  private val RsiAlpha = 1.0 / 14.0 // Wilder's smoothing, period 14
  private val RsiBuckets = 32

  /** Shared by the gated query and the two Verify aux dumps: the daily
    * close-to-close diffs split into gain/loss series, run through TWO
    * chained plans.EwmaScan linear-recurrence scans (avg gain, then avg
    * loss over the first scan's output — same rows, so both scans segment
    * identically). Seeds from BOTH scans ride to aux for the oracle.
    */
  private def rsiParts(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val closes = dailyClose(s, dir)
    // per-instrument series: tiny per group (calendar-bounded), so a plain
    // window is the right plan; a wide-series caller would route the diff
    // through plans.SequenceOps like q_m2 does
    val diffW = Window.partitionBy("l_returnflag").orderBy("day")
    val diffs = closes
      .withColumn("prev", lag(col("close"), 1).over(diffW))
      .where(col("prev").isNotNull)
      .withColumn("gain", greatest(col("close") - col("prev"), lit(0.0)))
      .withColumn("loss", greatest(col("prev") - col("close"), lit(0.0)))
      .select("l_returnflag", "day", "gain", "loss")
    val (g1, gainSeeds) = graft.plans.EwmaScan.ewmaWithSeeds(
      diffs, Seq("l_returnflag"), Seq("day"),
      unix_date(col("day").cast("date")), "gain", RsiAlpha, "avg_gain",
      RsiBuckets)
    val (g2, lossSeeds) = graft.plans.EwmaScan.ewmaWithSeeds(
      g1, Seq("l_returnflag"), Seq("day"),
      unix_date(col("day").cast("date")), "loss", RsiAlpha, "avg_loss",
      RsiBuckets)
    (g2, gainSeeds, lossSeeds)
  }

  // q_f_macd parameters — standard 12/26/9 MACD EMAs as adjust=False
  // alphas, interpolated into the scans, the dumps, and the oracle
  private val MacdAlphaFast = 2.0 / 13.0 // EMA-12
  private val MacdAlphaSlow = 2.0 / 27.0 // EMA-26
  private val MacdAlphaSig = 2.0 / 10.0  // EMA-9 signal

  /** Shared by the gated query and the three Verify aux dumps: EMA-12 and
    * EMA-26 of the daily close (two chained EwmaScans over the SAME rows —
    * identical segmentation), macd = fast − slow, then a THIRD scan for
    * the EMA-9 signal line over the macd series (still the same rows, so
    * all three seed tables share one bucket layout).
    */
  private def macdParts(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val closes = dailyClose(s, dir)
    val (c1, fastSeeds) = graft.plans.EwmaScan.ewmaWithSeeds(
      closes, Seq("l_returnflag"), Seq("day"),
      unix_date(col("day").cast("date")), "close", MacdAlphaFast, "ema_fast",
      RsiBuckets)
    val (c2, slowSeeds) = graft.plans.EwmaScan.ewmaWithSeeds(
      c1, Seq("l_returnflag"), Seq("day"),
      unix_date(col("day").cast("date")), "close", MacdAlphaSlow, "ema_slow",
      RsiBuckets)
    val macdF = c2.withColumn("macd", col("ema_fast") - col("ema_slow"))
    val (c3, sigSeeds) = graft.plans.EwmaScan.ewmaWithSeeds(
      macdF, Seq("l_returnflag"), Seq("day"),
      unix_date(col("day").cast("date")), "macd", MacdAlphaSig, "signal",
      RsiBuckets)
    (c3, fastSeeds, slowSeeds, sigSeeds)
  }

  /** Spark-computed EWMA segment seeds for the q_f_rsi / q_f_macd oracle
    * replays. */
  val auxDumps: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "rsi_gain_seeds" -> ((s, dir) => rsiParts(s, dir)._2),
    "rsi_loss_seeds" -> ((s, dir) => rsiParts(s, dir)._3),
    "macd_fast_seeds" -> ((s, dir) => macdParts(s, dir)._2),
    "macd_slow_seeds" -> ((s, dir) => macdParts(s, dir)._3),
    "macd_sig_seeds" -> ((s, dir) => macdParts(s, dir)._4),
    "holt_seeds" -> ((s, dir) => holtParts(s, dir)._2))

  /** RSI-14 (Wilder): EWMA-smoothed average gain vs average loss over the
    * daily close-to-close moves, RSI = 100 − 100/(1 + gain/loss) — THE
    * canonical stock-chart momentum indicator (the reference's indicator
    * family, datavisualization.py's moving-average feeds). Both smoothers
    * are plans.EwmaScan linear-recurrence scans (pandas
    * `ewm(alpha=1/14, adjust=False)` seeded y₁=x₁), so every avg_gain /
    * avg_loss value is plain IEEE ×/+ on identical operands in both
    * engines and the DuckDB recursive-CTE replay (one CTE carrying both
    * recurrences, seeded per segment from the dumped boundary tables)
    * matches BIT-FOR-BIT — no rounding anywhere, including the final RSI
    * arithmetic and the avg_loss = 0 branch (exact on identical doubles).
    */
  val rsi = QueryDef(
    "q_f_rsi",
    (s, dir) =>
      rsiParts(s, dir)._1
        .select(col("l_returnflag"), col("day"),
          when(col("avg_loss") === 0.0, lit(100.0))
            .otherwise(lit(100.0) - lit(100.0)
              / (lit(1.0) + col("avg_gain") / col("avg_loss"))).as("rsi"))
        .orderBy("l_returnflag", "day"),
    Some(s"""
      WITH RECURSIVE
      r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn = 1),
      df AS MATERIALIZED (
        SELECT l_returnflag, day,
               greatest(close - prev, 0) AS g, greatest(prev - close, 0) AS l
        FROM (
          SELECT l_returnflag, day, close,
                 lag(close, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                   AS prev
          FROM cl)
        WHERE prev IS NOT NULL),
      lohi AS (
        SELECT min(CAST(day AS DATE) - DATE '1970-01-01') AS lo,
               max(CAST(day AS DATE) - DATE '1970-01-01') AS hi
        FROM df),
      kb AS (
        SELECT l_returnflag, day, g, l,
               CAST(((CAST(day AS DATE) - DATE '1970-01-01') - lo)
                 // ((hi - lo) // $RsiBuckets + 1) AS INT) AS b
        FROM df, lohi),
      base AS MATERIALIZED (
        SELECT *, row_number() OVER (PARTITION BY b, l_returnflag
          ORDER BY day) AS rn
        FROM kb),
      sg AS (
        SELECT "__ewma_b" AS b, l_returnflag, seed
        FROM read_parquet('__VERIFY_OUT__/_aux/rsi_gain_seeds/*.parquet')),
      sl AS (
        SELECT "__ewma_b" AS b, l_returnflag, seed
        FROM read_parquet('__VERIFY_OUT__/_aux/rsi_loss_seeds/*.parquet')),
      rec AS (
        SELECT k.b, k.l_returnflag, k.day, k.rn,
               CASE WHEN g.seed IS NULL THEN k.g
                    ELSE ${sqlD(1.0 - RsiAlpha)} * g.seed + ${sqlD(RsiAlpha)} * k.g
               END AS yg,
               CASE WHEN l.seed IS NULL THEN k.l
                    ELSE ${sqlD(1.0 - RsiAlpha)} * l.seed + ${sqlD(RsiAlpha)} * k.l
               END AS yl
        FROM base k
        JOIN sg g ON g.b = k.b AND g.l_returnflag = k.l_returnflag
        JOIN sl l ON l.b = k.b AND l.l_returnflag = k.l_returnflag
        WHERE k.rn = 1
        UNION ALL
        SELECT n.b, n.l_returnflag, n.day, n.rn,
               ${sqlD(1.0 - RsiAlpha)} * p.yg + ${sqlD(RsiAlpha)} * n.g,
               ${sqlD(1.0 - RsiAlpha)} * p.yl + ${sqlD(RsiAlpha)} * n.l
        FROM rec p JOIN base n
          ON n.b = p.b AND n.l_returnflag = p.l_returnflag
            AND n.rn = p.rn + 1)
      SELECT l_returnflag, day,
             CASE WHEN yl = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + yg / yl) END AS rsi
      FROM rec
      ORDER BY l_returnflag, day""")
  )

  /** MACD(12,26,9): fast/slow EMAs of the daily close, macd = fast − slow,
    * signal = EMA-9 of macd, histogram = macd − signal — the second
    * canonical chart indicator, and the deeper composition test for
    * plans.EwmaScan: THREE chained recurrence scans, the third running
    * over a column derived from the first two. Every value is IEEE ×/+/−
    * on identical operands in both engines → the replay (one recursive CTE
    * carrying both EMAs, a second for the signal, seeded from the dumped
    * boundary tables) matches BIT-FOR-BIT, no rounding.
    */
  val macd = QueryDef(
    "q_f_macd",
    (s, dir) =>
      macdParts(s, dir)._1
        .select(col("l_returnflag"), col("day"),
          col("macd"),
          col("signal"),
          (col("macd") - col("signal")).as("histogram"))
        .orderBy("l_returnflag", "day"),
    Some(s"""
      WITH RECURSIVE
      r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS MATERIALIZED (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn = 1),
      lohi AS (
        SELECT min(CAST(day AS DATE) - DATE '1970-01-01') AS lo,
               max(CAST(day AS DATE) - DATE '1970-01-01') AS hi
        FROM cl),
      kb AS (
        SELECT l_returnflag, day, close,
               CAST(((CAST(day AS DATE) - DATE '1970-01-01') - lo)
                 // ((hi - lo) // $RsiBuckets + 1) AS INT) AS b
        FROM cl, lohi),
      base AS MATERIALIZED (
        SELECT *, row_number() OVER (PARTITION BY b, l_returnflag
          ORDER BY day) AS rn
        FROM kb),
      sf AS (
        SELECT "__ewma_b" AS b, l_returnflag, seed
        FROM read_parquet('__VERIFY_OUT__/_aux/macd_fast_seeds/*.parquet')),
      ss AS (
        SELECT "__ewma_b" AS b, l_returnflag, seed
        FROM read_parquet('__VERIFY_OUT__/_aux/macd_slow_seeds/*.parquet')),
      sg AS (
        SELECT "__ewma_b" AS b, l_returnflag, seed
        FROM read_parquet('__VERIFY_OUT__/_aux/macd_sig_seeds/*.parquet')),
      rec AS (
        SELECT k.b, k.l_returnflag, k.day, k.rn,
               CASE WHEN f.seed IS NULL THEN k.close
                    ELSE ${sqlD(1.0 - MacdAlphaFast)} * f.seed
                         + ${sqlD(MacdAlphaFast)} * k.close
               END AS yf,
               CASE WHEN s.seed IS NULL THEN k.close
                    ELSE ${sqlD(1.0 - MacdAlphaSlow)} * s.seed
                         + ${sqlD(MacdAlphaSlow)} * k.close
               END AS ys
        FROM base k
        JOIN sf f ON f.b = k.b AND f.l_returnflag = k.l_returnflag
        JOIN ss s ON s.b = k.b AND s.l_returnflag = k.l_returnflag
        WHERE k.rn = 1
        UNION ALL
        SELECT n.b, n.l_returnflag, n.day, n.rn,
               ${sqlD(1.0 - MacdAlphaFast)} * p.yf + ${sqlD(MacdAlphaFast)} * n.close,
               ${sqlD(1.0 - MacdAlphaSlow)} * p.ys + ${sqlD(MacdAlphaSlow)} * n.close
        FROM rec p JOIN base n
          ON n.b = p.b AND n.l_returnflag = p.l_returnflag
            AND n.rn = p.rn + 1),
      m AS MATERIALIZED (
        SELECT b, l_returnflag, day, rn, yf - ys AS macd FROM rec),
      rec2 AS (
        SELECT k.b, k.l_returnflag, k.day, k.rn,
               CASE WHEN g.seed IS NULL THEN k.macd
                    ELSE ${sqlD(1.0 - MacdAlphaSig)} * g.seed
                         + ${sqlD(MacdAlphaSig)} * k.macd
               END AS y
        FROM m k
        JOIN sg g ON g.b = k.b AND g.l_returnflag = k.l_returnflag
        WHERE k.rn = 1
        UNION ALL
        SELECT n.b, n.l_returnflag, n.day, n.rn,
               ${sqlD(1.0 - MacdAlphaSig)} * p.y + ${sqlD(MacdAlphaSig)} * n.macd
        FROM rec2 p JOIN m n
          ON n.b = p.b AND n.l_returnflag = p.l_returnflag
            AND n.rn = p.rn + 1)
      SELECT m.l_returnflag, m.day, m.macd, r2.y AS signal,
             m.macd - r2.y AS histogram
      FROM m JOIN rec2 r2
        ON r2.b = m.b AND r2.l_returnflag = m.l_returnflag
          AND r2.rn = m.rn
      ORDER BY m.l_returnflag, m.day""")
  )

  /** Longest up-streaks (gaps-and-islands): consecutive trading days with
    * a rising close, found with the classic rn − rn_per_direction island
    * key — the streak/momentum table behind "N up days in a row" chart
    * annotations. Directions come from exact comparisons of SELECTED
    * closes (no float aggregation anywhere), so the whole result is
    * integer/date arithmetic — bit-exact, no rounding. The daily series
    * is calendar-bounded (the one shuffle is the dailyClose aggregation).
    */
  val streaks = QueryDef(
    "q_f_streaks",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val d = dailyClose(s, dir)
        .withColumn("prev", lag(col("close"), 1).over(byDay))
        .where(col("prev").isNotNull)
        .withColumn("dir",
          when(col("close") > col("prev"), "U")
            .when(col("close") < col("prev"), "D").otherwise("F"))
      val byDirDay = Window.partitionBy("l_returnflag", "dir").orderBy("day")
      d.withColumn("grp",
          row_number().over(byDay) - row_number().over(byDirDay))
        .where(col("dir") === "U")
        .groupBy("l_returnflag", "grp")
        .agg(count(lit(1)).as("streak_days"),
          min(col("day")).as("start_day"), max(col("day")).as("end_day"))
        .select(col("l_returnflag"), col("streak_days"), col("start_day"),
          col("end_day"))
        .orderBy(col("streak_days").desc, col("l_returnflag"),
          col("start_day"))
        .limit(15)
    },
    Some(s"""
      WITH r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn = 1),
      d AS (
        SELECT l_returnflag, day, close,
               lag(close, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS prev
        FROM cl),
      dd AS (
        SELECT l_returnflag, day,
               CASE WHEN close > prev THEN 'U'
                    WHEN close < prev THEN 'D' ELSE 'F' END AS dir
        FROM d WHERE prev IS NOT NULL),
      g AS (
        SELECT l_returnflag, day, dir,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY day)
               - row_number() OVER (PARTITION BY l_returnflag, dir
                                    ORDER BY day) AS grp
        FROM dd)
      SELECT l_returnflag, count(*) AS streak_days,
             min(day) AS start_day, max(day) AS end_day
      FROM g WHERE dir = 'U'
      GROUP BY l_returnflag, grp
      ORDER BY streak_days DESC, l_returnflag, start_day LIMIT 15""")
  )

  /** On-balance volume: the running sum of daily volume signed by the
    * close's direction (+V on up days, −V on down, 0 on flat) — the
    * classic volume-flow confirmation indicator. The daily volume is an
    * exact decimal sum, the sign comes from exact close comparisons, and
    * the running sum accumulates in decimal — BIT-exact end to end, the
    * same exact-cumsum contract as q_w6.
    */
  val obv = QueryDef(
    "q_f_obv",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val daily = t(s, dir, "lineitem")
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg(max(orderedTrade).getField("l_extendedprice").as("close"),
          sum(col("l_quantity").cast("decimal(28,6)")).as("vol"))
      daily
        .withColumn("prev", lag(col("close"), 1).over(byDay))
        .withColumn("sv",
          when(col("prev").isNull || col("close") === col("prev"),
            lit(0).cast("decimal(28,6)"))
            .when(col("close") > col("prev"), col("vol"))
            .otherwise(-col("vol")))
        .select(col("l_returnflag"), col("day"),
          sum(col("sv")).over(byDay.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("obv"))
        .orderBy("l_returnflag", "day")
    },
    Some(s"""
      WITH li AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice, l_quantity, l_orderkey, l_linenumber,
               l_shipdate
        FROM lineitem),
      daily AS (
        SELECT l_returnflag, day,
               max(CASE WHEN rn = 1 THEN l_extendedprice END) AS close,
               sum(CAST(l_quantity AS DECIMAL(28,6))) AS vol
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY l_returnflag, day
            ORDER BY $liOrderDescSql) AS rn
          FROM li)
        GROUP BY 1, 2),
      sv AS (
        SELECT l_returnflag, day,
               CASE WHEN prev IS NULL OR close = prev
                      THEN CAST(0 AS DECIMAL(28,6))
                    WHEN close > prev THEN vol
                    ELSE -vol END AS sv
        FROM (
          SELECT *, lag(close, 1) OVER (
            PARTITION BY l_returnflag ORDER BY day) AS prev
          FROM daily))
      SELECT l_returnflag, day,
             CAST(sum(sv) OVER (PARTITION BY l_returnflag ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS obv
      FROM sv ORDER BY l_returnflag, day""")
  )

  /** Stochastic oscillator %K(14): where today's close sits inside the
    * trailing 14-day low/high channel, 0–100 — rolling min/max are
    * SELECTED values and the ratio composes from identical operands, so
    * only the flat-channel guard needs care (exact min=max comparison,
    * the Bollinger convention); r6 on the ratio covers the one division.
    * %D (the SMA-3 signal) deliberately uses an explicit
    * (k + lag(k) + lag²(k))/3 instead of a window avg — fixed operand
    * order in both engines.
    */
  val stochastic = QueryDef(
    "q_f_stochastic",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val ch = byDay.rowsBetween(-13, 0)
      val full = count(lit(1)).over(ch) === 14
      val hh = max(col("close")).over(ch)
      val ll = min(col("close")).over(ch)
      val k = when(full && hh =!= ll,
        r6((col("close") - ll) / (hh - ll) * 100.0))
      val d = dailyClose(s, dir)
        .withColumn("pct_k", k)
      d.withColumn("pct_d",
          r6((col("pct_k") + lag(col("pct_k"), 1).over(byDay)
            + lag(col("pct_k"), 2).over(byDay)) / 3.0))
        .select("l_returnflag", "day", "pct_k", "pct_d")
        .orderBy("l_returnflag", "day")
    },
    Some(s"""
      WITH r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn = 1),
      ch AS (
        SELECT l_returnflag, day, close,
               max(close) OVER w AS hh, min(close) OVER w AS ll,
               count(*) OVER w AS n
        FROM cl
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
      k AS (
        SELECT l_returnflag, day,
               CASE WHEN n = 14 AND hh <> ll
                 THEN ${sqlR6("(close - ll) / (hh - ll) * 100.0")}
               END AS pct_k
        FROM ch)
      SELECT l_returnflag, day, pct_k,
             ${sqlR6(s"(pct_k + lag(pct_k, 1) OVER (PARTITION BY l_returnflag ORDER BY day) + lag(pct_k, 2) OVER (PARTITION BY l_returnflag ORDER BY day)) / 3.0")} AS pct_d
      FROM k ORDER BY l_returnflag, day""")
  )

  /** Autocorrelation of daily mean-price returns at lags 1–5 per flag —
    * the mean-reversion/momentum diagnostic behind every "are returns
    * predictable" chart. The return series divides exact decimal daily
    * means (identical operands both engines); the five corr aggregates
    * are float-order sensitive → r6, the A11 contract. One shuffle for
    * the daily aggregate, one window pass for all five lags.
    */
  val acf = QueryDef(
    "q_f_acf",
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
      val lagged = rets.select(
        col("l_returnflag") +: col("ret") +:
          (1 to 5).map(k => lag(col("ret"), k).over(byDay).as(s"l$k")): _*)
      lagged.groupBy("l_returnflag")
        .agg(
          r6(corr(col("ret"), col("l1"))).as("acf_1"),
          r6(corr(col("ret"), col("l2"))).as("acf_2"),
          r6(corr(col("ret"), col("l3"))).as("acf_3"),
          r6(corr(col("ret"), col("l4"))).as("acf_4"),
          r6(corr(col("ret"), col("l5"))).as("acf_5"),
          count(lit(1)).as("n_days"))
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
               y / lag(y, 1) OVER w - 1 AS ret
        FROM daily
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)),
      lagged AS (
        SELECT l_returnflag, ret,
               lag(ret, 1) OVER w AS l1, lag(ret, 2) OVER w AS l2,
               lag(ret, 3) OVER w AS l3, lag(ret, 4) OVER w AS l4,
               lag(ret, 5) OVER w AS l5
        FROM rets WHERE ret IS NOT NULL
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY day))
      SELECT l_returnflag,
             ${sqlR6("corr(ret, l1)")} AS acf_1,
             ${sqlR6("corr(ret, l2)")} AS acf_2,
             ${sqlR6("corr(ret, l3)")} AS acf_3,
             ${sqlR6("corr(ret, l4)")} AS acf_4,
             ${sqlR6("corr(ret, l5)")} AS acf_5,
             count(*) AS n_days
      FROM lagged GROUP BY 1 ORDER BY 1""")
  )

  /** Historical Value-at-Risk and Expected Shortfall (5%) per flag over
    * the daily mean-price return series — the standard tail-risk pair.
    * Returns divide exact decimal daily means (bit-identical operands in
    * both engines), VaR is the k-th smallest return under the total order
    * (ret, day) — a SELECTED value, k = floor(0.05·(n−1))+1, the exact-
    * quantile convention — and ES is the exact decimal mean of those k
    * tail returns (rank-based selection, no float threshold). Entirely
    * exact → no rounding. The per-flag rank window runs on the calendar-
    * bounded daily series (days × |flags| rows), the same spine charter
    * as q_f_ffill.
    */
  val varEs = QueryDef(
    "q_f_var_es",
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
      val rnw = Window.partitionBy("l_returnflag")
        .orderBy(col("ret"), col("day"))
      val ranked = rets
        .withColumn("rn", row_number().over(rnw))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
        .withColumn("k", floor(col("n") * 0.05 - 0.05).cast("bigint") + 1L)
      ranked.groupBy("l_returnflag")
        .agg(max(col("n")).as("n_days"),
          max(when(col("rn") === col("k"), col("ret"))).as("var_5"),
          (sum(when(col("rn") <= col("k"), col("ret"))
            .cast("decimal(38,18)")).cast("double") /
            max(col("k")).cast("double")).as("es_5"))
        .orderBy("l_returnflag")
    },
    Some("""
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
      ranked AS (
        SELECT l_returnflag, day, ret,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY ret, day) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM rets WHERE ret IS NOT NULL),
      k AS (
        SELECT *, CAST(floor(n * 0.05 - 0.05) AS BIGINT) + 1 AS k
        FROM ranked)
      SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_days,
             max(CASE WHEN rn = k THEN ret END) AS var_5,
             CAST(sum(CASE WHEN rn <= k THEN CAST(ret AS DECIMAL(38,18))
                      END) AS DOUBLE) / CAST(max(k) AS DOUBLE) AS es_5
      FROM k GROUP BY 1 ORDER BY 1""")
  )

  /** Day-of-week seasonality index per flag: mean price by weekday ÷ the
    * flag's overall mean — the multiplicative seasonal profile behind
    * weekly-pattern charts. Both means are exact (decimal sums, one
    * division each) and the index is one more division of those exact
    * doubles → bit-exact, no rounding. Two aggregations + a ≤|flags|-row
    * broadcast join; weekday numbering pinned to DuckDB's Sunday=0 by
    * shifting Spark's 1-based dayofweek.
    */
  val seasonality = QueryDef(
    "q_f_seasonality",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val byDow = li
        .groupBy(col("l_returnflag"),
          (dayofweek(col("l_shipdate")) - 1).cast("bigint").as("dow"))
        .agg(count(lit(1)).as("n"), avgE(col("l_extendedprice")).as("mean_dow"))
      val overall = li.groupBy("l_returnflag")
        .agg(avgE(col("l_extendedprice")).as("mean_all"))
      byDow.join(broadcast(overall), "l_returnflag")
        .select(col("l_returnflag"), col("dow"), col("n"), col("mean_dow"),
          (col("mean_dow") / col("mean_all")).as("seasonal_idx"))
        .orderBy("l_returnflag", "dow")
    },
    Some(s"""
      WITH d AS (
        SELECT l_returnflag, CAST(dayofweek(l_shipdate) AS BIGINT) AS dow,
               count(*) AS n,
               ${sqlAvgE("l_extendedprice")} AS mean_dow
        FROM lineitem GROUP BY 1, 2),
      o AS (
        SELECT l_returnflag, ${sqlAvgE("l_extendedprice")} AS mean_all
        FROM lineitem GROUP BY 1)
      SELECT d.l_returnflag, d.dow, d.n, d.mean_dow,
             d.mean_dow / o.mean_all AS seasonal_idx
      FROM d JOIN o USING (l_returnflag)
      ORDER BY d.l_returnflag, d.dow""")
  )

  /** Linear interpolation across calendar gaps — the ffill spine's
    * smarter sibling (pandas `interpolate('linear')`): each missing day
    * gets prev + (next − prev) · elapsed/span from the nearest real
    * closes on either side. Closes are selected raw values and the
    * blend is a fixed arithmetic expression over them and exact integer
    * day spans → bit-exact. Same calendar-bounded spine charter as
    * q_f_ffill (days × |flags|, independent of input SF).
    */
  val interp = QueryDef(
    "q_f_interp",
    (s, dir) => {
      val closes = dailyClose(s, dir)
      val spine = closes.groupBy("l_returnflag")
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(col("l_returnflag"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
            .as("day"))
      val wb = Window.partitionBy("l_returnflag").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wf = Window.partitionBy("l_returnflag").orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
      val g = spine.join(closes, Seq("l_returnflag", "day"), "left")
        .select(col("l_returnflag"), col("day"), col("close"),
          last(col("close"), ignoreNulls = true).over(wb).as("pv"),
          last(when(col("close").isNotNull, col("day")), ignoreNulls = true)
            .over(wb).as("pd"),
          first(col("close"), ignoreNulls = true).over(wf).as("nv"),
          first(when(col("close").isNotNull, col("day")), ignoreNulls = true)
            .over(wf).as("nd"))
      g.select(col("l_returnflag"), col("day"),
        when(col("close").isNotNull, col("close"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double")))
          .as("close_interp"),
        col("close").isNull.as("gap_filled"))
        .orderBy("l_returnflag", "day")
    },
    Some(s"""
      WITH r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn = 1),
      span AS (
        SELECT l_returnflag, min(day) AS lo, max(day) AS hi
        FROM cl GROUP BY 1),
      spine AS (
        SELECT l_returnflag,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        FROM span),
      g AS (
        SELECT s.l_returnflag, s.day, cl.close,
               last_value(cl.close IGNORE NULLS) OVER wb AS pv,
               last_value(CASE WHEN cl.close IS NOT NULL THEN s.day END
                 IGNORE NULLS) OVER wb AS pd,
               first_value(cl.close IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN cl.close IS NOT NULL THEN s.day END
                 IGNORE NULLS) OVER wf AS nd
        FROM spine s LEFT JOIN cl
          ON s.l_returnflag = cl.l_returnflag AND s.day = cl.day
        WINDOW
          wb AS (PARTITION BY s.l_returnflag ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY s.l_returnflag ORDER BY s.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT l_returnflag, day,
             CASE WHEN close IS NOT NULL THEN close
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) *
                    (CAST(date_diff('day', pd, day) AS DOUBLE) /
                     CAST(date_diff('day', pd, nd) AS DOUBLE))
             END AS close_interp,
             close IS NULL AS gap_filled
      FROM g ORDER BY l_returnflag, day""")
  )

  // q_f_holt parameters — exact binary fractions, so the interpolated SQL
  // literals ("0.875", "0.25", …) are the identical doubles in both engines
  private val HoltAlpha = 0.125
  private val HoltBeta = 0.25

  /** Shared by the gated query and the Verify aux dump: Holt level+trend
    * over the daily close series (the same dailyClose feed as RSI/MACD).
    */
  private def holtParts(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val closes = dailyClose(s, dir)
    graft.plans.HoltScan.holtWithSeeds(closes, Seq("l_returnflag"),
      Seq("day"), unix_date(col("day").cast("date")), "close",
      HoltAlpha, HoltBeta, "level", "trend", RsiBuckets)
  }

  /** Holt linear-trend smoothing (double exponential smoothing): the
    * forecasting recurrence statsmodels' `ExponentialSmoothing
    * (trend='add')` runs sequentially, distributed via plans.HoltScan's
    * 2×2 affine Blelloch scan. Level, trend, and the h=5 projection
    * `level + 5·trend` are all plain IEEE ×/+ on identical operands in
    * both engines, so the DuckDB recursive-CTE replay (one CTE carrying
    * BOTH state components, seeded per segment from the dumped boundary
    * table) matches BIT-FOR-BIT — no rounding anywhere.
    */
  val holt = QueryDef(
    "q_f_holt",
    (s, dir) =>
      holtParts(s, dir)._1
        .select(col("l_returnflag"), col("day"), col("level"), col("trend"),
          (col("level") + lit(5.0) * col("trend")).as("forecast_5"))
        .orderBy("l_returnflag", "day"),
    Some(s"""
      WITH RECURSIVE
      r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS MATERIALIZED (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn = 1),
      lohi AS (
        SELECT min(CAST(day AS DATE) - DATE '1970-01-01') AS lo,
               max(CAST(day AS DATE) - DATE '1970-01-01') AS hi
        FROM cl),
      kb AS (
        SELECT l_returnflag, day, close AS x,
               CAST(((CAST(day AS DATE) - DATE '1970-01-01') - lo)
                 // ((hi - lo) // $RsiBuckets + 1) AS INT) AS b
        FROM cl, lohi),
      base AS MATERIALIZED (
        SELECT *, row_number() OVER (PARTITION BY b, l_returnflag
          ORDER BY day) AS rn
        FROM kb),
      sd AS (
        SELECT "__holt_b" AS b, l_returnflag, seed_l, seed_b
        FROM read_parquet('__VERIFY_OUT__/_aux/holt_seeds/*.parquet')),
      rec AS (
        SELECT k.b, k.l_returnflag, k.day, k.rn,
               CASE WHEN s.seed_l IS NULL THEN k.x
                    ELSE ${sqlD(1.0 - HoltAlpha)} * (s.seed_l + s.seed_b)
                         + ${sqlD(HoltAlpha)} * k.x
               END AS l,
               CASE WHEN s.seed_l IS NULL THEN 0.0
                    ELSE ${sqlD(HoltBeta)} * ((${sqlD(1.0 - HoltAlpha)} * (s.seed_l + s.seed_b)
                           + ${sqlD(HoltAlpha)} * k.x) - s.seed_l)
                         + ${sqlD(1.0 - HoltBeta)} * s.seed_b
               END AS tr
        FROM base k JOIN sd s
          ON s.b = k.b AND s.l_returnflag = k.l_returnflag
        WHERE k.rn = 1
        UNION ALL
        SELECT n.b, n.l_returnflag, n.day, n.rn,
               ${sqlD(1.0 - HoltAlpha)} * (p.l + p.tr) + ${sqlD(HoltAlpha)} * n.x,
               ${sqlD(HoltBeta)} * ((${sqlD(1.0 - HoltAlpha)} * (p.l + p.tr)
                 + ${sqlD(HoltAlpha)} * n.x) - p.l) + ${sqlD(1.0 - HoltBeta)} * p.tr
        FROM rec p JOIN base n
          ON n.b = p.b AND n.l_returnflag = p.l_returnflag
            AND n.rn = p.rn + 1)
      SELECT l_returnflag, day, l AS level, tr AS trend,
             l + 5.0 * tr AS forecast_5
      FROM rec
      ORDER BY l_returnflag, day""")
  )

  /** AR(2) autoregression of the daily close per returnflag — the
    * next-step forecaster (statsmodels `AutoReg(lags=2)` capability) fit
    * by OLS on the two lagged closes: x_t = a + φ₁·x_{t−1} + φ₂·x_{t−2}.
    * The Yule-Walker-style normal equations reduce to the same 2-regressor
    * closed form as q_m5_ridge (λ=0), but over the CALENDAR-BOUNDED daily
    * series: the one shuffle is the dailyClose aggregation; lags are a
    * window over ≤ days×flags rows; moments are one tiny aggregate.
    *
    * Bit-exactness: closes are SELECTED raw 2-decimal prices (exact at
    * decimal scale 6), their pairwise products are exact 4-decimal values
    * ≤ 1.2e10 (scaled int < 2^53 — the q_m14_anova scale argument), so
    * all nine moments are exact decimal sums; decD casts + one fixed
    * float expression per coefficient → r6/r2 guard only.
    */
  val ar2 = QueryDef(
    "q_f_ar2",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val lagged = dailyClose(s, dir)
        .withColumn("x1", lag(col("close"), 1).over(byDay))
        .withColumn("x2", lag(col("close"), 2).over(byDay))
        .where(col("x2").isNotNull)
      def s6(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,6)"))
      def s4(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,4)"))
      val m = lagged.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        s6(col("x1")).as("s1"), s6(col("x2")).as("s2"),
        s6(col("close")).as("sy"),
        s4(col("x1") * col("x1")).as("s11"),
        s4(col("x2") * col("x2")).as("s22"),
        s4(col("x1") * col("x2")).as("s12"),
        s4(col("x1") * col("close")).as("s1y"),
        s4(col("x2") * col("close")).as("s2y"))
      val nD = col("n").cast("double")
      val (s1, s2, sy) = (decD(col("s1")), decD(col("s2")), decD(col("sy")))
      val c11 = decD(col("s11")) - s1 * s1 / nD
      val c22 = decD(col("s22")) - s2 * s2 / nD
      val c12 = decD(col("s12")) - s1 * s2 / nD
      val c1y = decD(col("s1y")) - s1 * sy / nD
      val c2y = decD(col("s2y")) - s2 * sy / nD
      val det = c11 * c22 - c12 * c12
      val phi1 = (c22 * c1y - c12 * c2y) / det
      val phi2 = (c11 * c2y - c12 * c1y) / det
      val a = (sy - phi1 * s1 - phi2 * s2) / nD
      m.select(col("l_returnflag"), col("n").as("n_obs"),
          r6(phi1).as("phi1"), r6(phi2).as("phi2"), r2(a).as("intercept"))
        .orderBy("l_returnflag")
    },
    Some {
      def d6(e: String) = sqlDecD(s"sum(CAST(($e) AS DECIMAL(38,6)))")
      def d4(e: String) = sqlDecD(s"sum(CAST(($e) AS DECIMAL(38,4)))")
      s"""
      WITH r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn = 1),
      lagged AS (
        SELECT l_returnflag, close,
               lag(close, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS x1,
               lag(close, 2) OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS x2
        FROM cl),
      m AS (
        SELECT l_returnflag, count(*) AS n,
               ${d6("x1")} AS s1, ${d6("x2")} AS s2, ${d6("close")} AS sy,
               ${d4("x1 * x1")} AS s11, ${d4("x2 * x2")} AS s22,
               ${d4("x1 * x2")} AS s12, ${d4("x1 * close")} AS s1y,
               ${d4("x2 * close")} AS s2y
        FROM lagged WHERE x2 IS NOT NULL GROUP BY 1),
      c AS (
        SELECT l_returnflag, n,
               s1, s2, sy, CAST(n AS DOUBLE) AS nd,
               s11 - s1 * s1 / CAST(n AS DOUBLE) AS c11,
               s22 - s2 * s2 / CAST(n AS DOUBLE) AS c22,
               s12 - s1 * s2 / CAST(n AS DOUBLE) AS c12,
               s1y - s1 * sy / CAST(n AS DOUBLE) AS c1y,
               s2y - s2 * sy / CAST(n AS DOUBLE) AS c2y
        FROM m),
      f AS (
        SELECT l_returnflag, n, s1, s2, sy, nd,
               (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS phi1,
               (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS phi2
        FROM c)
      SELECT l_returnflag, n AS n_obs,
             ${sqlR6("phi1")} AS phi1, ${sqlR6("phi2")} AS phi2,
             ${sqlR2("(sy - phi1 * s1 - phi2 * s2) / nd")} AS intercept
      FROM f ORDER BY l_returnflag"""
    }
  )

  // q_f_holtwinters constants, shared verbatim by both engines
  private val HwM = 7          // weekly seasonality on the daily series
  private val HwAlpha = 0.3
  private val HwBeta = 0.1
  private val HwGamma = 0.2

  /** Holt–Winters additive triple exponential smoothing
    * (analytics.HoltWinters) of the daily close per returnflag — level +
    * trend + weekly seasonal state, the full classical smoothing family
    * next to q_f_holt (no seasonality) and q_w12_ewma (no trend). The
    * kernel is sequential per key over the CALENDAR-BOUNDED daily series
    * (the q_mm_* bounded-kernel contract; unbounded keys would lift to
    * (m+2)-dim affine maps on the HoltScan Blelloch scan). The oracle is
    * one recursive CTE carrying the m=7 seasonal values as POSITIONAL
    * queue columns (consume s1, append s_new) — every step plain IEEE in
    * the same written order, init means exact decimal → BIT-exact, no
    * rounding anywhere.
    */
  val holtWinters = QueryDef(
    "q_f_holtwinters",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      dailyClose(s, dir)
        .select(col("l_returnflag"),
          unix_date(col("day").cast("date")).as("d"), col("close"))
        .as[(String, Int, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (flag, it) =>
          val arr = it.toArray.sortBy(_._2)
          val steps = graft.analytics.HoltWinters.fit(
            arr.map(_._3).toIndexedSeq, HwM, HwAlpha, HwBeta, HwGamma)
          steps.iterator.map { st =>
            (flag, arr(st.t - 1)._2, st.level, st.trend, st.season,
              st.fitted)
          }
        }
        .toDF("l_returnflag", "d", "level", "trend", "season", "fitted")
        .withColumn("day",
          expr("CAST(date_add(DATE '1970-01-01', d) AS timestamp_ntz)"))
        .select("l_returnflag", "day", "level", "trend", "season", "fitted")
        .orderBy("l_returnflag", "day")
    },
    Some {
      val A = sqlD(HwAlpha)
      val IA = sqlD(1.0 - HwAlpha)
      val B = sqlD(HwBeta)
      val IB = sqlD(1.0 - HwBeta)
      val G = sqlD(HwGamma)
      val IG = sqlD(1.0 - HwGamma)
      // l_t expanded inline (recursive SELECTs cannot reference their own
      // aliases); identical trees evaluate to identical doubles
      val E1 = s"$A * (c.close - p.s1) + $IA * (p.l + p.b)"
      val sCols = (1 to HwM).map(i => s"s$i").mkString(", ")
      val sInit = (1 to HwM)
        .map(i => s"max(CASE WHEN rn = $i THEN close END) - m1v AS s$i")
        .mkString(",\n               ")
      val sShift = (2 to HwM).map(i => s"p.s$i").mkString(", ")
      s"""
      WITH RECURSIVE
      r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn_t
        FROM lineitem),
      cl0 AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn_t = 1),
      cl AS MATERIALIZED (
        SELECT l_returnflag, day, close,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS rn
        FROM cl0),
      n AS (SELECT l_returnflag, count(*) AS cnt FROM cl GROUP BY 1),
      means AS (
        SELECT l_returnflag,
               CAST(sum(CASE WHEN rn <= $HwM
                   THEN CAST(close AS DECIMAL(28,6)) END) AS DOUBLE)
                 / ${HwM}.0 AS m1v,
               CAST(sum(CASE WHEN rn BETWEEN ${HwM + 1} AND ${2 * HwM}
                   THEN CAST(close AS DECIMAL(28,6)) END) AS DOUBLE)
                 / ${HwM}.0 AS m2v
        FROM cl WHERE rn <= ${2 * HwM} GROUP BY 1),
      init AS MATERIALIZED (
        SELECT cl.l_returnflag, m1v AS l, (m2v - m1v) / ${HwM}.0 AS b,
               $sInit
        FROM cl
        JOIN means ON means.l_returnflag = cl.l_returnflag
        JOIN n ON n.l_returnflag = cl.l_returnflag
        WHERE cl.rn <= $HwM AND n.cnt >= ${2 * HwM + 1}
        GROUP BY cl.l_returnflag, m1v, m2v),
      rec AS (
        SELECT l_returnflag, $HwM AS rn, l, b, $sCols,
               CAST(NULL AS DOUBLE) AS season,
               CAST(NULL AS DOUBLE) AS fitted
        FROM init
        UNION ALL
        SELECT p.l_returnflag, c.rn,
               $E1 AS l,
               $B * (($E1) - p.l) + $IB * p.b AS b,
               $sShift,
               $G * (c.close - ($E1)) + $IG * p.s1 AS s$HwM,
               $G * (c.close - ($E1)) + $IG * p.s1 AS season,
               p.l + p.b + p.s1 AS fitted
        FROM rec p JOIN cl c
          ON c.l_returnflag = p.l_returnflag AND c.rn = p.rn + 1)
      SELECT rec.l_returnflag, cl.day, rec.l AS level, rec.b AS trend,
             rec.season, rec.fitted
      FROM rec
      JOIN cl ON cl.l_returnflag = rec.l_returnflag AND cl.rn = rec.rn
      WHERE rec.rn > $HwM
      ORDER BY rec.l_returnflag, cl.day"""
    }
  )

  /** Durbin–Watson serial-correlation test (Durbin & Watson 1950) on the
    * residuals of the daily-close-on-time OLS per flag — the standard
    * "is a linear trend enough, or is there autocorrelation left"
    * regression diagnostic (statsmodels durbin_watson). Residuals are
    * QUANTIZED to integer micro-units (floor(e·1e6+0.5) — the identical
    * IEEE op both engines run on identical residual doubles), so both DW
    * sums are exact wide-decimal integer sums; d = one division of their
    * double casts (relative 1-ulp class, far below r6 on d ∈ [0,4]).
    * The trend fit composes from exact decimal moments (decD), the lag
    * runs over the calendar-bounded daily series.
    */
  val dw = QueryDef(
    "q_f_dw",
    (s, dir) => {
      val base = dailyClose(s, dir)
        .select(col("l_returnflag"),
          unix_date(col("day").cast("date")).as("x"), col("close").as("y"),
          col("day"))
      val m = base.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"), sum(col("x").cast("long")).as("sx"),
        sum(col("y").cast("decimal(38,6)")).as("sy"),
        sum((col("x") * col("x")).cast("long")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,2)")).as("sxy"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double")
      val sxxD = col("sxx").cast("double")
      val syD = decD(col("sy"))
      val sxyD = decD(col("sxy"))
      val b = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
      val a = (syD - b * sxD) / nD
      val withE = base.join(broadcast(
          m.select(col("l_returnflag"), b.as("b"), a.as("a"), col("n"))),
          "l_returnflag")
        .withColumn("eu",
          floor((col("y") - col("a") - col("b") * col("x").cast("double"))
            * 1e6 + 0.5))
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      withE
        .withColumn("de", col("eu") - lag(col("eu"), 1).over(byDay))
        .groupBy("l_returnflag")
        .agg(max(col("n")).as("n_obs"),
          sum(when(col("de").isNotNull,
            col("de").cast("decimal(19,0)") * col("de").cast("decimal(19,0)")))
            .as("num"),
          sum(col("eu").cast("decimal(19,0)") * col("eu").cast("decimal(19,0)"))
            .as("den"))
        .select(col("l_returnflag"), col("n_obs"),
          r6(col("num").cast("double") / col("den").cast("double"))
            .as("dw"))
        .orderBy("l_returnflag")
    },
    Some {
      val nD = "CAST(n AS DOUBLE)"
      val b = s"(($nD * ${sqlDecD("sxy")} - CAST(sx AS DOUBLE) * ${sqlDecD("sy")})" +
        s" / ($nD * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
      s"""
      WITH r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS (
        SELECT l_returnflag, day,
               CAST(CAST(day AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               l_extendedprice AS y
        FROM r WHERE rn = 1),
      m AS (
        SELECT l_returnflag, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
               sum(CAST(y AS DECIMAL(38,6))) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               sum(CAST(x * y AS DECIMAL(38,2))) AS sxy
        FROM cl GROUP BY 1),
      c AS (
        SELECT l_returnflag, n, $b AS b,
               (${sqlDecD("sy")} - $b * CAST(sx AS DOUBLE)) / $nD AS a
        FROM m),
      e AS (
        SELECT cl.l_returnflag, cl.day, c.n,
               CAST(floor((cl.y - c.a - c.b * CAST(cl.x AS DOUBLE))
                 * 1e6 + 0.5) AS BIGINT) AS eu
        FROM cl JOIN c ON c.l_returnflag = cl.l_returnflag),
      d AS (
        SELECT l_returnflag, n, eu,
               eu - lag(eu, 1) OVER (PARTITION BY l_returnflag
                 ORDER BY day) AS de
        FROM e)
      SELECT l_returnflag, max(n) AS n_obs,
             ${sqlR6("""CAST(sum(CASE WHEN de IS NOT NULL
                 THEN CAST(de AS HUGEINT) * de END) AS DOUBLE)
               / CAST(sum(CAST(eu AS HUGEINT) * eu) AS DOUBLE)""")} AS dw
      FROM d GROUP BY 1 ORDER BY 1"""
    }
  )

  // q_f_kalman noise parameters (process / measurement variance), shared
  // verbatim by both engines via sqlD literals
  private val KalQ = 0.5
  private val KalR = 4.0

  /** 1-D Kalman filter (constant-level state-space model) over the daily
    * close per flag — the optimal online level estimator the exponential
    * smoothers approximate, with a TIME-VARYING gain that converges from
    * trust-the-data to the steady state (the Kalman/EWMA correspondence):
    *   predict:  P ← P + Q
    *   gain:     K = P / (P + R)
    *   update:   x ← x + K·(y − x);  P ← (1 − K)·P
    * Initialized x₁ = y₁, P₁ = R. Every step is plain IEEE ×/+/−/÷ on
    * identical operands in the same written order, so the DuckDB
    * recursive-CTE replay (carrying x and P) matches BIT-for-bit — no
    * rounding anywhere. Sequential per key over the calendar-bounded
    * daily series (the q_f_holtwinters contract; unbounded keys lift the
    * affine (x,P) recurrence onto the HoltScan Blelloch scan).
    */
  val kalman = QueryDef(
    "q_f_kalman",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      dailyClose(s, dir)
        .select(col("l_returnflag"),
          unix_date(col("day").cast("date")).as("d"), col("close"))
        .as[(String, Int, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (flag, it) =>
          val arr = it.toArray.sortBy(_._2)
          if (arr.isEmpty) Iterator.empty
          else {
            var x = arr(0)._3
            var p = KalR
            val out = Vector.newBuilder[(String, Int, Double, Double, Double)]
            out += ((flag, arr(0)._2, x, 0.0, p))
            var i = 1
            while (i < arr.length) {
              val y = arr(i)._3
              val pp = p + KalQ
              val k = pp / (pp + KalR)
              x = x + k * (y - x)
              p = (1.0 - k) * pp
              out += ((flag, arr(i)._2, x, k, p))
              i += 1
            }
            out.result().iterator
          }
        }
        .toDF("l_returnflag", "d", "estimate", "gain", "p_var")
        .withColumn("day",
          expr("CAST(date_add(DATE '1970-01-01', d) AS timestamp_ntz)"))
        .select("l_returnflag", "day", "estimate", "gain", "p_var")
        .orderBy("l_returnflag", "day")
    },
    Some {
      val Q = sqlD(KalQ)
      val R = sqlD(KalR)
      s"""
      WITH RECURSIVE
      r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn_t
        FROM lineitem),
      cl0 AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn_t = 1),
      cl AS MATERIALIZED (
        SELECT l_returnflag, day, close,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS rn
        FROM cl0),
      rec AS (
        SELECT l_returnflag, rn, close AS x, CAST(0.0 AS DOUBLE) AS k,
               CAST($R AS DOUBLE) AS p
        FROM cl WHERE rn = 1
        UNION ALL
        SELECT p.l_returnflag, c.rn,
               p.x + ((p.p + $Q) / ((p.p + $Q) + $R)) * (c.close - p.x)
                 AS x,
               (p.p + $Q) / ((p.p + $Q) + $R) AS k,
               (1.0e0 - (p.p + $Q) / ((p.p + $Q) + $R)) * (p.p + $Q) AS p
        FROM rec p JOIN cl c
          ON c.l_returnflag = p.l_returnflag AND c.rn = p.rn + 1)
      SELECT rec.l_returnflag, cl.day, rec.x AS estimate, rec.k AS gain,
             rec.p AS p_var
      FROM rec JOIN cl
        ON cl.l_returnflag = rec.l_returnflag AND cl.rn = rec.rn
      ORDER BY rec.l_returnflag, cl.day"""
    }
  )

  // q_f_garch parameters (fixed, shared verbatim by both engines via sqlD
  // literals) and the implied long-run variance used as the seed
  private val GarchOmega = 0.0001
  private val GarchAlpha = 0.1
  private val GarchBeta = 0.85
  private val GarchS0 = GarchOmega / (1.0 - GarchAlpha - GarchBeta)

  /** GARCH(1,1) filtered conditional volatility over the daily-close
    * return series per flag (Bollerslev 1986) with FIXED parameters —
    * the volatility recursion every risk engine runs once parameters are
    * estimated offline:
    *   σ²_t = ω + α·r²_{t−1} + β·σ²_{t−1},  σ²_2 = ω/(1−α−β)
    * Each step is plain IEEE ×/+ on identical operands in the same
    * written order (returns are one division of selected closes), so the
    * DuckDB recursive-CTE replay carrying (ret, σ²) matches bit-for-bit;
    * vol = sqrt(σ²) is correctly rounded in both engines — no rounding
    * anywhere. Sequential per key over the calendar-bounded daily series
    * (the q_f_kalman contract).
    */
  val garch = QueryDef(
    "q_f_garch",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      dailyClose(s, dir)
        .select(col("l_returnflag"),
          unix_date(col("day").cast("date")).as("d"), col("close"))
        .as[(String, Int, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (flag, it) =>
          val arr = it.toArray.sortBy(_._2)
          if (arr.length < 2) Iterator.empty
          else {
            val out =
              Vector.newBuilder[(String, Int, Double, Double, Double)]
            var s2 = GarchS0
            var prevRet = 0.0
            var i = 1
            while (i < arr.length) {
              val ret = arr(i)._3 / arr(i - 1)._3 - 1.0
              if (i > 1)
                s2 = GarchOmega + GarchAlpha * prevRet * prevRet +
                  GarchBeta * s2
              out += ((flag, arr(i)._2, ret, s2, math.sqrt(s2)))
              prevRet = ret
              i += 1
            }
            out.result().iterator
          }
        }
        .toDF("l_returnflag", "d", "ret", "sigma2", "vol")
        .withColumn("day",
          expr("CAST(date_add(DATE '1970-01-01', d) AS timestamp_ntz)"))
        .select("l_returnflag", "day", "ret", "sigma2", "vol")
        .orderBy("l_returnflag", "day")
    },
    Some {
      val W = sqlD(GarchOmega)
      val A = sqlD(GarchAlpha)
      val B = sqlD(GarchBeta)
      val S0 = sqlD(GarchS0)
      s"""
      WITH RECURSIVE
      r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn_t
        FROM lineitem),
      cl0 AS (
        SELECT l_returnflag, day, l_extendedprice AS close
        FROM r WHERE rn_t = 1),
      cl AS (
        SELECT l_returnflag, day, close,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS rn
        FROM cl0),
      rets AS MATERIALIZED (
        SELECT l_returnflag, day, rn,
               close / lag(close, 1) OVER (
                 PARTITION BY l_returnflag ORDER BY rn) - 1.0e0 AS ret
        FROM cl),
      rec AS (
        SELECT l_returnflag, rn, ret, CAST($S0 AS DOUBLE) AS s2
        FROM rets WHERE rn = 2
        UNION ALL
        SELECT p.l_returnflag, c.rn, c.ret,
               $W + $A * p.ret * p.ret + $B * p.s2 AS s2
        FROM rec p JOIN rets c
          ON c.l_returnflag = p.l_returnflag AND c.rn = p.rn + 1)
      SELECT rec.l_returnflag, cl.day, rec.ret, rec.s2 AS sigma2,
             sqrt(rec.s2) AS vol
      FROM rec JOIN cl
        ON cl.l_returnflag = rec.l_returnflag AND cl.rn = rec.rn
      ORDER BY rec.l_returnflag, cl.day"""
    }
  )

  /** Sortino ratio per flag over the q_f_var_es daily return series: mean
    * return ÷ downside deviation, where the downside deviation is the RMS
    * of only the below-zero returns over ALL n observations (the standard
    * target-return-0 convention — full-count denominator, not
    * loss-count). Each return is a deterministic double (exact-decimal
    * daily means, one division); min(ret,0)² is a fixed per-row tree; both
    * sums are exact DECIMAL(38,18); sqrt is correctly rounded IEEE in both
    * engines — so only the final ratio is rounded (r6). One aggregation on
    * the calendar-bounded daily series.
    */
  val sortino = QueryDef(
    "q_f_sortino",
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
      val dn = least(col("ret"), lit(0.0))
      rets.groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_days"),
          (sum(col("ret").cast("decimal(38,18)")).cast("double") /
            count(lit(1))).as("mean_ret"),
          sqrt(sum((dn * dn).cast("decimal(38,18)")).cast("double") /
            count(lit(1))).as("downside_dev"))
        .select(col("l_returnflag"), col("n_days"), col("mean_ret"),
          col("downside_dev"),
          r6(col("mean_ret") / col("downside_dev")).as("sortino"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      rets AS (
        SELECT l_returnflag,
               y / lag(y, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 - 1 AS ret
        FROM daily),
      m AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CAST(ret AS DECIMAL(38,18))) AS DOUBLE) / count(*)
                 AS mean_ret,
               sqrt(CAST(sum(CAST(least(ret, 0e0) * least(ret, 0e0)
                      AS DECIMAL(38,18))) AS DOUBLE) / count(*))
                 AS downside_dev
        FROM rets WHERE ret IS NOT NULL GROUP BY 1)
      SELECT l_returnflag, n_days, mean_ret, downside_dev,
             ${sqlR6("mean_ret / downside_dev")} AS sortino
      FROM m ORDER BY l_returnflag""")
  )

  /** Forecast-accuracy scorecard over the daily close per flag: MAE /
    * RMSE / MAPE for the two standard reference forecasters every model
    * must beat — persistence (ŷ_t = y_{t−1}) and drift
    * (ŷ_t = y_{t−1} + (y_{t−1} − y_{t−2})) — plus Theil's U₁-style
    * ratio rmse_drift/rmse_naive. Pure lag windows (no recursion);
    * per-row errors are fixed trees of selected closes, error sums are
    * exact decimals, sqrt correctly rounded → only the reported metrics
    * round (r6/r4). The evaluation harness for the smoothing family
    * (Holt/HW/Kalman/GARCH) — at 100 TB it is one window pass on the
    * calendar-bounded daily series.
    */
  val forecastAcc = QueryDef(
    "q_f_forecast_acc",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val base = dailyClose(s, dir)
        .withColumn("l1", lag(col("close"), 1).over(byDay))
        .withColumn("l2", lag(col("close"), 2).over(byDay))
        .where(col("l2").isNotNull)
      val eN = col("close") - col("l1")
      val eD = col("close") - (col("l1") + (col("l1") - col("l2")))
      def d18(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,18)")).cast("double")
      base.groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          (d18(abs(eN)) / count(lit(1))).as("mae_naive"),
          sqrt(d18(eN * eN) / count(lit(1))).as("rmse_naive"),
          (d18(abs(eN) / col("close")) / count(lit(1))).as("mape_naive"),
          (d18(abs(eD)) / count(lit(1))).as("mae_drift"),
          sqrt(d18(eD * eD) / count(lit(1))).as("rmse_drift"),
          (d18(abs(eD) / col("close")) / count(lit(1))).as("mape_drift"))
        .select(col("l_returnflag"), col("n"),
          r4(col("mae_naive")).as("mae_naive"),
          r4(col("rmse_naive")).as("rmse_naive"),
          r6(col("mape_naive")).as("mape_naive"),
          r4(col("mae_drift")).as("mae_drift"),
          r4(col("rmse_drift")).as("rmse_drift"),
          r6(col("mape_drift")).as("mape_drift"),
          r6(col("rmse_drift") / col("rmse_naive")).as("theil_ratio"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn
        FROM lineitem),
      cl AS (SELECT l_returnflag, day, l_extendedprice AS close
             FROM r WHERE rn = 1),
      lagged AS (
        SELECT l_returnflag, close,
               lag(close, 1) OVER w AS l1, lag(close, 2) OVER w AS l2
        FROM cl WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)),
      e AS (
        SELECT l_returnflag, close,
               close - l1 AS en,
               close - (l1 + (l1 - l2)) AS ed
        FROM lagged WHERE l2 IS NOT NULL),
      m AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(abs(en) AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*) AS mae_naive,
               sqrt(CAST(sum(CAST(en * en AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*)) AS rmse_naive,
               CAST(sum(CAST(abs(en) / close AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*) AS mape_naive,
               CAST(sum(CAST(abs(ed) AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*) AS mae_drift,
               sqrt(CAST(sum(CAST(ed * ed AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*)) AS rmse_drift,
               CAST(sum(CAST(abs(ed) / close AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*) AS mape_drift
        FROM e GROUP BY 1)
      SELECT l_returnflag, n,
             ${sqlR4("mae_naive")} AS mae_naive,
             ${sqlR4("rmse_naive")} AS rmse_naive,
             ${sqlR6("mape_naive")} AS mape_naive,
             ${sqlR4("mae_drift")} AS mae_drift,
             ${sqlR4("rmse_drift")} AS rmse_drift,
             ${sqlR6("mape_drift")} AS mape_drift,
             ${sqlR6("rmse_drift / rmse_naive")} AS theil_ratio
      FROM m ORDER BY l_returnflag""")
  )

  /** Time-under-water: the longest run of consecutive trading days below
    * the running peak close, per flag (the DURATION half of W7's
    * drawdown-depth readout — how long recovery took, which depth alone
    * doesn't show). Gaps-and-islands on the strict below-peak predicate:
    * island id = rn − rn_within(below), run length = island count.
    * Peak is a running max of SELECTED closes; every comparison and
    * count is integer-exact — no rounding anywhere. One window pass on
    * the calendar-bounded daily series.
    */
  val underwater = QueryDef(
    "q_f_underwater",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val below = dailyClose(s, dir)
        .withColumn("peak", max(col("close")).over(byDay))
        .withColumn("rn", row_number().over(byDay))
        .where(col("close") < col("peak"))
      val byRun = Window.partitionBy("l_returnflag").orderBy("rn")
      val runs = below
        .withColumn("grp", col("rn") - row_number().over(byRun))
        .groupBy(col("l_returnflag"), col("grp"))
        .agg(count(lit(1)).as("run_len"), max(col("day")).as("run_end"))
      val pick = Window.partitionBy("l_returnflag")
        .orderBy(col("run_len").desc, col("run_end"))
      runs
        .withColumn("n_underwater",
          sum(col("run_len")).over(Window.partitionBy("l_returnflag")))
        .withColumn("rk", row_number().over(pick))
        .where(col("rk") === 1)
        .select(col("l_returnflag"), col("n_underwater"),
          col("run_len").as("max_run"), col("run_end").as("max_run_end"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH r AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               l_extendedprice,
               row_number() OVER (
                 PARTITION BY l_returnflag, date_trunc('day', l_shipdate)
                 ORDER BY $liOrderDescSql) AS rn_t
        FROM lineitem),
      cl AS (SELECT l_returnflag, day, l_extendedprice AS close
             FROM r WHERE rn_t = 1),
      pk AS (
        SELECT l_returnflag, day, close,
               max(close) OVER (PARTITION BY l_returnflag ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY day)
                 AS rn
        FROM cl),
      below AS (
        SELECT l_returnflag, day, rn,
               rn - row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY rn) AS grp
        FROM pk WHERE close < peak),
      runs AS (
        SELECT l_returnflag, grp, count(*) AS run_len,
               max(day) AS run_end
        FROM below GROUP BY 1, 2),
      best AS (
        SELECT l_returnflag, run_len, run_end,
               sum(run_len) OVER (PARTITION BY l_returnflag)
                 AS n_underwater,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY run_len DESC, run_end) AS rk
        FROM runs)
      SELECT l_returnflag, CAST(n_underwater AS BIGINT) AS n_underwater,
             CAST(run_len AS BIGINT) AS max_run, run_end AS max_run_end
      FROM best WHERE rk = 1 ORDER BY l_returnflag""")
  )

  /** Engle–Granger cointegration step 1+2 (1987) on the A/R daily mean
    * pair — the pairs-trading/spread-monitoring primitive: OLS
    * y_A = α + β·y_R from exact decimal moments (the q_m1 contract,
    * decD exits since Σxy's scaled integer tops 2^53), then the
    * RESIDUAL spread's AR(1) coefficient ρ = Σe·e₋₁/Σe₋₁² from exact
    * decimal sums of identical per-row products — ρ far below 1 is the
    * mean-reversion signal (the full ADF p-value needs response-surface
    * tables; ρ is the statistic it is built from). One day-aligned
    * join, two moment aggregates, a 1-row broadcast.
    */
  val coint = QueryDef(
    "q_f_coint",
    (s, dir) => {
      def series(flag: String, out: String) =
        t(s, dir, "lineitem").filter(col("l_returnflag") === flag)
          .withColumn("day",
            date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
          .groupBy("day")
          .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double") / count(lit(1))).as(out))
      val pair = series("A", "ya").join(series("R", "xr"), Seq("day"))
      val mom = broadcast(pair.agg(
        count(lit(1)).as("n"),
        decD(sum(col("xr").cast("decimal(38,6)"))).as("sx"),
        decD(sum(col("ya").cast("decimal(38,6)"))).as("sy"),
        decD(sum((col("xr") * col("xr")).cast("decimal(38,6)")))
          .as("sxx"),
        decD(sum((col("xr") * col("ya")).cast("decimal(38,6)")))
          .as("sxy")))
      val nD = col("n").cast("double")
      val betaC = (nD * col("sxy") - col("sx") * col("sy")) /
        (nD * col("sxx") - col("sx") * col("sx"))
      val withModel = pair.crossJoin(mom)
        .withColumn("beta", betaC)
        .withColumn("alpha", (col("sy") - col("beta") * col("sx")) / nD)
        .withColumn("e",
          col("ya") - (col("alpha") + col("beta") * col("xr")))
        .withColumn("e1", lag(col("e"), 1).over(Window.orderBy("day")))
      withModel.agg(
          max(col("n")).as("n_days"),
          r2(max(col("alpha"))).as("alpha"),
          r6(max(col("beta"))).as("beta"),
          r6(decD(sum((col("e") * col("e1")).cast("decimal(38,6)"))) /
            decD(sum((col("e1") * col("e1")).cast("decimal(38,6)"))))
            .as("resid_ar1"))
    },
    Some(s"""
      WITH da AS (
        SELECT date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                 AS DOUBLE) / count(*) AS ya
        FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
      dr AS (
        SELECT date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                 AS DOUBLE) / count(*) AS xr
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      pair AS (SELECT da.day, ya, xr FROM da JOIN dr USING (day)),
      mom AS (
        SELECT count(*) AS n,
               ${sqlDecD("sum(CAST(xr AS DECIMAL(38,6)))")} AS sx,
               ${sqlDecD("sum(CAST(ya AS DECIMAL(38,6)))")} AS sy,
               ${sqlDecD("sum(CAST(xr * xr AS DECIMAL(38,6)))")} AS sxx,
               ${sqlDecD("sum(CAST(xr * ya AS DECIMAL(38,6)))")} AS sxy
        FROM pair),
      md AS (
        SELECT n, sx, sy,
               (CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx) AS beta
        FROM mom),
      m2 AS (
        SELECT n, beta, (sy - beta * sx) / CAST(n AS DOUBLE) AS alpha
        FROM md),
      res AS (
        SELECT pair.day, ya - (alpha + beta * xr) AS e, n, alpha, beta
        FROM pair CROSS JOIN m2),
      rl AS (
        SELECT n, alpha, beta, e,
               lag(e, 1) OVER (ORDER BY day) AS e1
        FROM res)
      SELECT CAST(max(n) AS BIGINT) AS n_days,
             ${sqlR2("max(alpha)")} AS alpha,
             ${sqlR6("max(beta)")} AS beta,
             ${sqlR6(s"${sqlDecD("sum(CAST(e * e1 AS DECIMAL(38,6)))")}" +
        s" / ${sqlDecD("sum(CAST(e1 * e1 AS DECIMAL(38,6)))")}")}
               AS resid_ar1
      FROM rl""")
  )

  /** Markowitz minimum-variance two-asset portfolio (closed form:
    * w_A = (σ_R² − σ_AR)/(σ_A² + σ_R² − 2σ_AR)) over the A/R daily
    * price series paired by day — the allocation primitive behind
    * risk-parity dashboards, and the covariance consumer that pairs
    * with q_a12's matrix. Moments are EXACT decimal sums (Σy, Σy²,
    * Σ y_A·y_R — the Welch idiom), so variances/covariance compose in
    * double from identical operands in a pinned order; the weight takes
    * r6 and the portfolio variance/diversification ratio derive from the
    * ROUNDED weight. One shuffle (daily groupBy), one day-key join, one
    * global aggregate.
    */
  val minVar = QueryDef(
    "q_f_minvar",
    (s, dir) => {
      def s18(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,6)")).cast("double")
      val daily = t(s, dir, "lineitem")
        .where(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag"),
          col("l_shipdate").cast("date").as("day"), col("l_extendedprice"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
      val a = daily.where(col("l_returnflag") === "A")
        .select(col("day"), col("y").as("ya"))
      val r = daily.where(col("l_returnflag") === "R")
        .select(col("day"), col("y").as("yr"))
      val g = a.join(r, "day")
        .agg(count(lit(1)).as("n"),
          s18(col("ya")).as("sa"), s18(col("yr")).as("sr"),
          s18(col("ya") * col("ya")).as("saa"),
          s18(col("yr") * col("yr")).as("srr"),
          s18(col("ya") * col("yr")).as("sar"))
      val nD = col("n").cast("double")
      val va = (col("saa") - col("sa") * col("sa") / nD) / nD
      val vr = (col("srr") - col("sr") * col("sr") / nD) / nD
      val cab = (col("sar") - col("sa") * col("sr") / nD) / nD
      val waR = r6((vr - cab) / (va + vr - lit(2.0) * cab))
      val wrR = lit(1.0) - waR
      val pv = (waR * waR * va + wrR * wrR * vr) +
        lit(2.0) * waR * wrR * cab
      g.select(col("n").as("n_days"), waR.as("w_a"), wrR.as("w_r"),
        r2(pv).as("port_var"),
        r6(lit(1.0) - pv / least(va, vr)).as("var_reduction"))
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2),
      j AS (
        SELECT a.day, a.y AS ya, r.y AS yr
        FROM (SELECT * FROM daily WHERE l_returnflag = 'A') a
        JOIN (SELECT * FROM daily WHERE l_returnflag = 'R') r
          USING (day)),
      g AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(ya AS DECIMAL(38,6))) AS DOUBLE) AS sa,
               CAST(sum(CAST(yr AS DECIMAL(38,6))) AS DOUBLE) AS sr,
               CAST(sum(CAST(ya * ya AS DECIMAL(38,6))) AS DOUBLE) AS saa,
               CAST(sum(CAST(yr * yr AS DECIMAL(38,6))) AS DOUBLE) AS srr,
               CAST(sum(CAST(ya * yr AS DECIMAL(38,6))) AS DOUBLE) AS sar
        FROM j),
      v AS (
        SELECT n,
               (saa - sa * sa / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS va,
               (srr - sr * sr / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS vr,
               (sar - sa * sr / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS cab
        FROM g),
      w AS (
        SELECT n, va, vr, cab,
               ${sqlR6("(vr - cab) / (va + vr - 2e0 * cab)")} AS w_a
        FROM v),
      p AS (
        SELECT n, va, vr, cab, w_a, 1e0 - w_a AS w_r,
               w_a * w_a * va + (1e0 - w_a) * (1e0 - w_a) * vr
                 + 2e0 * w_a * (1e0 - w_a) * cab AS pv
        FROM w)
      SELECT CAST(n AS BIGINT) AS n_days, w_a, w_r,
             ${sqlR2("pv")} AS port_var,
             ${sqlR6("1e0 - pv / least(va, vr)")} AS var_reduction
      FROM p""")
  )

  /** XmR (individuals + moving range) control chart — the SPC monitor a
    * data-quality pipeline puts on any daily metric: center = mean(y),
    * limits = center ± 2.66·mean(|Δy|) (the classic Shewhart individuals
    * constant), breach census per side. mean(y) and mean(mR) are EXACT
    * decimal sums over the daily series, the limits a pinned IEEE chain,
    * and breach comparisons run raw-double vs raw-limit (identical
    * operands both engines). One window pass for Δy, two aggregates.
    */
  val xmr = QueryDef(
    "q_f_xmr",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          date_trunc("day", col("l_shipdate")).as("day"),
          col("l_extendedprice"))
        .groupBy("flag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
      val w = Window.partitionBy("flag").orderBy("day")
      val withMr = daily
        .withColumn("mr", abs(col("y") - lag(col("y"), 1).over(w)))
      val stats = withMr.groupBy("flag")
        .agg(count(lit(1)).as("n_days"),
          (sum(col("y").cast("decimal(38,6)")).cast("double")
            / count(lit(1))).as("center"),
          (sum(col("mr").cast("decimal(38,6)")).cast("double")
            / count(col("mr"))).as("mrbar"))
        .withColumn("ucl", col("center") + lit(2.66) * col("mrbar"))
        .withColumn("lcl", col("center") - lit(2.66) * col("mrbar"))
      withMr.join(broadcast(stats), Seq("flag"))
        .groupBy(col("flag"), col("n_days"), col("center"), col("ucl"),
          col("lcl"))
        .agg(sum(when(col("y") > col("ucl"), 1L).otherwise(0L))
          .as("n_above"),
          sum(when(col("y") < col("lcl"), 1L).otherwise(0L)).as("n_below"))
        .select(col("flag"), col("n_days"), r2(col("center")).as("center"),
          r2(col("ucl")).as("ucl"), r2(col("lcl")).as("lcl"),
          col("n_above"), col("n_below"))
        .orderBy("flag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      d AS (
        SELECT flag, y,
               abs(y - lag(y, 1) OVER (PARTITION BY flag ORDER BY day))
                 AS mr
        FROM daily),
      st AS (
        SELECT flag, count(*) AS n_days,
               CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / count(*)
                 AS center,
               CAST(sum(CAST(mr AS DECIMAL(38,6))) AS DOUBLE) / count(mr)
                 AS mrbar
        FROM d GROUP BY 1),
      li AS (
        SELECT flag, n_days, center,
               center + 2.66e0 * mrbar AS ucl,
               center - 2.66e0 * mrbar AS lcl
        FROM st)
      SELECT d.flag, li.n_days, ${sqlR2("li.center")} AS center,
             ${sqlR2("li.ucl")} AS ucl, ${sqlR2("li.lcl")} AS lcl,
             CAST(sum(CASE WHEN d.y > li.ucl THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above,
             CAST(sum(CASE WHEN d.y < li.lcl THEN 1 ELSE 0 END) AS BIGINT)
               AS n_below
      FROM d JOIN li ON li.flag = d.flag
      GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""")
  )

  /** Omega ratio at threshold 0 — the gain/loss probability-weighted ratio
    * Σ max(ret,0) / Σ max(−ret,0) over the per-flag daily return series
    * (same series as sortino). Unlike Sharpe/Sortino it uses the WHOLE
    * return distribution, no moment assumptions. Per-row returns are
    * pinned doubles; both one-sided sums are exact DECIMAL(38,18)
    * accumulations, so partitioning order can't move the ratio.
    */
  val omega = QueryDef(
    "q_f_omega",
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
      rets.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_days"),
          sum(greatest(col("ret"), lit(0.0)).cast("decimal(38,18)"))
            .cast("double").as("gain_sum"),
          sum(greatest(-col("ret"), lit(0.0)).cast("decimal(38,18)"))
            .cast("double").as("loss_sum"))
        .select(col("l_returnflag"), col("n_days"),
          r6(col("gain_sum")).as("gain_sum"),
          r6(col("loss_sum")).as("loss_sum"),
          r6(col("gain_sum") / col("loss_sum")).as("omega"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      rets AS (
        SELECT l_returnflag,
               y / lag(y, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 - 1 AS ret
        FROM daily),
      m AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CAST(greatest(ret, 0e0) AS DECIMAL(38,18)))
                 AS DOUBLE) AS gain_sum,
               CAST(sum(CAST(greatest(-ret, 0e0) AS DECIMAL(38,18)))
                 AS DOUBLE) AS loss_sum
        FROM rets WHERE ret IS NOT NULL GROUP BY 1)
      SELECT l_returnflag, n_days,
             ${sqlR6("gain_sum")} AS gain_sum,
             ${sqlR6("loss_sum")} AS loss_sum,
             ${sqlR6("gain_sum / loss_sum")} AS omega
      FROM m ORDER BY l_returnflag""")
  )

  /** Amihud (2002) illiquidity: mean of |daily return| per dollar of
    * daily volume, scaled ×10¹² to a readable magnitude. Volume is an
    * exact integer cents sum; each day's term is one pinned chain
    * (|ret| ÷ exact-long-as-double × 2⁺-exact literal); the mean is the
    * exact DECIMAL(38,18) average, so day order can't move it.
    */
  val amihud = QueryDef(
    "q_f_amihud",
    (s, dir) => {
      val byDay = Window.partitionBy("l_returnflag").orderBy("day")
      val daily = t(s, dir, "lineitem")
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"),
          sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .as("vol_cents"))
      val rets = daily
        .withColumn("ret", col("y") / lag(col("y"), 1).over(byDay) - 1)
        .where(col("ret").isNotNull)
      rets.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_days"),
          sum(col("vol_cents")).as("sum_vol_cents"),
          r6(avgE18(abs(col("ret")) / col("vol_cents").cast("double")
            * lit(1e12))).as("amihud_e12"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS vol_cents
        FROM lineitem GROUP BY 1, 2),
      rets AS (
        SELECT l_returnflag, vol_cents,
               y / lag(y, 1) OVER (PARTITION BY l_returnflag ORDER BY day)
                 - 1 AS ret
        FROM daily)
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(vol_cents) AS BIGINT) AS sum_vol_cents,
             ${sqlR6(sqlAvgE18(
      "abs(ret) / CAST(vol_cents AS DOUBLE) * 1e12"))} AS amihud_e12
      FROM rets WHERE ret IS NOT NULL GROUP BY 1
      ORDER BY l_returnflag""")
  )

  /** Parkinson (1980) range-based volatility: σ² = Σ ln(Hᵢ/Lᵢ)² /(4·ln2·n)
    * over weekly high/low of the daily mean price — ~5× more efficient per
    * observation than close-to-close variance because it uses the intraweek
    * RANGE. H and L are exact max/min of pinned daily doubles; each weekly
    * term is one pinned ln chain (decimal-summed, r6 — the entropy
    * argument); 4·ln2 is constant-folded to the same correctly-rounded
    * double in both engines.
    */
  val parkinson = QueryDef(
    "q_f_parkinson",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .withColumn("day",
          date_trunc("day", col("l_shipdate")).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "day")
        .agg((sum(col("l_extendedprice").cast("decimal(28,6)"))
          .cast("double") / count(lit(1))).as("y"))
      val weekly = daily
        .withColumn("week", date_trunc("week", col("day")))
        .groupBy("l_returnflag", "week")
        .agg(max(col("y")).as("h"), min(col("y")).as("l"))
        .where(col("l") > 0.0)
      val term = log(col("h") / col("l")) * log(col("h") / col("l"))
      weekly.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_weeks"),
          (sum(term.cast("decimal(38,18)")).cast("double")
            / (lit(4.0) * log(lit(2.0)) * count(lit(1)).cast("double")))
            .as("pvar"))
        .select(col("l_returnflag"), col("n_weeks"),
          r6(col("pvar")).as("parkinson_var"),
          r6(sqrt(col("pvar"))).as("parkinson_vol"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      WITH daily AS (
        SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS y
        FROM lineitem GROUP BY 1, 2),
      weekly AS (
        SELECT l_returnflag, date_trunc('week', day) AS week,
               max(y) AS h, min(y) AS l
        FROM daily GROUP BY 1, 2),
      m AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_weeks,
               CAST(sum(CAST(ln(h / l) * ln(h / l) AS DECIMAL(38,18)))
                   AS DOUBLE)
                 / (4e0 * ln(2e0) * CAST(count(*) AS DOUBLE)) AS pvar
        FROM weekly WHERE l > 0e0 GROUP BY 1)
      SELECT l_returnflag, n_weeks,
             ${sqlR6("pvar")} AS parkinson_var,
             ${sqlR6("sqrt(pvar)")} AS parkinson_vol
      FROM m ORDER BY l_returnflag""")
  )

  val all: Seq[QueryDef] =
    Seq(ohlcWeekly, bollinger, beta, ffill, rsi, macd, streaks, obv,
      stochastic, acf, seasonality, interp, varEs, holt, ar2, holtWinters,
      dw, kalman, sortino, garch, forecastAcc, underwater, coint, minVar,
      xmr, omega, amihud, parkinson)
}
