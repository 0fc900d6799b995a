package graft.queries

import org.apache.spark.sql.functions._

import QueryDef._

/** Testdata twins of the reference's join/set family (SURVEY §2.4 J1–J4,
  * §2.8) plus the standard join shapes a complete engine must cover
  * (inner/semi/anti over the star schema).
  *
  * Scale notes: dimension sides (region/nation/supplier/customer-stats) are
  * broadcast explicitly; the one fact⋈fact join (lineitem⋈orders) shuffles
  * on the join key and AQE handles skew/size at runtime.
  */
object JoinCatalog {

  /** J1 (datavisualization.py:760-766): per-group stats joined back onto
    * rows to flag outliers — a broadcast left join of an aggregate.
    */
  val j1SpikeJoin = QueryDef(
    "q_j1_spike_join",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val stats = o.groupBy("o_custkey").agg(
        avg("o_totalprice").as("mean_price"),
        stddev_samp(col("o_totalprice")).as("std_price"))
      o.join(broadcast(stats), Seq("o_custkey"), "left")
        .select(col("o_orderkey"),
          (col("o_totalprice") > col("mean_price") + col("std_price") * 2)
            .cast("long").as("is_spike"))
        .orderBy("o_orderkey")
    },
    Some("""
      WITH stats AS (
        SELECT o_custkey, avg(o_totalprice) AS mean_price,
               stddev_samp(o_totalprice) AS std_price
        FROM orders GROUP BY 1)
      SELECT o.o_orderkey,
             CAST(o.o_totalprice > s.mean_price + 2 * s.std_price AS BIGINT) AS is_spike
      FROM orders o LEFT JOIN stats s ON o.o_custkey = s.o_custkey
      ORDER BY o.o_orderkey""")
  )

  /** J2 (preprocess_stocks.py:211 pd.concat sort=False): union by name with
    * missing columns null-filled.
    */
  val j2Union = QueryDef(
    "q_j2_union",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_totalprice"))
      val b = o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      a.unionByName(b, allowMissingColumns = true).orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE year(o_orderdate) = 1995
      UNION ALL BY NAME
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE year(o_orderdate) = 1996
      ORDER BY o_orderkey""")
  )

  /** TPC-H Q5-shaped star join: revenue per nation for one region+year.
    * region→nation→customer are broadcast; the lineitem⋈orders shuffle is
    * the only large exchange.
    */
  val jStarRevenue = QueryDef(
    "q_j5_star_revenue",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val o = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey", "o_custkey")
      val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = t(s, dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(r2(sumE(col("rev"))).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), col("n_name"))
    },
    Some(s"""
      SELECT n.n_name,
             ${sqlR2(sqlSumE("l.l_extendedprice * (1 - l.l_discount)"))} AS revenue,
             count(*) AS n_items
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1996
      GROUP BY 1 ORDER BY revenue DESC, n_name""")
  )

  /** Left-semi join: customers having at least one finished order. */
  val jSemi = QueryDef(
    "q_j_semi",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      ORDER BY c_custkey""")
  )

  /** Left-anti join: customers with no 1995 orders. */
  val jAnti = QueryDef(
    "q_j_anti",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND year(o.o_orderdate) = 1995)
      ORDER BY c_custkey""")
  )

  /** Salted skew join (plans.SkewJoin): lineitem ⋈ part fanned out over 8
    * salt sub-keys — the explicit-salting path for keys too hot for AQE's
    * skew split. The oracle is the plain equi-join, so the gate proves
    * salting is result-invariant (spread + replicate changes the shuffle
    * layout, never the join semantics).
    */
  val jSalted = QueryDef(
    "q_j_salted",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val p = t(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.plans.SkewJoin.saltedJoin(li, p, "l_partkey", "l_orderkey",
          saltCount = 8)
        .groupBy("p_brand")
        .agg(r2(sumE(col("rev"))).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },
    Some(s"""
      SELECT p.p_brand,
             ${sqlR2(sqlSumE("l.l_extendedprice * (1 - l.l_discount)"))} AS revenue,
             count(*) AS n_items
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1 ORDER BY p_brand""")
  )

  /** Bloom-prefiltered semi join (plans.BloomJoin): lineitem rows whose
    * order shipped in 1996-Q1 (selective dim side), revenue per return
    * flag. The oracle is the PLAIN semi join + aggregate — the gate
    * proves the bloom prune + exact re-join is result-invariant, exactly
    * like the salted-join gate (layout/shuffle volume changes, semantics
    * don't).
    */
  val jBloom = QueryDef(
    "q_j_bloom",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996 &&
          quarter(col("o_orderdate")) === 1)
      graft.plans.BloomJoin.bloomSemiJoin(li, o, "l_orderkey", "o_orderkey",
          expectedItems = 100000L)
        .groupBy("l_returnflag")
        .agg(r2(sumE(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
             ${sqlR2(sqlSumE("l_extendedprice * (1 - l_discount)"))} AS revenue,
             count(*) AS n_items
      FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey
                      AND year(o.o_orderdate) = 1996
                      AND quarter(o.o_orderdate) = 1)
      GROUP BY 1 ORDER BY 1""")
  )

  /** TPC-H Q3 shape (shipping-priority): top 10 unshipped BUILDING-segment
    * orders by revenue as of a cutoff date — the canonical
    * filter-pushdown + star-join + top-k pattern (both date predicates
    * reach the scans; customer is the broadcast side; the top-k is a
    * TakeOrdered, not a global sort). Revenue is an exact decimal sum of
    * per-row price·(1−discount) doubles (identical per row), one r2.
    */
  val jQ3Shape = QueryDef(
    "q_j6_q3_shape",
    (s, dir) => {
      val cutoff = "1998-03-15"
      val c = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") < lit(cutoff))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = t(s, dir, "lineitem")
        .where(col("l_shipdate") > lit(cutoff))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(r2(sumE(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l.l_orderkey, o.o_orderdate,
             ${sqlR2(sqlSumE("l.l_extendedprice * (1.0e0 - l.l_discount)"))}
               AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < '1998-03-15'
        AND l.l_shipdate > '1998-03-15'
      GROUP BY 1, 2
      ORDER BY revenue DESC, l.l_orderkey LIMIT 10""")
  )

  /** TPC-H Q18 shape (large-volume customers): orders whose total
    * quantity exceeds a threshold, joined back to the customer — the
    * canonical aggregate-then-semi-join pattern: the HAVING aggregate
    * runs FIRST (integer sum, map-side combined), and only the few
    * surviving orderkeys ride the join back to orders/customer
    * (broadcast — the aggregate output is tiny by construction). All
    * integer quantities → exact.
    */
  val jQ18Shape = QueryDef(
    "q_j7_q18_shape",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .where(col("total_qty") > 250L)
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = t(s, dir, "customer").select("c_custkey", "c_name")
      o.join(broadcast(big), o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""
      WITH big AS (
        SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                 AS total_qty
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
      SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
             o.o_totalprice, big.total_qty
      FROM orders o
      JOIN big ON o.o_orderkey = big.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20""")
  )

  /** Bloom-filter FALSE-POSITIVE-RATE audit — the companion measurement
    * to q_j_bloom's pre-filtered join: build an m=4096-bit, k=3 Bloom
    * filter over the DISTINCT order custkeys relationally (position =
    * portable 60-bit md5 hash of `i#key` mod m — the repo's cross-engine
    * hash, computed by the native Md5Prefix60 expression), probe it with
    * every customer that has NO orders (anti-join — true non-members),
    * and count the keys whose probe positions are ALL set. Reports the
    * measured FPR next to the textbook expectation (s/m)^k from the
    * actual set-bit count — the calibration check a pipeline runs before
    * trusting a Bloom pre-filter at 100 TB. Everything is exact-integer
    * except two audited ratios (one division each + an explicit
    * cube, identical op order both engines, r6). Scale shape: the bit
    * table is bounded by m (broadcast), probes shuffle once on key.
    */
  val jBloomFpr = {
    val M = 4096
    val K = 3
    QueryDef(
      "q_j_bloom_fpr",
      (s, dir) => {
        import graft.functions.Md5Prefix60.md5Prefix60
        def positions(df: org.apache.spark.sql.DataFrame) =
          df.select(col("k"), explode(array(
            (1 to K).map(i => pmod(md5Prefix60(Seq(lit(i), col("k"))),
              lit(M.toLong))): _*)).as("pos"))
        val members = t(s, dir, "orders")
          .select(col("o_custkey").as("k")).distinct()
        val bits = positions(members).select("pos").distinct()
        val probes = t(s, dir, "customer")
          .select(col("c_custkey").as("k"))
          .join(members, Seq("k"), "left_anti")
        val probePos = positions(probes).distinct() // (k, pos) pairs
        val perKey = probePos
          .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
          .groupBy("k")
          .agg(count(lit(1)).as("n_pos"), sum(coalesce(col("hit"),
            lit(0))).as("n_hit"))
        val probeAgg = perKey.agg(
          count(lit(1)).as("n_probes"),
          sum(when(col("n_hit") === col("n_pos"), 1L).otherwise(0L))
            .as("n_fp"))
        val ratio = col("n_bits_set").cast("double") / lit(M.toDouble)
        broadcast(members.agg(count(lit(1)).as("n_members")))
          .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
          .crossJoin(broadcast(probeAgg))
          .select(col("n_members"), col("n_bits_set"), col("n_probes"),
            col("n_fp"),
            r6(col("n_fp").cast("double") / col("n_probes").cast("double"))
              .as("fpr"),
            r6(ratio * ratio * ratio).as("exp_fpr"))
      },
      Some {
        // the hash60 value is nonnegative, so plain % equals pmod
        def h(i: Int) = "(CAST(('0x' || substr(md5(" +
          s"'$i' || '#' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % $M)"
        s"""
        WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders),
        bits AS (
          SELECT DISTINCT pos FROM (
            ${(1 to K).map(i => s"SELECT ${h(i)} AS pos FROM members")
          .mkString("\n            UNION ALL ")})),
        probes AS (
          SELECT c_custkey AS k FROM customer
          WHERE c_custkey NOT IN (SELECT k FROM members)),
        ppos AS (
          SELECT DISTINCT k, pos FROM (
            ${(1 to K).map(i => s"SELECT k, ${h(i)} AS pos FROM probes")
          .mkString("\n            UNION ALL ")})),
        perkey AS (
          SELECT p.k, count(*) AS n_pos,
                 CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hit
          FROM ppos p LEFT JOIN bits b ON b.pos = p.pos
          GROUP BY 1),
        pa AS (
          SELECT CAST(count(*) AS BIGINT) AS n_probes,
                 CAST(sum(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_fp
          FROM perkey),
        ma AS (SELECT CAST(count(*) AS BIGINT) AS n_members FROM members),
        ba AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits)
        SELECT n_members, n_bits_set, n_probes, n_fp,
               ${sqlR6("CAST(n_fp AS DOUBLE) / CAST(n_probes AS DOUBLE)")}
                 AS fpr,
               ${sqlR6(s"(CAST(n_bits_set AS DOUBLE) / ${M.toDouble}e0)" +
          s" * (CAST(n_bits_set AS DOUBLE) / ${M.toDouble}e0)" +
          s" * (CAST(n_bits_set AS DOUBLE) / ${M.toDouble}e0)")} AS exp_fpr
        FROM ma CROSS JOIN ba CROSS JOIN pa"""
      }
    )
  }

  /** TPC-H Q5 shape — the LOCAL-supplier star: q_j5's four-dim star plus
    * the supplier dimension and Q5's distinguishing theta condition
    * `c_nationkey = s_nationkey` (revenue only counts when the customer's
    * nation supplied its own order), which no other join in the catalog
    * exercises: an equality between columns of two DIFFERENT broadcast
    * dimensions, resolved after both joins. Plan shape: one shuffle join
    * (lineitem ⋈ orders on orderkey, the only two big tables) and four
    * broadcast joins; the nation-nation filter is a post-broadcast
    * predicate, never a shuffle. Exact decimal revenue → r2.
    */
  val jQ5Shape = QueryDef(
    "q_j8_q5_local",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev"))
      val o = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey", "o_custkey")
      val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, dir, "nation")
        .select("n_nationkey", "n_regionkey", "n_name")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .filter(col("c_nationkey") === col("s_nationkey")) // Q5's theta
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(r2(sumE(col("rev"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), col("n_name"))
    },
    Some(s"""
      SELECT n.n_name,
             ${sqlR2(sqlSumE("l.l_extendedprice * (1 - l.l_discount)"))}
               AS revenue,
             count(*) AS n_items
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE c.c_nationkey = s.s_nationkey
        AND r.r_name = 'ASIA' AND year(o.o_orderdate) = 1996
      GROUP BY 1 ORDER BY revenue DESC, n_name""")
  )

  /** NULL-aware anti join — the `NOT IN (subquery)` three-valued-logic
    * trap, planned by Spark as a dedicated NullAwareAntiJoin (a plain
    * anti join would be WRONG): one NULL in the subquery makes every
    * `NOT IN` row UNKNOWN, so the with-null count must be exactly 0
    * while the clean count is the real anti-join count. Gated against
    * DuckDB evaluating the identical ANSI SQL — if either engine
    * "fixed" NOT IN into anti-join semantics the hash would break. The
    * null is planted deterministically (every 97th orderkey).
    */
  val jNotInNull = QueryDef(
    "q_j_not_in_null",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT
          (SELECT count(*) FROM v_customer WHERE c_custkey NOT IN
             (SELECT o_custkey FROM v_orders
              WHERE o_orderstatus = 'F')) AS n_clean,
          (SELECT count(*) FROM v_customer WHERE c_custkey NOT IN
             (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                          ELSE o_custkey END
              FROM v_orders WHERE o_orderstatus = 'F')) AS n_with_null""")
    },
    Some("""
      SELECT
        (SELECT count(*) FROM customer WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders
            WHERE o_orderstatus = 'F')) AS n_clean,
        (SELECT count(*) FROM customer WHERE c_custkey NOT IN
           (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_custkey END
            FROM orders WHERE o_orderstatus = 'F')) AS n_with_null""")
  )

  /** J9 capability: pure-inequality theta join — the ONE join shape with
    * no equi key at all, which Spark can only execute as a nested-loop
    * join. Both sides here are 1-aggregate-per-group tables (5 priorities
    * × 3 statuses), so the correct plan is BroadcastNestedLoopJoin with
    * the smaller side broadcast — at scale a non-equi join is only ever
    * viable when one side is tiny (or is first bucketed into a band
    * join, the plans.RangeJoin path); this gate pins the tiny-side
    * discipline. Exact decimal averages make the > comparison and the
    * published gap deterministic.
    */
  val jThetaBnlj = QueryDef(
    "q_j9_theta_bnlj",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val byPrio = o.groupBy(col("o_orderpriority").as("prio"))
        .agg(avgE(col("o_totalprice")).as("avg_p"))
      val byStatus = o.groupBy(col("o_orderstatus").as("status"))
        .agg(avgE(col("o_totalprice")).as("avg_s"))
      byPrio.join(broadcast(byStatus), col("avg_p") > col("avg_s"))
        .select(col("prio"), col("status"),
          r2(col("avg_p")).as("avg_p"), r2(col("avg_s")).as("avg_s"),
          r2(col("avg_p") - col("avg_s")).as("gap"))
        .orderBy("prio", "status")
    },
    Some(s"""
      WITH p AS (
        SELECT o_orderpriority AS prio,
               ${sqlAvgE("o_totalprice")} AS avg_p
        FROM orders GROUP BY 1),
      st AS (
        SELECT o_orderstatus AS status,
               ${sqlAvgE("o_totalprice")} AS avg_s
        FROM orders GROUP BY 1)
      SELECT prio, status, ${sqlR2("avg_p")} AS avg_p,
             ${sqlR2("avg_s")} AS avg_s,
             ${sqlR2("avg_p - avg_s")} AS gap
      FROM p JOIN st ON avg_p > avg_s
      ORDER BY prio, status""")
  )

  val all: Seq[QueryDef] =
    Seq(j1SpikeJoin, j2Union, jStarRevenue, jSemi, jAnti, jSalted, jBloom,
      jBloomFpr, jQ3Shape, jQ18Shape, jQ5Shape, jNotInNull, jThetaBnlj)
}
