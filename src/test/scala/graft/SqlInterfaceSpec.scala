package graft

import graft.sources.Tables

/** The engine's SQL front door: the same analytics expressed as SQL text
  * over registered views must equal the DataFrame catalog results.
  */
class SqlInterfaceSpec extends SparkSpec {

  test("spark.sql over registered views equals the DataFrame catalog") {
    Tables.registerAll(spark, sfSmoke)
    val sqlDf = spark.sql("""
      SELECT l_returnflag, l_linestatus,
             floor(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)*1e2+0.5)/1e2 AS sum_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      GROUP BY 1, 2 ORDER BY 1, 2""")
    val catalog = SparkEntry.queries("q1_pricing_summary")(spark, sfSmoke)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assertSameData(sqlDf, catalog.toDF(sqlDf.columns.toSeq: _*),
      Seq("l_returnflag", "l_linestatus"))
  }

  test("SQL window + join text queries run over the views") {
    Tables.registerAll(spark, sfSmoke)
    val n = spark.sql("""
      SELECT o_custkey, o_orderkey,
             lead(o_totalprice, 1) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nxt
      FROM orders JOIN customer ON o_custkey = c_custkey""").count()
    assert(n > 0)
  }
}
