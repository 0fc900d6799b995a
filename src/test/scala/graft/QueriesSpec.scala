package graft

/** Smoke: every registered query runs on sf0.001 and returns rows; every
  * oracle key exists in queries. (Value-level checking is the driver's
  * DuckDB compare — mirrored locally by tools/check_oracle.py at sf0.01.)
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001 with rows") {
      val df = fn(spark, sfSmoke)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
