package graft

import org.apache.spark.sql.functions._

import graft.etl.JdbcSink

/** S8 round-trip: the JDBC fact-table sink (the reference's dormant MySQL
  * `stock_fact` path) writes and reads back through an embedded in-memory
  * Derby database — the same `df.write.jdbc` surface a real warehouse URL
  * would use.
  */
class JdbcSinkSpec extends SparkSpec {

  test("cleaned fact table round-trips through a JDBC database") {
    val url = "jdbc:derby:memory:graft_s8;create=true"
    val cleaned = graft.etl.CleanPipeline.clean(spark, s"$refDir/stock_data")
    JdbcSink.writeTable(cleaned, url, "stock_fact", numPartitions = 2,
      columnTypes = Some("Ticker VARCHAR(16)"))
    val back = JdbcSink.readTable(spark, url, "stock_fact")
    assert(back.count() == 2585)
    assert(back.columns.sorted.toSeq == cleaned.columns.sorted.toSeq)
    // spot-check values survive the type mapping (date/double/long/string)
    val a = cleaned.filter(col("Ticker") === "HVN")
      .agg(sum("Volume"), avg("Close"), max("Date")).collect().head
    val b = back.filter(col("Ticker") === "HVN")
      .agg(sum("Volume"), avg("Close"), max("Date")).collect().head
    assert(a.getLong(0) == b.getLong(0))
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9)
    assert(a.getDate(2) == b.getDate(2))
  }

  test("append mode accumulates rows") {
    val url = "jdbc:derby:memory:graft_s8_append;create=true"
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    JdbcSink.writeTable(df, url, "t", numPartitions = 1)
    JdbcSink.writeTable(df, url, "t", mode = "append", numPartitions = 1)
    assert(JdbcSink.readTable(spark, url, "t").count() == 4)
  }
}
