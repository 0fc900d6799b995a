package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8: JDBC fact-table persistence — the reference's commented-out MySQL
  * `stock_fact` path (preprocess_stocks.py:221-225, `df.to_sql(...)`),
  * expressed as Spark's parallel JDBC writer. Dormant in the reference and
  * dormant here by default: EtlMain enables it only when
  * `SPARK_GRAFT_JDBC_URL` is set.
  *
  * Scale note: `df.write.jdbc` writes one connection per partition in
  * parallel — `numPartitions` caps the connection count so a 1000-executor
  * job can't open 1000 sessions against one database. For genuinely large
  * facts the warehouse-native bulk path (parquet + COPY) beats row-wise
  * JDBC; this sink is the reference-parity surface, not the 100 TB one.
  */
object JdbcSink {

  private def props(user: Option[String], password: Option[String],
      driver: Option[String]): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Write `df` as `table`, bounding parallel connections.
    * `columnTypes` maps to Spark's `createTableColumnTypes` — needed when
    * the dialect's default string mapping is non-comparable (e.g. Derby
    * maps StringType to CLOB, which rejects `WHERE ticker = '...'`).
    */
  def writeTable(df: DataFrame, url: String, table: String,
      mode: String = "overwrite", user: Option[String] = None,
      password: Option[String] = None, driver: Option[String] = None,
      numPartitions: Int = 8, columnTypes: Option[String] = None): Unit = {
    val w = df.coalesce(math.min(numPartitions, df.rdd.getNumPartitions).max(1))
      .write.mode(mode)
    columnTypes.foreach(w.option("createTableColumnTypes", _))
    w.jdbc(url, table, props(user, password, driver))
  }

  /** Read `table` back (round-trip check surface). */
  def readTable(spark: SparkSession, url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, props(user, password, driver))
}
