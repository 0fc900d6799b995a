package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table registry: registers every star-schema parquet as a temp
  * view so the whole catalog is reachable through plain `spark.sql(...)`
  * text — the SQL front door a warehouse user expects alongside the
  * DataFrame API (SqlInterfaceSpec proves DataFrame/SQL parity).
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables of `dir` as temp views (events needs the
    * nanosecond-timestamp read mode; see queries.EventsCatalog).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
  }
}
