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
    if (name == "events")
      // footer-driven read: ts lands as epoch-µs BIGINT whatever
      // timestamp unit the file carries (see sources.EventsTs)
      EventsTs.read(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables of `dir` as temp views. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
