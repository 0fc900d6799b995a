package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for co-located joins (builder brief: "bucketing
  * for co-located joins"). Writing both sides bucketed+sorted on the join
  * key lets a sort-merge join read bucket-aligned files with NO shuffle
  * exchange and NO sort — at 100 TB the difference between a join that
  * moves every byte and one that moves none. BucketedJoinSpec asserts the
  * exchange-free plan.
  */
object BucketedTables {

  /** Persist `df` as a bucketed, per-bucket-sorted managed parquet table
    * (in-memory catalog; warehouse under spark.sql.warehouse.dir).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keyCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Co-located equi-join of two same-bucketed tables — with bucketing on,
    * the planner elides both exchanges (and both sorts when sortBy matches
    * the join key).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
