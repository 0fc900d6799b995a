package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the warehouse MERGE pattern a
  * dimension table needs once history matters: applying a batch of changed
  * rows closes each key's current version (`valid_to` = the change time)
  * and appends the new version (`valid_from` = the change time,
  * `valid_to` = NULL meaning "current").
  *
  * Scale design: one equi-join of the CURRENT slice against the change
  * batch on the business key (broadcast when the batch is small — the
  * typical nightly-delta shape) plus a union; closed history rows pass
  * through untouched, so the cost is proportional to the current slice,
  * never to accumulated history. No window over the full dimension.
  */
object Scd2 {

  /** Apply `changes` (business key + new attribute values) to `dim`
    * (same columns plus `valid_from`/`valid_to`) at time `ts`.
    * A key present in `changes` but not in `dim` is a plain insert.
    */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCols: Seq[String],
      ts: Long, broadcastChanges: Boolean = true): DataFrame = {
    val attrCols = dim.columns.filterNot(
      c => c == "valid_from" || c == "valid_to").toSeq
    val changedKeys0 = changes.select(keyCols.map(col): _*).distinct()
    val changedKeys = if (broadcastChanges) broadcast(changedKeys0)
      else changedKeys0
    val closed = dim.filter(col("valid_to").isNull)
      .join(changedKeys, keyCols, "left_semi")
      .withColumn("valid_to", lit(ts))
    val untouched = dim.filter(col("valid_to").isNotNull)
      .unionByName(dim.filter(col("valid_to").isNull)
        .join(changedKeys, keyCols, "left_anti"))
    val inserted = changes.select(attrCols.map(col): _*)
      .withColumn("valid_from", lit(ts))
      .withColumn("valid_to", lit(null).cast("long"))
    untouched.unionByName(closed).unionByName(inserted)
  }
}
