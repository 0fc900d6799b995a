package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    *
    * Contract: the change batch must hold AT MOST ONE row per business key —
    * several rows per key would insert several open (`valid_to IS NULL`)
    * versions, breaking the one-current-row-per-key SCD2 invariant. CDC
    * feeds routinely violate this, so either pass `seqCol` (a change-order
    * column, e.g. the CDC log sequence number) and the batch is reduced
    * latest-wins per key before the merge, or leave it unset and the batch
    * is VALIDATED (one aggregate over the delta — cheap next to the merge)
    * and a duplicate key fails fast instead of corrupting the dimension.
    */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCols: Seq[String],
      ts: Long, broadcastChanges: Boolean = true,
      seqCol: Option[String] = None): DataFrame = {
    val attrCols = dim.columns.filterNot(
      c => c == "valid_from" || c == "valid_to").toSeq
    val batch = seqCol match {
      case Some(sc) =>
        // latest-wins per key; the window shuffles on the business key
        // (high cardinality), so this parallelizes like the join itself
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(sc).desc)
        changes.withColumn("__scd_rn", row_number().over(w))
          .filter(col("__scd_rn") === 1).drop("__scd_rn")
      case None =>
        val dup = changes.groupBy(keyCols.map(col): _*)
          .count().filter(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"change batch has multiple rows for key ${dup.headOption} — " +
            "pass seqCol to reduce latest-wins, or dedupe upstream")
        changes
    }
    val changedKeys0 = batch.select(keyCols.map(col): _*).distinct()
    val changedKeys = if (broadcastChanges) broadcast(changedKeys0)
      else changedKeys0
    val closed = dim.filter(col("valid_to").isNull)
      .join(changedKeys, keyCols, "left_semi")
      .withColumn("valid_to", lit(ts))
    val untouched = dim.filter(col("valid_to").isNotNull)
      .unionByName(dim.filter(col("valid_to").isNull)
        .join(changedKeys, keyCols, "left_anti"))
    val inserted = batch.select(attrCols.map(col): _*)
      .withColumn("valid_from", lit(ts))
      .withColumn("valid_to", lit(null).cast("long"))
    untouched.unionByName(closed).unionByName(inserted)
  }
}
