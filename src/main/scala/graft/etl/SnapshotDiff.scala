package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the table-level change-data-capture audit: given two
  * snapshots of a keyed table, classify every business key as INSERT (new
  * in B), DELETE (gone from B), UPDATE (present in both, payload changed),
  * or UNCHANGED. The complement to [[Scd2]]/SCD1: those APPLY a known
  * change batch; this RECOVERS the change batch when upstream only ships
  * full snapshots (the classic nightly-full-extract integration shape),
  * and doubles as the migration/replica drift check.
  *
  * Scale design: ONE full-outer shuffle join on the business key — both
  * sides hash-partition by key, no broadcast of anything table-sized, no
  * window. Payloads travel as a single md5 fingerprint per row (computed
  * scan-side, so the shuffle carries 32 hex chars instead of the payload
  * width), and the caller passes STRING-typed portable payload columns
  * (cast numerics through DECIMAL first — raw double→string rendering is
  * engine-specific).
  */
object SnapshotDiff {

  /** Classify every key across the two snapshots. Returns the key columns
    * plus a `change` column ('insert' | 'delete' | 'update' |
    * 'unchanged'). Each side must hold at most one row per key (snapshot
    * semantics — enforce upstream).
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame, out: String) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("|", payloadCols.map(col): _*)).as(out): _*)
    fp(a, "__fpa").join(fp(b, "__fpb"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__fpa").isNull, lit("insert"))
          .when(col("__fpb").isNull, lit("delete"))
          .when(col("__fpa") === col("__fpb"), lit("unchanged"))
          .otherwise(lit("update")))
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
