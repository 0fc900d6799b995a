package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — the second operator Spark lacks a
  * fast native plan for: `point ∈ [lo, hi)` compiles to a broadcast
  * nested-loop (O(n·m)) in stock Spark.
  *
  * Bucketed formulation: intervals explode into the fixed-width buckets
  * they cover, points hash into their bucket, the join becomes an
  * EQUI-join on the bucket id, and the exact containment predicate filters
  * the bounded candidate set. With bucketWidth ≈ typical interval width,
  * each interval lands in ≤ 2 buckets — candidate volume is
  * O(points + intervals·2 + matches), one hash shuffle, no nested loop.
  */
object RangeJoin {

  /** Join `points` (value `pCol`) to `intervals` ([`loCol`, `hiCol`)):
    * output = point row ++ interval row for every containment.
    */
  def bucketedRangeJoin(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val p = points.withColumn("__b",
      floor(col(pCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__b",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__b"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__b")
  }
}
