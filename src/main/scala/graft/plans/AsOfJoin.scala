package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical time-series operator Spark lacks: attach to
  * each left row the most recent right row with the same key and
  * right.time ≤ left.time (financial "latest quote at trade time").
  *
  * Spark-first formulation (charter preference (a): compose built-ins
  * before custom plans): tag and union both sides, sort per key by
  * (time, tag) — right rows before left rows at equal timestamps so
  * equality matches — and carry the right payload forward with
  * last(ignoreNulls) over an unbounded-preceding ROWS frame; keep the left
  * rows. One shuffle on the key, streaming frame, no point-in-time
  * self-join blowup. Right side must be unique per (key, time) — pre-
  * aggregate if not (see queries.MiscCatalog.qAsof).
  */
object AsOfJoin {

  /** @param keys        equi-join key columns (same names both sides)
    * @param leftTime    left ordering column name
    * @param rightTime   right ordering column name
    * @param rightVals   right payload columns to carry; appear in the
    *                    output as asof_<name>
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    val r0 = right.select((keys :+ rightTime).map(col) ++
      rightVals.map(v => col(v).as(s"__r_$v")): _*)
    val r = r0
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .drop(rightTime)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightVals.foldLeft(unioned)((d, v) =>
      d.withColumn(s"asof_$v", last(col(s"__r_$v"), ignoreNulls = true).over(w)))
    carried.filter(col("__tag") === 1)
      .drop("__t" +: "__tag" +: rightVals.map(v => s"__r_$v"): _*)
  }
}
