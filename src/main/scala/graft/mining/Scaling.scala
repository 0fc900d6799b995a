package graft.mining

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W9 (reference: datamining_analysis.py:73-75, sklearn StandardScaler):
  * global z-scaling with POPULATION stddev (ddof=0), unlike pandas .std().
  *
  * Implemented as a 1-row aggregate broadcast-joined back — not a global
  * window, which would funnel all rows through one partition at scale.
  */
object Scaling {

  def standardize(df: DataFrame, cols: Seq[String],
      suffix: String = "_z"): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"__mu_$c"), stddev_pop(col(c)).as(s"__sd_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(joined) { (d, c) =>
      // sklearn's _handle_zeros_in_scale: a zero-variance feature divides
      // by 1, not 0 — constant columns standardize to 0.0, never NaN/null
      val sd = when(col(s"__sd_$c") === 0, lit(1.0))
        .otherwise(col(s"__sd_$c"))
      d.withColumn(s"$c$suffix", (col(c) - col(s"__mu_$c")) / sd)
    }
    scaled.drop(cols.flatMap(c => Seq(s"__mu_$c", s"__sd_$c")): _*)
  }
}
