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
      d.withColumn(s"$c$suffix", (col(c) - col(s"__mu_$c")) / col(s"__sd_$c"))
    }
    scaled.drop(cols.flatMap(c => Seq(s"__mu_$c", s"__sd_$c")): _*)
  }
}
