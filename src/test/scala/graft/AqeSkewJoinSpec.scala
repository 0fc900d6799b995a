package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE runtime skew handling — the engine's THIRD skew discipline next to
  * explicit salting (plans.SkewJoin, q_j_salted) and broadcast routing:
  * prove that with adaptive execution on, a sort-merge join whose build
  * data is pathologically hot on one key gets its skewed partition SPLIT
  * at runtime (OptimizeSkewedJoin marks the join `isSkewJoin`), and that
  * the split join returns exactly the plain join's result. This is the
  * mechanism a 1000-executor cluster leans on when a salt key wasn't
  * designed in — the spec pins that our session configs don't break it
  * and documents the thresholds that make it fire.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join at runtime " +
    "and preserves the exact join result") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: production defaults (256 MB / factor 5)
      // scaled down so a ~MB hot partition counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // keep AQE from converting the SMJ to broadcast before the skew
      // rule can see it
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of fact rows share key 1 → one hot shuffle partition; the
      // payload pads row bytes so the hot partition clears the threshold
      val fact = spark.range(0, 20000)
        .select(
          when(col("id") % 10 === 0, (col("id") % 7 + 2))
            .otherwise(lit(1L)).as("k"),
          col("id").as("row_id"),
          concat(lit("p" * 64), col("id").cast("string")).as("payload"))
      val dim = (1 to 8).flatMap(k => (1 to 5).map(r => (k.toLong, r)))
        .toDF("k", "r")
      val joined = fact.join(dim, "k").select("k", "row_id", "r")
      // collect() executes THIS dataset's queryExecution — a count() would
      // build and adaptively plan a DIFFERENT query, leaving joined's
      // AdaptiveSparkPlanExec un-finalized and the assertion vacuous
      val rows = joined.collect()

      // the final adaptive plan must contain a skew-split SMJ
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // assert on the rendered plan: QueryStageExec wrappers are leaf
      // nodes, so a tree collect would not cross into the reused stages
      val rendered = finalPlan.toString
      assert(rendered.contains("SortMergeJoin"),
        s"expected a sort-merge join, got:\n$rendered")
      assert(rendered.contains("SortMergeJoin(skew=true)"),
        s"OptimizeSkewedJoin did not split the hot partition:\n$rendered")
      assert(rendered.contains("AQEShuffleRead") &&
        rendered.contains("skewed"),
        s"no skewed AQE shuffle read in:\n$rendered")

      // exactness: every fact row matches its key's 5 dim rows
      assert(rows.length == 20000 * 5,
        s"skew-split join lost/invented rows: ${rows.length}")
      val perKey = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
      assert(perKey(1L) == 18000 * 5, s"hot key rows: ${perKey(1L)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
