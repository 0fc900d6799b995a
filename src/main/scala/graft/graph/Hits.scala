package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (Kleinberg, "Authoritative sources in a
  * hyperlinked environment", JACM 1999) as plain joins + aggregations —
  * the hub/authority decomposition for directed interaction graphs (the
  * complement to [[PageRank]]'s single importance score; on bipartite
  * buyer→seller graphs it separates "broad buyers" from "widely-bought
  * sellers").
  *
  * Exact integer formulation, same charter as PageRank: scores live in
  * integer units, each half-step is an integer sum over edges followed by
  * max-normalization via floor division `(raw · scale) div max(raw)` —
  * no floating point anywhere, so every iterate is bit-identical in any
  * engine (the property the DuckDB chained-CTE oracle replays). The
  * classic L2 normalization is replaced by max-normalization (also
  * standard, e.g. Langville & Meyer 2005 survey) because it stays in
  * exact integers; the fixed point's ORDERING is identical.
  *
  * Scale shape: each half-step is one equi-join of a narrow (node, score)
  * table against the edge list (shuffle on the join key) and one
  * map-side-combinable sum; the max is a 1-row broadcast. Overflow bound:
  * in-/out-degrees up to ~9·10¹⁸/scale are safe (scale=10⁶ → 9·10¹²).
  */
object Hits {

  /** `iterations` full hub→authority→hub rounds over directed `edges`
    * (cols: src, dst — longs). Returns (node, side, score): side 'h' rows
    * carry hub scores for source nodes, side 'a' rows carry authority
    * scores for destination nodes, both in integer `scale` units
    * (max-normalized each half-step, so the per-side max is `scale`).
    */
  def run(edges: DataFrame, iterations: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50]: $iterations")
    // materialize the edge list once: every half-step joins it, and
    // without a checkpoint each of the 2·iterations joins (plus the
    // initial node scan) re-runs the caller's upstream plan (typically a
    // fact-table join + distinct) from scratch
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    def normalized(raw: DataFrame): DataFrame = {
      val mx = raw.agg(max("raw").as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("node"), expr(s"(raw * ${scale}L) div mx").as("score"))
    }
    var hubs = e.select(col("src").as("node")).distinct()
      .withColumn("score", lit(scale))
    var auths: DataFrame = null
    for (_ <- 1 to iterations) {
      auths = normalized(
        e.join(hubs.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node")).agg(sum("score").as("raw")))
      hubs = normalized(
        e.join(auths.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node")).agg(sum("score").as("raw")))
    }
    hubs.select(col("node"), lit("h").as("side"), col("score"))
      .unionByName(
        auths.select(col("node"), lit("a").as("side"), col("score")))
  }
}
