package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank (Page et al., "The PageRank citation ranking",
  * 1999) as plain joins + aggregations — the entity-importance pass a
  * curation pipeline runs over link/interaction graphs (domain ranking for
  * crawl prioritization being the canonical use).
  *
  * Exact integer formulation: ranks live in integer units (`scale` total
  * mass), per-edge contributions are floor divisions
  * `(rank·85) div (outdeg·100)`, and updates are integer sums — no
  * floating point anywhere, so iteration results are bit-identical in any
  * engine (the property the DuckDB chained-CTE oracle replays). The damping
  * mass lost to floor rounding stays lost in BOTH engines, deterministically.
  *
  * Scale shape: each iteration is one equi-join of the narrow (node, rank)
  * table against the (src, dst, outdeg) edge table (shuffle on src) and one
  * map-side-combinable sum on dst. Nothing wide ever rides a shuffle. For
  * deep iteration counts, localCheckpoint every ~10 rounds to truncate
  * lineage (same pattern as Dedup.connectedComponents); K here is small.
  */
object PageRank {

  /** `iterations` rounds over directed `edges` (cols: src, dst — longs).
    * Returns (node, rank) with rank in integer `scale` units. Dangling
    * nodes (out-degree 0, e.g. one side of a directed bipartite graph)
    * simply leak their mass — symmetrize edges upstream if undesired.
    */
  def run(edges: DataFrame, iterations: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50]: $iterations")
    // materialize the edge list once — each iteration joins `withDeg` and
    // without a checkpoint every join re-runs the caller's upstream plan
    // (typically a fact-table join + distinct) from scratch
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    val withDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(true) // joined per iteration — compute once
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true) // joined per iteration — without this the
      // final K-round plan recomputes the union+distinct shuffle K times
    val n = nodes.count() // bounded driver scalar: one long
    require(n > 0, "PageRank over an empty edge set")
    val base = scale * 15L / (n * 100L)
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iterations) {
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("(rank * 85) div (outdeg * 100)").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
    }
    ranks
  }
}
