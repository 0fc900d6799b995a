package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation (the
  * standard compact-forward / arboricity-bounded algorithm: Chiba–Nishizeki;
  * the same shape Spark's GraphX `TriangleCount` and every MPP graph engine
  * use). Orienting each undirected edge from its (degree, id)-smaller
  * endpoint to the larger one makes the edge set a DAG in which every
  * triangle {x,y,z} appears EXACTLY once as x→y, x→z, y→z — no
  * triple-counting, and the wedge-join fanout per node is its OUT-degree,
  * which the orientation caps at O(√m) — the worst-case join size is
  * O(m^1.5) instead of Σdeg² (unbounded under skew: one celebrity node of
  * degree d would otherwise contribute d² wedges).
  *
  * Three hash joins on integer keys, no driver-side data, no iteration —
  * the plan buckets cleanly at any scale; AQE handles residual key skew.
  *
  * Reference twin: capability beyond the reference (its Python stack has no
  * graph ops); the trade graph itself follows the q_g_pagerank family.
  */
object Triangles {

  /** Per-node triangle counts for an undirected edge list.
    *
    * @param edges two LONG columns `src`, `dst`; duplicates and self-loops
    *              are removed here (canonical u<v form + distinct), so any
    *              raw pair table works.
    * @return (node, triangles) — nodes on at least one triangle.
    */
  def perNode(edges: DataFrame): DataFrame = {
    // e has two consumers (deg, the orientation join) and dir has THREE
    // (e1/e2/e3 of the wedge join): Spark does not CSE across self-joins,
    // so without materialization the whole canonicalize+distinct lineage
    // re-executes per consumer (observed: 5 identical aggregate subtrees
    // in the physical plan). Lazy local checkpoints pin each to one
    // materialization — the EwmaScan/connectedComponents convention.
    val e = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient toward the (deg, id)-larger endpoint; u<v breaks degree ties
    val toV = col("du") < col("dv") ||
      (col("du") === col("dv")) // tie ⇒ u<v decides
    val dir = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(toV, col("u")).otherwise(col("v")).as("src"),
        when(toV, col("v")).otherwise(col("u")).as("dst"))
      .localCheckpoint(false)
    val tri = dir.as("e1")
      .join(dir.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"),
        col("e2.dst").as("z"))
      .join(dir.as("e3"),
        col("x") === col("e3.src") && col("z") === col("e3.dst"),
        "leftsemi")
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
