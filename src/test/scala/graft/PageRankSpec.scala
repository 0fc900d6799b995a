package graft

import org.apache.spark.sql.functions._

import graft.graph.PageRank

/** PageRank invariants on known graphs: uniform rank on a symmetric
  * cycle, the hub of a star outranks leaves, and total mass is conserved
  * up to the deterministic floor-division rounding loss.
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  test("symmetric cycle stays exactly uniform") {
    // undirected 4-cycle: every node has degree 2, perfectly symmetric
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val edges = (e ++ e.map(_.swap)).toDF("src", "dst")
    val r = PageRank.run(edges, iterations = 5, scale = 1000000L)
      .select("rank").distinct().collect()
    assert(r.length == 1, "cycle ranks must be identical")
  }

  test("star hub outranks leaves; ranks are deterministic across runs") {
    val e = (2L to 9L).flatMap(leaf => Seq((1L, leaf), (leaf, 1L)))
    val edges = e.toDF("src", "dst")
    val r1 = PageRank.run(edges, 3).orderBy("node").collect()
    val r2 = PageRank.run(edges, 3).orderBy("node").collect()
    assert(r1.toSeq == r2.toSeq, "must be bit-deterministic")
    val byNode = r1.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((2L to 9L).forall(byNode(1L) > byNode(_)), "hub must lead")
  }

  test("mass conserved up to floor-rounding loss") {
    val scale = 1000000000L
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val edges = (e ++ e.map(_.swap)).distinct.toDF("src", "dst")
    val total = PageRank.run(edges, 4, scale)
      .agg(sum("rank")).first().getLong(0)
    // each of 3 nodes loses < 1 unit to div per term, per iteration
    assert(total <= scale && total > scale - 1000,
      s"total mass $total vs scale $scale")
  }
}
