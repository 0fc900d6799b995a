package graft

import org.apache.spark.sql.functions._

import graft.graph.Triangles

/** graph.Triangles on graphs with known closed-form counts — the unit gate
  * the catalog's testdata query can't provide (its truth rides the DuckDB
  * oracle, which replays the same algorithm; here the expected counts come
  * from combinatorics instead).
  */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  private def counts(pairs: (Long, Long)*): Map[Long, Long] =
    Triangles.perNode(edges(pairs: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every vertex on C(3,2)=3 triangles") {
    val k4 = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (i, j)
    assert(counts(k4: _*) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangle + pendant edge: pendant vertex not reported") {
    assert(counts((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("square (C4) has no triangles") {
    assert(counts((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).isEmpty)
  }

  test("duplicate edges, reversed edges, and self-loops are canonicalized") {
    // same triangle listed redundantly: must still count once per vertex
    assert(counts((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (1L, 1L)) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge") {
    // {1,2,3} and {2,3,4}: vertices 2,3 on both
    assert(counts((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("star K1,5 (skewed hub) has no triangles") {
    val star = (2L to 6L).map(i => (1L, i))
    assert(counts(star: _*).isEmpty)
  }
}
