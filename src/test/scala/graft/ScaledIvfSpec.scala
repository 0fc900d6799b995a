package graft

import org.apache.spark.sql.functions._

/** √n-scaled IVF index (q_s_ivf_scaled) semantics beyond the oracle:
  * the integer √n cell-count rule, and full-probe equivalence — probing
  * EVERY cell of the scaled index must reproduce exact brute-force
  * search (the index only ever narrows, never reorders).
  */
class ScaledIvfSpec extends SparkSpec {

  test("scaledCellCount is the smallest power of two with c*c >= n") {
    val f = graft.queries.SimilarityCatalog.scaledCellCount _
    assert(f(1) == 1 && f(2) == 2 && f(4) == 2 && f(5) == 4)
    assert(f(500) == 32 && f(2000) == 64 && f(20000) == 256)
    Seq(3L, 17L, 499L, 500L, 65535L, 65537L).foreach { n =>
      val c = f(n)
      assert(c.toLong * c >= n, s"n=$n c=$c too small")
      assert(c == 1 || (c / 2).toLong * (c / 2) < n, s"n=$n c=$c not minimal")
      assert((c & (c - 1)) == 0, s"n=$n c=$c not a power of two")
    }
  }

  test("full-probe scaled IVF equals exact brute-force top-k") {
    import graft.similarity.Ann
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val c = graft.queries.SimilarityCatalog.scaledCellCount(e.count())
    val q = e.filter(col("vec_id") < 5)
    val ivf = Ann.ivfTopK(e, q, "vec_id", "embedding", "vec_id",
        k = 4, nCells = c, nProbe = c) // probe everything
      .filter(col("nn_id") =!= col("query_id"))
      .select("query_id", "rank", "nn_id")
    val brute = Ann.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id",
        k = 4)
      .filter(col("nn_id") =!= col("query_id"))
      .select("query_id", "rank", "nn_id")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).intValue,
        r.getAs[Number](2).longValue)
    val g = ivf.collect().map(key).sortBy(x => (x._1, x._2))
    val w = brute.collect().map(key).sortBy(x => (x._1, x._2))
    assert(g.toSeq == w.toSeq,
      s"full-probe scaled index diverged from brute:\n${g.toSeq}\nvs\n${w.toSeq}")
  }
}
