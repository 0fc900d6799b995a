package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pq

/** Product-quantization ANN (similarity.Pq): codebook shape/determinism,
  * code-range invariants, and the ADC lower-bound property that makes a
  * vector (or its exact duplicate) its own rank-1 neighbor.
  */
class PqSpec extends SparkSpec {

  private val Dim = 64
  private val M = 8
  private val K = 8 // smaller than the catalog's 16: sf0.001 has few rows

  private def embeddings = spark.read.parquet(s"$sfSmoke/embeddings.parquet")

  test("trainCodebooks: dense per-subspace indices, centroid dims, " +
    "bit-identical across runs") {
    val cb1 = Pq.trainCodebooks(embeddings, "vec_id", "embedding", Dim, M, K)
    val cb2 = Pq.trainCodebooks(embeddings, "vec_id", "embedding", Dim, M, K)
    assert(cb1.map(t => (t._1, t._2)) == cb2.map(t => (t._1, t._2)))
    cb1.zip(cb2).foreach { case ((_, _, a), (_, _, b)) =>
      assert(a.toSeq == b.toSeq) // exact: decimal-sum training
    }
    val perM = cb1.groupBy(_._1)
    assert(perM.keySet == (0 until M).toSet)
    perM.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted == (0 until rows.size).toList)
      rows.foreach { case (_, _, c) => assert(c.length == Dim / M) }
    }
  }

  test("encode: one code per subspace, all within the codebook") {
    val cb = Pq.trainCodebooks(embeddings, "vec_id", "embedding", Dim, M, K)
    val maxPerM = cb.groupBy(_._1).map { case (m, rows) =>
      m -> rows.map(_._2).max
    }
    val codes = Pq.encode(embeddings, "vec_id", "embedding", Dim, cb, M)
      .collect()
    assert(codes.length == embeddings.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == M)
      cs.zipWithIndex.foreach { case (c, m) =>
        assert(c >= 0 && c <= maxPerM(m), s"code $c out of range for m=$m")
      }
    }
  }

  test("adcTopK: every query's rank-1 hit has the minimal possible ADC " +
    "(self is never beaten)") {
    // ADC(q, x)'s m-th term is d(q_m, centroid(code_m(x))) ≥ min over the
    // codebook of d(q_m, ·), with equality when x = q — so a query that is
    // itself in the corpus must appear at rank 1 (ties broken by id can
    // only put an IDENTICALLY-coded vector first, same ADC value).
    val res = Pq.adcTopK(embeddings, embeddings.filter(col("vec_id") < 3),
      "vec_id", "embedding", "vec_id", topK = 3, dim = Dim, m = M, k = K)
    val byQ = res.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      val r1 = rows.find(_.getInt(1) == 1).get
      val self = rows.find(_.getLong(2) == q)
      assert(self.nonEmpty, s"query $q missing from its own top-3")
      assert(r1.getDouble(3) <= self.get.getDouble(3) + 0.0,
        s"rank-1 adc above self adc for query $q")
      assert(rows.map(_.getDouble(3)).sorted.toSeq ==
        rows.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq)
    }
  }
}
