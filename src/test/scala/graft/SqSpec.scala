package graft

import org.apache.spark.sql.functions._

import graft.similarity.Sq

/** Scalar-quantized ANN (similarity.Sq): code-range/shape invariants,
  * determinism, and the identity property that makes a corpus vector its
  * own zero-distance rank-1 neighbor.
  */
class SqSpec extends SparkSpec {

  private val Dim = 64

  private def embeddings = spark.read.parquet(s"$sfSmoke/embeddings.parquet")

  test("codes: every dimension lands in [0, 255], width = dim, " +
    "bit-identical across runs") {
    val (mins, maxs) = Sq.dimRanges(embeddings, "embedding", Dim)
    assert(mins.length == Dim && maxs.length == Dim)
    mins.indices.foreach(i => assert(mins(i) <= maxs(i)))
    def dump() = embeddings
      .select(col("vec_id"), Sq.codes(col("embedding"), mins, maxs).as("c"))
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    val c1 = dump()
    val c2 = dump()
    assert(c1.toSeq == c2.toSeq) // integer pipeline: no run-to-run drift
    c1.foreach { case (_, cs) =>
      assert(cs.length == Dim)
      cs.foreach(c => assert(c >= 0L && c <= 255L, s"code $c out of range"))
    }
  }

  test("quantization hits the range endpoints: each dimension's min maps " +
    "to 0 and its max to 255") {
    val (mins, maxs) = Sq.dimRanges(embeddings, "embedding", Dim)
    val codes = embeddings
      .select(posexplode(Sq.codes(col("embedding"), mins, maxs))
        .as(Seq("d", "c")))
      .groupBy("d").agg(min("c").as("lo"), max("c").as("hi"))
      .collect()
    codes.foreach { r =>
      val d = r.getInt(0)
      if (mins(d) < maxs(d)) {
        assert(r.getLong(1) == 0L, s"dim $d min code ${r.getLong(1)}")
        assert(r.getLong(2) == 255L, s"dim $d max code ${r.getLong(2)}")
      } else assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    }
  }

  test("sqTopK: a corpus vector is its own rank-1 neighbor at sqd = 0") {
    val res = Sq.sqTopK(embeddings, embeddings.filter(col("vec_id") < 3),
        "vec_id", "embedding", "vec_id", k = 3, dim = Dim)
      .collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      val r1 = rows.find(_.getInt(1) == 1).get
      // rank 1 must be a zero-distance (identically coded) vector — the
      // query itself unless an exact code-duplicate with a smaller id wins
      assert(r1.getLong(3) == 0L, s"query $q rank-1 sqd ${r1.getLong(3)}")
      rows.sortBy(_.getInt(1)).foldLeft(-1L) { (prev, r) =>
        assert(r.getLong(3) >= prev) // ranks follow nondecreasing sqd
        r.getLong(3)
      }
    }
  }
}
