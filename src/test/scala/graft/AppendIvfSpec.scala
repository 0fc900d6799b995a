package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.similarity.{Ann, IvfIndex}

/** Index-append lifecycle (q_s_ivf_append): beyond the oracle hash, pin
  * the two claims that make incremental maintenance trustworthy:
  *   1. APPEND ≡ REBUILD — probing (build on base, append delta) equals
  *      probing (rebuild on base∪delta with the same FROZEN quantizer)
  *      bit-for-bit: the append path adds files, never changes answers;
  *   2. FINDABILITY — an appended vector is immediately searchable: its
  *      own query returns it at rank 1 with cosine 1.
  */
class AppendIvfSpec extends SparkSpec {

  private val k = 4
  private val nProbe = 4

  test("appended index ≡ rebuilt-with-frozen-quantizer index, and " +
    "appended vectors are findable at rank 1") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
      .localCheckpoint(true)
    val isDelta = pmod(col("vec_id"), lit(10)) === 7
    val base = e.filter(!isDelta)
    val delta = e.filter(isDelta)
    val c = graft.queries.SimilarityCatalog.scaledCellCount(base.count())
    val raw = Ann.hashCentroids(base, "vec_id", "embedding", c)
    val sA = Files.createTempDirectory("graft_ivf_app_a")
    val sB = Files.createTempDirectory("graft_ivf_app_b")
    try {
      // A: build on base, append delta
      IvfIndex.write(base, "vec_id", "embedding", c, sA.toString,
        pretrained = Some(raw))
      IvfIndex.append(spark, sA.toString, delta, "vec_id", "embedding")
      // B: rebuild on the full corpus with the SAME frozen quantizer
      IvfIndex.write(e, "vec_id", "embedding", c, sB.toString,
        pretrained = Some(raw))

      def run(path: String, q: org.apache.spark.sql.DataFrame) =
        IvfIndex.probe(spark, path, q, "vec_id", "embedding", k, nProbe)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
            r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq

      val queries = e.filter(col("vec_id") < 25).localCheckpoint(true)
      val a = run(sA.toString, queries)
      val b = run(sB.toString, queries)
      assert(a.nonEmpty, "probe returned nothing")
      assert(a == b, s"append diverged from frozen-quantizer rebuild:\n" +
        s"${a.take(8)}\nvs\n${b.take(8)}")

      // findability: every delta vector's own query must return itself
      // at rank 1 (the probe always includes the vector's own cell)
      val dq = delta.limit(5).localCheckpoint(true)
      val self = run(sA.toString, dq).filter(_._2 == 1)
      assert(self.nonEmpty)
      self.foreach { case (qid, _, nn, cos) =>
        assert(nn == qid, s"appended vector $qid not its own top-1 ($nn)")
        assert(math.abs(cos - 1.0) < 1e-12, s"self-cosine $cos != 1")
      }
    } finally {
      IvfIndex.deleteDir(sA.toString)
      IvfIndex.deleteDir(sB.toString)
    }
  }
}
