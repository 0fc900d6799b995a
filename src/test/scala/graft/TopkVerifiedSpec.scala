package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the approximate-then-exact verified top-k
  * (q_topk_verified) beyond the oracle hash: the published top-k equals
  * the ground-truth top-k of a full exact aggregation (the claim `proved`
  * certifies), estimates are one-sided (CMS est ≥ exact), and the proof
  * bound is self-consistent (kth STRICTLY above the max non-candidate
  * estimate whenever proved is true — strict so a non-candidate tying the
  * kth count can't silently outrank it under the tok tie-break).
  */
class TopkVerifiedSpec extends SparkSpec {

  private def run(sf: String) = {
    val rows = graft.queries.SketchCatalog.topkVerified.query(spark, sf)
      .collect()
    assert(rows.nonEmpty, "no heavy hitters surfaced")
    // one-sided estimates and descending exact order
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"),
        s"CMS under-estimated ${r.getAs[String]("tok")}")
    }
    val cnts = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("exact_cnt"))
    cnts.sliding(2).foreach { case Array(a, b) => assert(a >= b) case _ => () }
    assert(rows.forall(_.getAs[Boolean]("proved")),
      "top-k not provably exact at this scale — raise HeavyDen or K")
    // ground truth: full exact aggregation over every token
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(
        graft.text.TextAnalysis.normText(lower(col("text"))), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("tok"))
      .limit(rows.length)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val got = rows.sortBy(_.getAs[Long]("rank"))
      .map(r => r.getAs[String]("tok") -> r.getAs[Long]("exact_cnt"))
    assert(got.toSeq == truth.toSeq,
      s"verified top-k diverged from ground truth:\n$got\nvs\n${truth.toSeq}")
    // the strict bound is the self-consistency claim of `proved` — only
    // meaningful when proved is true (asserted above for THIS dataset; a
    // future dataset where the kth count ties the max non-candidate
    // estimate would correctly report proved=false instead)
    if (rows.forall(_.getAs[Boolean]("proved"))) {
      val kth = rows.map(_.getAs[Long]("exact_cnt")).min
      assert(kth > rows.head.getAs[Long]("max_noncand_est"),
        "proved flag inconsistent with its own bound")
    }
  }

  test("q_topk_verified: provably-exact top-k equals ground truth (sf0.001)") {
    run(sfSmoke)
  }

  test("q_topk_verified: provably-exact top-k equals ground truth (sf0.01)") {
    run(sfCorrect)
  }

  test("q_topk_verified: candidate bar past every token yields an empty " +
    "result without erroring") {
    // heavyDen = 1 requires est ≥ n_tokens — only possible if one token
    // IS the whole corpus, so the candidate set (and the result) is empty
    val rows = graft.queries.SketchCatalog
      .topkVerifiedRun(spark, sfSmoke, heavyDen = 1L).collect()
    assert(rows.isEmpty,
      s"expected zero candidates to yield zero rows, got ${rows.length}")
  }

  test("q_topk_verified: k=1 degenerates to the single heaviest token") {
    val one = graft.queries.SketchCatalog
      .topkVerifiedRun(spark, sfSmoke, k = 1).collect()
    assert(one.length == 1 && one(0).getAs[Long]("rank") == 1L)
    assert(one(0).getAs[Boolean]("proved"))
  }
}
