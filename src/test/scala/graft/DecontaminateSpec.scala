package graft

import org.apache.spark.sql.functions._

import graft.text.Decontaminate

/** Decontamination must count distinct-gram overlap exactly: a doc sharing
  * a 5-token run with the benchmark is flagged with the right gram counts,
  * a clean doc reports zero hits, and sub-n docs carry no grams at all.
  */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  test("planted overlap is counted; clean docs report zero hits") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares the runs "alpha..epsilon" and "beta..zeta" -> 2 of its 3 grams hit
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "one two three four five six seven"),
      (3L, "too short")).toDF("doc_id", "text")
    val r = Decontaminate.overlapReport(corpus, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    assert(r.length == 2, "sub-n doc must not appear")
    val d1 = r(0)
    assert(d1.getAs[Long]("n_grams") == 3 && d1.getAs[Long]("n_hit") == 2)
    assert(math.abs(d1.getAs[Double]("contamination") - 2.0 / 3.0) < 1e-12)
    val d2 = r(1)
    assert(d2.getAs[Long]("n_grams") == 3 && d2.getAs[Long]("n_hit") == 0)
  }

  test("grams are distinct per doc and case/whitespace-normalized") {
    val df = Seq((1L, "A b C d E  a B c D e a b c d e")).toDF("doc_id", "text")
    val g = Decontaminate.docGrams(df, "doc_id", "text", 5)
    // 11 positions but only 5 distinct cyclic grams after lowering
    assert(g.count() == 5)
    assert(g.agg(countDistinct("gram")).first().getLong(0) == 5)
  }

  test("gram generation plan is shuffle-free") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val plan = Decontaminate.docGrams(docs, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
