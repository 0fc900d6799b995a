package graft

import org.apache.spark.sql.functions._

import graft.text.LineDedup

/** Line dedup must keep exactly the first corpus occurrence of every
  * normalized line, reassemble documents deterministically, and report
  * md5("") for a document whose every line first appeared elsewhere.
  */
class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  test("first occurrence wins; later duplicates are dropped") {
    val df = Seq(
      (1L, "the quick fox. jumped over. the lazy dog"),
      (2L, "jumped over. something new"),      // "jumped over" dup of doc 1
      (3L, "the quick fox. jumped over")).toDF("doc_id", "text") // all dups
    val r = LineDedup.dedupReport(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getAs[Long]("n_lines"),
      x.getAs[Long]("n_kept"))).toSeq ==
      Seq((1L, 3L, 3L), (2L, 2L, 1L), (3L, 2L, 0L)))
    // doc 3 is fully deduplicated -> md5 of the empty reassembly
    assert(r(2).getAs[String]("text_md5") ==
      "d41d8cd98f00b204e9800998ecf8427e")
    // doc 2 survives as just "something new"
    val want = spark.sql("SELECT md5('something new') m").first().getString(0)
    assert(r(1).getAs[String]("text_md5") == want)
  }

  test("reassembly preserves original line order") {
    val df = Seq((1L, "zeta. alpha. mid"), (2L, "unrelated")).toDF("doc_id", "text")
    val r = LineDedup.dedupReport(df, "doc_id", "text")
      .filter(col("doc_id") === 1L).first()
    val want = spark.sql("SELECT md5('zeta. alpha. mid') m").first().getString(0)
    assert(r.getAs[String]("text_md5") == want)
  }

  test("keeper aggregation combines map-side before the shuffle") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val l = LineDedup.lines(docs, "doc_id", "text")
    val keeperPlan = l.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
      .queryExecution.executedPlan.toString
    // partial_min below the exchange => only (h, partial keeper) rides the
    // shuffle, never the line text
    val ex = keeperPlan.indexOf("Exchange")
    val pm = keeperPlan.indexOf("partial_min")
    assert(ex >= 0 && pm > ex,
      s"expected map-side partial_min below the exchange:\n$keeperPlan")
  }
}
