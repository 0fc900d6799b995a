package graft

import org.apache.spark.sql.functions._

import graft.mining.Scaling
import graft.text.TextAnalysis

/** Pins the edge-case contracts closed in round 3: sklearn's zero-variance
  * scaling convention, empty/whitespace-only token counting (where DuckDB's
  * string_split diverges without the mirrored guard), and the per-ticker CSV
  * sink retaining the Ticker data column.
  */
class EdgeCasesSpec extends SparkSpec {

  test("standardize: zero-variance column scales by 1, never NaN") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 1.0), (2L, 5.0, 2.0), (3L, 5.0, 3.0))
      .toDF("id", "const", "varying")
    val out = Scaling.standardize(df, Seq("const", "varying"))
      .orderBy("id").collect()
    // constant column: (x - mu) / 1 = 0.0 for every row (sklearn's
    // _handle_zeros_in_scale), not NaN/Infinity/null
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("const_z")) == 0.0)
      assert(!r.isNullAt(r.fieldIndex("varying_z")))
    }
    // varying column still standardizes with population stddev
    val vz = out.map(_.getDouble(out.head.fieldIndex("varying_z")))
    assert(math.abs(vz.sum) < 1e-12)
  }

  test("wsTokenCount: empty and whitespace-only text count 0 tokens") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, " \t\n "), (4L, "one"),
      (5L, "  two  tokens  ")).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.wsTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("text/corpus operators tolerate null and empty text") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val docs = Seq((1L, null: String), (2L, ""), (3L, "   "),
      (4L, "real content here")).toDF("doc_id", "text")
    // tf-idf / pmi: null/empty/whitespace docs are excluded, no throw
    assert(TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text")
      .select("id").distinct().collect().map(_.getLong(0)).toSet == Set(4L))
    assert(TextAnalysis.pmiCollocations(docs, "doc_id", "text",
      minCount = 1, k = 10).count() >= 1)
    // pii: null text yields null counts/scrub, not an exception
    val pii = TextAnalysis.withPiiSignals(docs)
      .filter(col("doc_id") === 1L).head()
    assert(pii.isNullAt(pii.fieldIndex("n_emails")))
    // splits: every row (null hash or not) lands in exactly one split
    val splits = TextAnalysis.withSplit(docs, "doc_id")
      .select("split").collect().map(_.getString(0))
    assert(splits.forall(Set("train", "val", "test")))
    // empty corpus: all corpus-level operators return empty, no throw
    val none = docs.filter(col("doc_id") < 0)
    assert(TextAnalysis.tfIdfTopTerms(none, "doc_id", "text").count() == 0)
    assert(TextAnalysis.pmiCollocations(none, "doc_id", "text").count() == 0)
    assert(graft.dedup.Dedup.connectedComponents(
      none.select(col("doc_id").as("id1"), col("doc_id").as("id2")),
      "id1", "id2").count() == 0)
  }

  test("per-ticker CSV sink keeps Ticker as a data column") {
    val out = java.nio.file.Files.createTempDirectory("etl_sink").toString
    val cleaned = graft.etl.CleanPipeline.clean(spark, s"$refDir/stock_data")
    graft.etl.CleanPipeline.writeCleaned(cleaned, out)
    val perTicker = spark.read.option("header", "true")
      .csv(s"$out/per_ticker/__ticker_dir=HVN")
    assert(perTicker.columns.contains("Ticker"),
      s"per-ticker files must carry Ticker; got ${perTicker.columns.toSeq}")
    assert(perTicker.select("Ticker").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("HVN"))
    // the unified sink still has the full schema including Ticker
    val all = spark.read.option("header", "true").csv(s"$out/all")
    assert(all.columns.contains("Ticker"))
  }
}
