package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson & Zaragoza, "The probabilistic
  * relevance framework: BM25 and beyond", 2009) — the lexical-retrieval
  * complement to the tf-idf/embedding operators (data-curation pipelines
  * use it for quality-by-query probes and hard-negative mining).
  *
  * Scale shape: tokens are filtered to the query's terms BEFORE any
  * shuffle (an `isin` over a literal handful — codegen'd, pushdown-
  * friendly), so the per-term tf aggregation touches only matching rows.
  * Document lengths and corpus stats are one map-side-combinable
  * aggregation each; N/avgdl/df are broadcast as a tiny cross join. The
  * full-corpus posting list is never materialized.
  */
object Bm25 {

  /** The shared tokenization (lowercase whitespace words over normalized
    * text): (idCol, w) with empty tokens dropped — documents whose text is
    * empty/whitespace-only contribute no rows, so they are outside the
    * corpus statistics in BOTH the in-query and the persisted-index paths.
    */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode(split(TextAnalysis.normText(lower(col(textCol))), " "))
          .as("w"))
      .filter(length(col("w")) > 0)

  /** Top-`k` documents for `queryTerms` by BM25(k1, b): (rank, idCol,
    * score). Token = lowercase whitespace word; ties break by document id
    * ascending. Only documents containing ≥1 query term are candidates.
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val toks = tokens(docs, idCol, textCol)
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("total_dl"))
    val qtoks = toks.filter(col("w").isin(queryTerms: _*))
    val tf = qtoks.groupBy(idCol, "w").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("w").agg(count(lit(1)).as("dfc"))
    val perTerm = tf
      .join(dl, idCol)
      .join(broadcast(dfq), "w")
      .crossJoin(broadcast(stats))
    rankTopK(perTerm, idCol, k, k1, b)
  }

  /** The scoring tail, shared by `topK` and PostingsIndex.probe so the
    * persisted-index path is STRUCTURALLY bit-identical to the in-query
    * one: `perTerm` carries one row per (document, matched query term)
    * with integer columns (idCol, tf, dl, dfc, n_docs, total_dl) — given
    * identical integers, the double expression tree below produces
    * identical doubles in both paths, and the DECIMAL per-doc sum is
    * order-independent, so the ranking cannot diverge.
    */
  def rankTopK(perTerm: DataFrame, idCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = perTerm
      .withColumn("avgdl",
        col("total_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log((col("n_docs") - col("dfc") + lit(0.5)) /
          (col("dfc") + lit(0.5)) + lit(1.0)))
      .withColumn("s",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      // per-term scores are bit-identical given identical integer inputs;
      // summing them as DECIMAL makes the per-doc total order-independent,
      // and floor-rounding to 1e-6 makes the RANKING key engine-portable
      // (raw doubles could flip near-ties across engines)
      .groupBy(idCol)
      .agg(sum(col("s").cast("decimal(28,6)")).cast("double").as("raw"))
      .withColumn("score", floor(col("raw") * 1e6 + lit(0.5)) / 1e6)
    val top = scored
      .orderBy(col("score").desc, col(idCol))
      .limit(k) // TakeOrdered — no full shuffle, no corpus-wide window
    // row_number here runs over <= k already-selected rows
    top.select(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col(idCol))).cast("long").as("rank"),
      col(idCol), col("score"))
  }
}
