package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose token n-grams
  * overlap an evaluation set (the contamination check every serious
  * training-data pipeline runs before shipping a corpus — n-gram overlap
  * against held-out benchmarks, as popularized by the GPT-3 and PaLM
  * appendix methodology).
  *
  * Scale shape: n-gram generation is a pure projection (split →
  * `transform(sequence)` → `array_distinct` → explode, no window, no
  * shuffle), so the corpus side streams. The benchmark side is tiny by
  * nature (eval sets are ~1e3–1e6 grams), so the hit test is a broadcast
  * join — at 100 TB the corpus is scanned once and nothing wide ever
  * shuffles.
  */
object Decontaminate {

  /** Distinct lowercase token `n`-grams per document: (idCol, gram).
    * Documents shorter than `n` tokens produce no rows.
    */
  def docGrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val tk = split(TextAnalysis.normText(lower(col(textCol))), " ")
    df.select(col(idCol), tk.as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol),
        explode(array_distinct(
          transform(sequence(lit(0), size(col("tk")) - n),
            i => concat_ws(" ", slice(col("tk"), i + lit(1), lit(n))))))
          .as("gram"))
  }

  /** Per-corpus-document overlap report against `benchmark`:
    * (idCol, n_grams, n_hit, contamination = n_hit / n_grams).
    * Only documents with at least `n` tokens appear (they are the only ones
    * that carry grams to test).
    */
  def overlapReport(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val cg = docGrams(corpus, idCol, textCol, n)
    val bg = docGrams(benchmark, idCol, textCol, n)
      .select("gram").distinct()
    // docGrams is distinct-per-doc, so plain counts are distinct counts
    cg.join(broadcast(bg).withColumn("hit", lit(1L)), Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum("hit"), lit(0L)).as("n_hit"))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_grams"))
  }
}
