package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level line (sentence/paragraph) deduplication, CCNet-style:
  * every normalized line is kept only at its FIRST occurrence in the
  * corpus (global order = (doc_id, pos)); later occurrences are removed
  * and each document is reassembled from its surviving lines. This is the
  * repeated-boilerplate scrub (headers, cookie banners, navigation
  * fragments) that exact-doc and near-dup passes both miss.
  *
  * Scale shape: lines are keyed by their md5 (a narrow 32-char key — the
  * full line text never rides the keeper shuffle), the keeper per line is
  * one map-side-combinable `min(struct(doc_id, pos))` aggregation, and the
  * join back to line text is an equi-join on the same key. Reassembly is a
  * per-document `collect_list` whose size is bounded by the document's own
  * line count — no window over the corpus, no driver collect.
  */
object LineDedup {

  /** Non-empty trimmed lines per document: (idCol, pos, line, h).
    * Lines are '.'-separated sentences; `pos` preserves document order.
    */
  def lines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), "\\.")).as(Seq("pos", "line")))
      .withColumn("line", trim(col("line")))
      .filter(length(col("line")) > 0)
      .withColumn("h", md5(col("line")))

  /** Per-document dedup report: (idCol, n_lines, n_kept, text_md5) where
    * text_md5 fingerprints the document reassembled from surviving lines
    * ('. '-joined, in original order; md5("") for fully-deduplicated
    * docs). Documents with no non-empty lines do not appear.
    */
  def dedupReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val l = lines(df, idCol, textCol)
    // first corpus occurrence per line value; (doc_id, pos) is unique, so
    // min(struct) is a total order and the keeper is deterministic
    val keeper = l.groupBy("h")
      .agg(min(struct(col(idCol), col("pos"))).as("k"))
    val kept = l.join(keeper, "h")
      .filter(col(idCol) === col(s"k.$idCol") && col("pos") === col("k.pos"))
    val tot = l.groupBy(idCol).agg(count(lit(1)).as("n_lines"))
    val keptAgg = kept.groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(". ",
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")))).as("text_md5"))
    tot.join(keptAgg, Seq(idCol), "left")
      .na.fill(0L, Seq("n_kept"))
      .withColumn("text_md5", coalesce(col("text_md5"), md5(lit(""))))
  }
}
