package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document by the
  * log-likelihood ratio of a hashed-feature unigram model of a TARGET
  * distribution vs the RAW corpus, add-1 smoothed over `buckets` hash
  * buckets — the curation move behind domain-targeted pretraining mixes
  * (rank raw data by how target-like it is, then sample by weight, e.g.
  * with the q_t_wsample Efraimidis–Spirakis keys).
  *
  * Plan: one token pass (the q_t_vocab/tf-idf tokenization, so features
  * line up with the rest of the text family) → two ≤`buckets`-row count
  * aggregates → a broadcast log-ratio table joined back to per-(doc,
  * bucket) counts. No shuffle wider than the token groupBy at any scale.
  */
object Dsir {

  /** (idCol, dsir_weight, n_tokens) per document with non-empty normalized
    * text. `isTarget` is any boolean expression over `df`'s columns
    * selecting the target slice (e.g. `col("lang") === "en"`).
    */
  def weights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val bk = df
      .select(col(idCol), isTarget.as("__tgt"),
        lower(TextAnalysis.normText(col(textCol))).as("__nt"))
      .filter(length(col("__nt")) > 0)
      .select(col(idCol), col("__tgt"),
        explode(split(col("__nt"), " ")).as("__w"))
      .withColumn("__b", pmod(xxhash64(col("__w")), lit(buckets)))
    val dc = bk.groupBy(idCol, "__tgt", "__b")
      .agg(count(lit(1)).as("__n"))
    val raw = dc.groupBy("__b").agg(sum(col("__n")).as("cr"))
    val tgt = dc.where(col("__tgt")).groupBy("__b")
      .agg(sum(col("__n")).as("ct"))
    val totR = raw.agg(sum(col("cr")).as("nr"))
    val totT = tgt.agg(sum(col("ct")).as("nt"))
    val lr = raw.join(tgt, Seq("__b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totR)).crossJoin(broadcast(totT))
      .select(col("__b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + buckets))
          - log((col("cr") + 1).cast("double") / (col("nr") + buckets)))
          .as("__lr"))
    dc.join(broadcast(lr), "__b")
      .groupBy(idCol)
      .agg(sum(col("__n") * col("__lr")).as("dsir_weight"),
        sum(col("__n")).as("n_tokens"))
  }
}
