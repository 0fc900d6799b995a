package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-quantized (int8-style) approximate nearest neighbor — the third
  * point on the ANN compression curve next to [[Ann]] (exact/IVF) and
  * [[Pq]] (product quantization): each float dimension is affinely mapped
  * to an integer code in [0, 255], so a 64-dim float vector becomes 64
  * bytes and the approximate distance is pure integer arithmetic.
  *
  * Scale shape (100 TB): training is ONE corpus scan producing `dim`
  * (min, max) rows — a driver-side broadcast table bounded by the
  * dimensionality, never by corpus size. Quantization and scoring are
  * scan-local `transform`/`zip_with` expressions (no shuffle beyond the
  * final per-query top-k), and the integer squared distance is exact, so
  * ranking is deterministic — no float accumulation order to diverge
  * across partitionings. Candidate generation composes with [[Ann]]'s IVF
  * cells when the corpus is too large for a full scan per query.
  *
  * Cross-engine exactness: the quantization rule is
  * `code = floor((x − min) · 255 / (max − min) + 0.5)` evaluated in
  * double with that exact operation order (float→double casts are exact;
  * `floor(t + 0.5)` sidesteps round() semantics differences), and every
  * downstream op is integer, so an oracle replaying the same rule matches
  * bit for bit.
  */
object Sq {

  /** Per-dimension (min, max) over the corpus: one scan, `dim` rows out.
    * Returned as driver-side arrays (bounded by the embedding dim — 64 in
    * the testdata; a broadcast-literal-sized aggregate, not row-scale).
    */
  def dimRanges(corpus: DataFrame, vecCol: String, dim: Int)
      : (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy("d")
      .agg(min(col("x").cast("double")).as("dmin"),
        max(col("x").cast("double")).as("dmax"))
      .collect() // bounded: exactly `dim` rows
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r =>
      val d = r.getInt(0)
      mins(d) = r.getDouble(1)
      maxs(d) = r.getDouble(2)
    }
    (mins, maxs)
  }

  /** The quantized-code array for a vector column under (mins, maxs):
    * `floor((x − min_d) · 255 / (max_d − min_d) + 0.5)` per dimension, 0
    * for degenerate (constant) dimensions. Codes are LONGs in [0, 255]
    * (the int8 range shifted to unsigned; width is a storage concern, the
    * arithmetic is what the engine sees).
    */
  def codes(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val minArr = typedlit(mins)
    val spanArr = typedlit(mins.indices.map(i => maxs(i) - mins(i)).toArray)
    transform(vec, (x, i) => {
      val span = element_at(spanArr, i + 1)
      when(span === 0.0, lit(0L)).otherwise(
        floor((x.cast("double") - element_at(minArr, i + 1)) * lit(255.0)
          / span + lit(0.5)).cast("long"))
    })
  }

  /** Approximate top-k by integer squared distance between code arrays.
    * Ranks are assigned BEFORE any self-match filtering (the [[Ann]]
    * contract) with (sqd, nn_id) tie-break; `sqd` is exact, so the whole
    * result is integer-deterministic.
    *
    * `queries` must be small enough to broadcast (the per-query scan
    * model shared by the rest of the ANN family).
    */
  def sqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, dim: Int): DataFrame = {
    val (mins, maxs) = dimRanges(corpus, vecCol, dim)
    val corpusCodes = corpus.select(col(idCol).as("nn_id"),
      codes(col(vecCol), mins, maxs).as("cc"))
    val queryCodes = queries.select(col(queryIdCol).as("query_id"),
      codes(col(vecCol), mins, maxs).as("qc"))
    val scored = corpusCodes
      .crossJoin(broadcast(queryCodes))
      .withColumn("sqd",
        aggregate(zip_with(col("cc"), col("qc"),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sqd"), col("nn_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "sqd")
  }
}
