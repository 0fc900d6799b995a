package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate-nearest-neighbor search
  * (builder brief: the ANN scale path beyond IVF; Jégou, Douze, Schmid,
  * "Product quantization for nearest neighbor search", TPAMI 2011).
  *
  * The vector space is split into `m` contiguous subspaces of `dim/m`
  * dimensions; each subspace gets its own small codebook of `k` centroids,
  * and a vector is stored as `m` small code indices — 8 bytes instead of a
  * 256-byte float[64] at the parameters used here. Search uses asymmetric
  * distance computation (ADC): per query, ONE `m`×`k` table of
  * query-subvector→centroid squared distances is precomputed, and each
  * corpus vector's approximate distance is just `m` table lookups summed —
  * no float vector is touched during the scan.
  *
  * Scale design: the corpus is encoded ONCE (narrow projection, no
  * shuffle); at query time the tiny query set rides a broadcast cross
  * join and scoring is a per-row `m`-term fold over the broadcast ADC
  * table — the scan is completely shuffle-free, and the only exchange is
  * the per-query top-k window on `query_id`. At 100 TB the codes table is
  * 32× smaller than the raw vectors, which is the entire point.
  *
  * Determinism for the DuckDB oracle replay: codebook training aggregates
  * component sums through DECIMAL(38,18) (exact, order-free) so the dumped
  * codebook is bit-identical to the one the gated query recomputes; every
  * per-subspace squared distance is a fixed-order sequential double fold
  * (identical to DuckDB's in-order `list_sum`); the per-vector ADC sum
  * folds the `m` terms in subspace order on both engines.
  */
object Pq {

  /** Sequential squared-L2 fold between two equal-length double arrays —
    * the exact op sequence DuckDB's `list_sum(list_transform(list_zip(..),
    * p -> (p[1]-p[2])*(p[1]-p[2])))` performs, so scores are
    * bit-identical across engines.
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Train one deterministic codebook per subspace: hash-based initial
    * assignment, per-cell exact decimal mean (the same stand-in-for-a-
    * trained-quantizer construction as Ann.hashCentroids, extended to one
    * aggregation covering ALL subspaces). Cells are re-indexed densely
    * (0..) per subspace, sorted by hash cell id, so codes index straight
    * into the returned per-subspace list. One shuffle total.
    *
    * Returns (subspace, denseIndex, centroid) sorted by (subspace, index).
    */
  def trainCodebooks(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int): Seq[(Int, Int, Array[Double])] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val v = vecs.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    val sliced = v
      .select(col("id"), posexplode(array((0 until m).map(i =>
        slice(col("v"), i * sub + 1, sub)): _*)).as(Seq("m", "sv")))
      .withColumn("cell", pmod(xxhash64(col("id"), col("m")), lit(k)).cast("int"))
    val sums = sliced.groupBy("m", "cell").agg(
      count(lit(1)).as("n"),
      (0 until sub).map(i =>
        sum(element_at(col("sv"), i + 1).cast("decimal(38,18)"))
          .cast("double").as(s"s$i")): _*)
    // ≤ m×k rows collected (128 at the catalog parameters) — driver-side by
    // construction, the codebook IS the broadcast-literal search structure
    sums.collect()
      .map { r =>
        val n = r.getLong(2).toDouble
        (r.getInt(0), r.getInt(1),
          (0 until sub).map(i => r.getDouble(i + 3) / n).toArray)
      }
      .groupBy(_._1).toSeq.flatMap { case (mi, rows) =>
        rows.sortBy(_._2).zipWithIndex.map { case ((_, _, c), ki) =>
          (mi, ki, c)
        }
      }.sortBy(t => (t._1, t._2))
  }

  /** Codebook as one literal: array(subspace → array(code → centroid)).
    * Public so composed indexes (IVF-PQ) can build query ADC tables from
    * an externally trained codebook.
    *
    * typedlit packs the whole nested structure into ONE Literal node —
    * the element-wise array(array(array(lit…))) tree costs m×k×sub
    * expression nodes (1k+ at the catalog parameters), and since the
    * literal is re-referenced once per subspace the encode/ADC plans
    * carried m copies of it, blowing up analysis and codegen time (the
    * same lesson as Ann.normalizedCentroidLit, measured there at 12.7 s →
    * 3.4 s; here it is pure driver-side planning cost per action).
    */
  def codebookLit(cb: Seq[(Int, Int, Array[Double])], m: Int): Column =
    typedlit((0 until m).map { mi =>
      cb.filter(_._1 == mi).sortBy(_._2)
        .map { case (_, _, c) => c.toSeq }
    })

  /** Encode every vector as `m` code indices (argmin subspace centroid,
    * ties to the lowest index — DuckDB's `row_number ORDER BY d, k`).
    * Pure projection, no shuffle. `keep` passes extra input columns
    * through the same projection — callers that previously re-attached
    * columns with `encode(df).join(df.select("id", c), "id")` paid a full
    * corpus self-join (shuffle both sides + recompute the input plan) for
    * values already present on the row being encoded (guide §2.4: remove
    * shuffles outright).
    */
  def encode(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      cb: Seq[(Int, Int, Array[Double])], m: Int,
      keep: Seq[String] = Nil): DataFrame = {
    val sub = dim / m
    val lit_ = codebookLit(cb, m)
    val v = transform(col(vecCol), _.cast("double"))
    vecs.select((col(idCol).as("id") +:
      array((0 until m).map { mi =>
        val dists = transform(element_at(lit_, mi + 1),
          c => sqDist(slice(v, mi * sub + 1, sub), c))
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }: _*).as("codes") +: keep.map(col)): _*)
  }

  /** ADC top-k: per query, precompute the m×k distance table, score each
    * corpus vector by an m-term table-lookup fold over its codes, rank by
    * (approx distance, id). Returns (query_id, rank, nn_id, adc).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, topK: Int, dim: Int, m: Int,
      k: Int): DataFrame = {
    val sub = dim / m
    val cb = trainCodebooks(corpus, idCol, vecCol, dim, m, k)
    val lit_ = codebookLit(cb, m)
    val codes = encode(corpus, idCol, vecCol, dim, cb, m)
      .select(col("id").as("nn_id"), col("codes"))
    val qv = transform(col(vecCol), _.cast("double"))
    val qTab = queries.select(col(qidCol).as("query_id"),
      array((0 until m).map { mi =>
        transform(element_at(lit_, mi + 1),
          c => sqDist(slice(qv, mi * sub + 1, sub), c))
      }: _*).as("dtab"))
    val scored = codes.crossJoin(broadcast(qTab))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("dtab"),
          (code, ds) => element_at(ds, code + 1)),
        lit(0.0), _ + _))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc"), col("nn_id"))))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "nn_id", "adc")
  }
}
