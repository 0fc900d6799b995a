package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (builder brief): brute-force cosine top-k as the exact baseline, and an
  * IVF-style coarse-quantizer variant as the scale path.
  *
  * Scale design: brute force is queries×corpus — fine when the query set is
  * small and broadcast; the IVF path assigns corpus vectors to centroid
  * cells ONCE (narrow scan), probes only `nProbe` cells per query, and
  * re-ranks exactly within the probed cells.
  */
object Ann {

  /** Exact top-k by cosine for each query vector (queries broadcast).
    * Deterministic tie-break on corpus id. Both sides are L2-normalized
    * once up front so each pair costs ONE dot-product fold — at corpus×k
    * scale the per-pair work is the whole cost.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int): DataFrame = {
    def normed(df: DataFrame, id: String, outId: String, outVec: String) = {
      val v = transform(col(vecCol), _.cast("double"))
      val n = sqrt(aggregate(transform(v, x => x * x), lit(0.0), _ + _))
      df.select(col(id).as(outId), transform(v, _ / n).as(outVec))
    }
    VectorFunctions.register(corpus.sparkSession)
    val c = normed(corpus, idCol, "nn_id", "cv")
    val q = normed(queries, qidCol, "query_id", "qv")
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", call_function("graft_dot", col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cos")
  }

  /** L2-normalize centroid vectors driver-side: argmax over cosine(v, c)
    * equals argmax over dot(v, c/|c|) since |v| is constant per row — one
    * looped dot per cell instead of three folds. Public so the centroids a
    * query actually probed can be dumped for the DuckDB oracle replay.
    */
  def normalizeCentroids(
      centroids: Seq[(Int, Array[Double])]): Seq[(Int, Array[Double])] =
    centroids.map { case (cid, cv) =>
      val n = math.sqrt(cv.map(x => x * x).sum)
      (cid, cv.map(_ / n))
    }

  private def normalizedCentroidLit(centroids: Seq[(Int, Array[Double])]) = {
    val normed = normalizeCentroids(centroids)
    // typedlit packs each list into ONE Literal node: an element-wise
    // array(lit…) tree costs cells × dim expression nodes (16k at 256×64),
    // which blows up analysis/codegen time — measured 12.7 s → 3.4 s on
    // q_d_semantic at sf0.1 from this alone
    (typedlit(normed.map(_._2.toSeq)),
      typedlit(normed.map(_._1)))
  }

  private def dotLit(v: Column, p: Column): Column =
    call_function("graft_dot", v, p)

  /** IVF coarse cells: assign every vector to its nearest of `centroids`.
    *
    * Shape: vectors × broadcast(centroid table) with the CODEGEN'd
    * `graft_dot` as a top-level projection, then a narrow (id, cell, score)
    * argmax aggregate and an id-join to re-attach the vector. A previous
    * formulation scored through `transform(centroidLiteral, …)` — but
    * higher-order functions evaluate their lambda INTERPRETED, so at 256
    * cells every row paid 256 interpreted 64-dim folds (measured 12.3 s on
    * q_d_semantic at sf0.1; 2.6 s with this plan). Tie-break matches the
    * original first-max semantics: highest score, then lowest cell id —
    * the max(struct(score, −cell)) ordering.
    */
  def assignCells(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Double])]): DataFrame =
    assignCellsNormalized(vecs, idCol, vecCol, normalizeCentroids(centroids))

  /** Assignment against ALREADY-normalized centroids — the entry point an
    * index-append path uses with centroids read back from a persisted
    * artifact: renormalizing a stored unit vector divides by a norm that
    * is 1 ± ulp, which can flip the last bit of a score and break the
    * bit-parity contract between build-time and append-time assignment.
    */
  def assignCellsNormalized(vecs: DataFrame, idCol: String, vecCol: String,
      normCents: Seq[(Int, Array[Double])]): DataFrame = {
    VectorFunctions.register(vecs.sparkSession)
    val sp = vecs.sparkSession
    import sp.implicits._
    val cents = normCents
      .map { case (cid, c) => (cid, c.toSeq) }.toDF("__cell", "__c")
    val v = vecs.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    val best = v.join(broadcast(cents))
      .select(col("id"), col("__cell"),
        dotLit(col("v"), col("__c")).as("__s"))
      .groupBy("id")
      .agg(max(struct(col("__s").as("s"), (-col("__cell")).as("nc"))).as("m"))
      .select(col("id"), (-col("m.nc")).cast("int").as("cell"))
    v.join(best, "id")
  }

  /** Simple deterministic coarse centroids: per-cell means of a hash-based
    * initial assignment (one aggregation; stand-in for a trained quantizer).
    *
    * Component sums go through DECIMAL(38,18) — double addition is
    * order-sensitive and shuffle-merge order is not guaranteed, so a plain
    * double sum could differ in the last ulp between two executions.
    * Decimal addition is exact, making the centroids bit-identical across
    * runs — the property the oracle replay relies on (the aux dump and the
    * gated query compute them independently).
    */
  def hashCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      nCells: Int, dimHint: Option[Int] = None): Seq[(Int, Array[Double])] = {
    val v = vecs.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("cell", pmod(xxhash64(col("id")), lit(nCells)).cast("int"))
    // dimHint skips a whole Spark job whose only output is the vector
    // length — callers that already know the dimensionality (the PQ
    // family takes it as a parameter) pass it through
    val dim = dimHint.getOrElse(v.select(size(col("v"))).first().getInt(0))
    val sums = v.groupBy("cell").agg(
      count(lit(1)).as("n"),
      (0 until dim).map(i =>
        sum(element_at(col("v"), i + 1).cast("decimal(38,18)"))
          .cast("double").as(s"s$i")): _*)
    sums.collect().map { r =>
      val n = r.getLong(1).toDouble
      r.getInt(0) -> (0 until dim).map(i => r.getDouble(i + 2) / n).toArray
    }.toSeq.sortBy(_._1)
  }

  /** IVF-style ANN: probe the query's `nProbe` best cells, exact re-rank
    * inside them. Returns (query_id, rank, nn_id, cos).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int, nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val centroids = hashCentroids(corpus, idCol, vecCol, nCells)
    val cells = assignCells(corpus, idCol, vecCol, centroids)
      .select(col("id").as("nn_id"), col("v").as("cv"), col("cell"))
    val (centLit, cellIds) = normalizedCentroidLit(centroids)
    val q = queries.select(col(qidCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qv"))
    val qCells = q.select(col("query_id"), col("qv"),
        explode(zip_with(centLit, cellIds,
          (c, cid) => struct(dotLit(col("qv"), c).as("s"), cid.as("c")))).as("sc"))
      .withColumn("probe_rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(desc("sc.s"), col("sc.c"))))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("sc.c").as("cell"))
    val scored = cells.join(broadcast(qCells), Seq("cell"))
      .withColumn("cos", Dedup.cosine(col("cv"), col("qv")))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(desc("cos"), col("nn_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cos")
  }
}
