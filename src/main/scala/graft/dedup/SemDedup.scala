package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** Semantic deduplication (SemDeDup, Abbas et al., "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication", 2023): cluster the
  * embedding space coarsely, then verify cosine similarity ONLY within each
  * cluster — the cluster assignment bounds the otherwise O(n²) pair space to
  * Σ|cell|², the paper's core trick for running semantic dedup on web-scale
  * corpora.
  *
  * Scale design: centroids are the deterministic decimal-sum coarse
  * quantizer shared with the IVF index (Ann.hashCentroids — bit-identical
  * across independent runs, which the oracle replay relies on); assignment
  * is one codegen'd looped-dot projection; the within-cell self-join shuffles
  * NARROW (id, cell) rows and re-attaches the normalized vectors by id
  * afterwards, so wide payloads never ride the quadratic candidate stage
  * (the embeddingNearDups pattern). Recall matches SemDeDup's contract:
  * a near-dup pair straddling two cells is missed by design (exact
  * duplicates never straddle — identical vectors assign identically);
  * tighten by raising `nCells` probes or falling back to hyperplane LSH
  * (Dedup.embeddingNearDups) when cross-cell recall matters.
  */
object SemDedup {

  /** Within-cluster near-dup pairs: (id1, id2, cos) with cos ≥ threshold,
    * id1 < id2, both ids assigned to the same of `nCells` coarse cells.
    */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, threshold: Double = 0.95): DataFrame = {
    val centroids = Ann.hashCentroids(df, idCol, vecCol, nCells)
    semanticPairsWith(df, idCol, vecCol, centroids, threshold)
  }

  /** Same, against externally-supplied centroids (so a caller — or the
    * Verify aux dump — can share one trained quantizer across operators).
    */
  def semanticPairsWith(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Double])], threshold: Double): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val cells = Ann.assignCells(df, idCol, vecCol, centroids)
    val norm = sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), _ + _))
    val vn = cells.select(col("id"), col("cell"),
      transform(col("v"), _ / norm).as("vn"))
    // narrow candidate pairs first; vectors re-attach by id afterwards
    val slim = vn.select("id", "cell")
    val cand = slim.as("a").join(slim.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    cand
      .join(vn.select(col("id").as("id1"), col("vn").as("v1")), "id1")
      .join(vn.select(col("id").as("id2"), col("vn").as("v2")), "id2")
      .withColumn("cos", call_function("graft_dot", col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select("id1", "id2", "cos")
  }

  /** SemDeDup applied: one keeper (min id) per semantic-duplicate CLUSTER —
    * pairs closed transitively (Dedup.connectedComponents), singletons kept.
    * Returns the pruned frame.
    */
  def pruneSemanticDups(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, threshold: Double = 0.95): DataFrame = {
    val pairs = semanticPairs(df, idCol, vecCol, nCells, threshold)
    val comp = Dedup.connectedComponents(pairs, "id1", "id2")
    df.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("comp").isNull || col("comp") === col(idCol))
      .drop("comp")
  }
}
