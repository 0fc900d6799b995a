package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Persisted IVF-PQ index with exact re-rank (r14 verdict order #3) — the
  * storage-bounded ANN layout a 100 TB corpus actually deploys. The plain
  * persisted IVF index (`IvfIndex`) stores RAW vectors in its inverted
  * lists, so the index is a full second copy of the corpus; here the lists
  * hold only (id, pq_codes) — `m` small code indices, 8 bytes at the
  * catalog parameters instead of a 512-byte float64[64] — and exact
  * vectors live once, in a separate id-keyed side table consulted only for
  * the final re-rank of a bounded candidate set (the IVFADC-with-refine
  * structure of Jégou, Douze & Schmid, TPAMI 2011 — FAISS
  * IndexIVFPQ + refine).
  *
  * Layout at `<path>`:
  *   - `centroids`: (cell, c RAW, cn L2-NORMALIZED) — raw centroids feed
  *     residual subtraction, normalized ones probe ranking; both stored so
  *     probe-time arithmetic bit-matches build-time (renormalizing a
  *     stored unit vector is 1 ± ulp — see Ann.assignCellsNormalized);
  *   - `codebooks`: (m, k, c) — per-subspace PQ codebooks trained on the
  *     RESIDUALS (quantization error measured around each cell's centroid,
  *     the defining IVF-PQ property);
  *   - `lists`: (id, codes) PARTITIONED BY `cell` — the probe scan reads
  *     codes only, partition-pruned to the probed cells;
  *   - `raw`: (id, v) — the exact-vector side table; at cluster scale this
  *     is bucketed by id so the re-rank fetch is a co-located point
  *     lookup; the probe only ever asks it for ≤ queries·refine rows.
  *
  * Probe = coarse rank (broadcast centroids) → pruned codes-only ADC scan
  * → top-`refine` candidates per query by approximate distance → exact
  * cosine over just those candidates from the side table → top-k. Every
  * float op is the same sequential IEEE chain as the in-query
  * q_pipeline_ivfpq_e2e (decimal-sum training + ordered folds + exact
  * parquet double round-trip), so the DuckDB oracle replays the whole
  * lifecycle from the same aux dumps.
  */
object IvfPqIndex {

  /** Build + persist the index for `corpus` at `path` (overwrites). */
  def write(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int,
      dim: Int, m: Int, k: Int, path: String): Unit = {
    val sp = corpus.sparkSession
    import sp.implicits._
    val cents = Ann.hashCentroids(corpus, idCol, vecCol, nCells)
    val cn = Ann.normalizeCentroids(cents)
    cents.zip(cn).map { case ((cell, c), (_, n)) => (cell, c.toSeq, n.toSeq) }
      .toDF("cell", "c", "cn")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val centDf = cents.map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "c")
    val res = Ann.assignCells(corpus, idCol, vecCol, cents)
      .join(broadcast(centDf), "cell")
      .select(col("id"), col("cell"),
        zip_with(col("v"), col("c"), (x, y) => x - y).as("r"))
    val cb = Pq.trainCodebooks(res, "id", "r", dim, m, k)
    cb.map { case (mi, ki, c) => (mi, ki, c.toSeq) }.toDF("m", "k", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    // the inverted lists carry CODES ONLY — the 8-byte payload is the
    // entire point; the exact vector is written once, to the side table
    Pq.encode(res, "id", "r", dim, cb, m)
      .join(res.select("id", "cell"), "id")
      .select(col("id"), col("codes"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/lists")
    corpus.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .write.mode("overwrite").parquet(s"$path/raw")
  }

  /** APPEND a vector batch WITHOUT retraining — the PQ twin of
    * IvfIndex.append, freezing BOTH trained artifacts: each new vector is
    * assigned to its nearest STORED centroid (via the stored normalized
    * copies — see Ann.assignCellsNormalized on why renormalizing would
    * break bit-parity), its residual against the STORED raw centroid is
    * encoded with the STORED codebooks, and the (id, codes) row lands as
    * a new file in that cell's existing partition dir while the exact
    * vector appends to the raw side table. Ingest cost ∝ batch; the
    * quantizer AND codebooks retrain on a slow cadence, never per ingest.
    * Because assignment + encoding are per-vector functions of frozen
    * state, the appended index is bit-identical to a rebuild over
    * base ∪ batch with the same frozen parts — which is what lets
    * q_s_ivfpq_append's oracle replay from base-trained dumps.
    */
  def append(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val sp = spark
    import sp.implicits._
    val centRows = readCentroids(spark, path)
    val dim = centRows.head._2.length
    val cDf = centRows.map { case (cell, c, _) => (cell, c) }
      .toDF("cell", "c")
    val cb = spark.read.parquet(s"$path/codebooks")
      .select("m", "k", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(t => (t._1, t._2)).toSeq
    val m = cb.map(_._1).max + 1
    val res = Ann.assignCellsNormalized(delta, idCol, vecCol,
        centRows.map { case (cell, _, cn) => (cell, cn.toArray) })
      .join(broadcast(cDf), "cell")
      .select(col("id"), col("cell"),
        zip_with(col("v"), col("c"), (x, y) => x - y).as("r"))
      .localCheckpoint(true) // feeds both the encode and the cell re-join
    Pq.encode(res, "id", "r", dim, cb, m)
      .join(res.select("id", "cell"), "id")
      .select(col("id"), col("codes"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/lists")
    delta.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .write.mode("append").parquet(s"$path/raw")
  }

  /** Probe-only search: coarse-rank the stored normalized centroids per
    * query, prune the codes scan to the probed cells, ADC-score the codes,
    * keep the top `refine` candidates per query by approximate distance,
    * then exact-cosine re-rank JUST those candidates from the raw side
    * table (self-matches dropped before the final ranking). Returns
    * (query_id, rank, nn_id, cos).
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, vecCol: String, k: Int, nProbe: Int,
      refine: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    val centRows = readCentroids(spark, path)
    val dim = centRows.head._2.length
    val cDf = centRows.map { case (cell, c, _) => (cell, c) }
      .toDF("cell", "c")
    val cb = spark.read.parquet(s"$path/codebooks")
      .select("m", "k", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(t => (t._1, t._2)).toSeq
    val m = cb.map(_._1).max + 1
    val sub = dim / m
    // probe ranking materialized once (it feeds both the pruning collect
    // and the ADC-table build)
    val probes = queryCells(spark, path, queries, qidCol, vecCol, nProbe)
      .localCheckpoint(true)
    val probed = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    // one m×k ADC table per (query, probed cell), from the query's
    // RESIDUAL against that cell's RAW centroid
    val lit_ = Pq.codebookLit(cb, m)
    val qtab = probes.join(broadcast(cDf), "cell")
      .select(col("query_id"), col("qv"), col("cell"),
        zip_with(col("qv"), col("c"), (x, y) => x - y).as("qr"))
      .select(col("query_id"), col("qv"), col("cell"),
        array((0 until m).map { mi =>
          transform(element_at(lit_, mi + 1),
            cc => Pq.sqDist(slice(col("qr"), mi * sub + 1, sub), cc))
        }: _*).as("dtab"))
    // codes-only scan, statically pruned to the probed partitions
    val cands = spark.read.parquet(s"$path/lists")
      .filter(col("cell").isInCollection(probed))
      .select(col("id").as("nn_id"), col("codes"), col("cell"))
      .join(broadcast(qtab), Seq("cell"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("dtab"),
          (code, ds) => element_at(ds, code + 1)),
        lit(0.0), _ + _))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc"), col("nn_id"))))
      .filter(col("crank") <= refine)
      .select("query_id", "qv", "nn_id")
    // exact re-rank: fetch ONLY the ≤ queries·refine candidate vectors
    // from the side table (broadcast the candidates, never the table)
    spark.read.parquet(s"$path/raw")
      .select(col("id").as("nn_id"), col("v").as("cv"))
      .join(broadcast(cands), Seq("nn_id"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", Dedup.cosine(col("cv"), col("qv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("nn_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cos")
  }

  /** Per-query probed cells: (query_id, qv, cell) — the query batch
    * scored against the STORED normalized centroids (same sequential dot
    * fold as the in-query gate), top `nProbe` cells each.
    */
  def queryCells(spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    val cnDf = readCentroids(spark, path)
      .map { case (cell, _, n) => (cell, n) }.toDF("cell", "cn")
    queries.select(col(qidCol).as("query_id"),
        transform(col(vecCol), _.cast("double")).as("qv"))
      .join(broadcast(cnDf))
      .select(col("query_id"), col("qv"), col("cell"),
        aggregate(zip_with(col("qv"), col("cn"), (x, y) => x * y),
          lit(0.0), _ + _).as("s"))
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("s"), col("cell"))))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "cell")
  }

  private def readCentroids(spark: SparkSession,
      path: String): Seq[(Int, Seq[Double], Seq[Double])] =
    spark.read.parquet(s"$path/centroids")
      .select("cell", "c", "cn").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1), r.getSeq[Double](2)))
      .sortBy(_._1).toSeq
}
