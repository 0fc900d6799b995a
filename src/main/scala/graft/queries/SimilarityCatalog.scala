package graft.queries

import org.apache.spark.sql.functions._

import QueryDef._
import graft.similarity.Ann

/** Similarity-search twins over the `embeddings` table (builder brief):
  * exact brute-force cosine top-k (oracle-checked — both engines fold the
  * dot product sequentially in double, so scores match bit-for-bit) and the
  * IVF-bucketed scale path (engine-specific hashing → rows-only).
  */
object SimilarityCatalog {

  /** Exact top-3 neighbors (excluding self) for query vectors vec_id < 5. */
  val sBrute = QueryDef(
    "q_s_cosine_topk",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id",
          "embedding", "vec_id", k = 4)
        .filter(col("nn_id") =!= col("query_id"))
        .select(col("query_id"), col("nn_id"), r6(col("cos")).as("cos"))
        .orderBy(col("query_id"), desc("cos"), col("nn_id"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id AS nn_id,
               list_sum(list_transform(list_zip(e.embedding, q.qv),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qv,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM embeddings e CROSS JOIN q),
      ranked AS (
        SELECT query_id, nn_id, cos,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, nn_id) AS rank
        FROM scored)
      SELECT query_id, nn_id, ${sqlR6("cos")} AS cos
      FROM ranked WHERE rank <= 4 AND nn_id <> query_id
      ORDER BY query_id, cos DESC, nn_id""")
  )

  /** IVF-style bucketed ANN (deterministic hash-seeded coarse cells,
    * nProbe re-rank; rows-only check).
    */
  val sIvf = QueryDef(
    "q_s_ivf_topk",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.ivfTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          "vec_id", k = 4, nCells = 8, nProbe = 3)
        .filter(col("nn_id") =!= col("query_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nn_id"), r6(col("cos")).as("cos"))
        .orderBy("query_id", "rank")
    },
    None
  )

  val all: Seq[QueryDef] = Seq(sBrute, sIvf)
}
