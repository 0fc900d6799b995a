package graft.queries

import org.apache.spark.sql.functions._

import QueryDef._
import graft.dedup.Dedup

/** Dedup twins over the `documents` table (builder brief). The exact and
  * n-gram-Jaccard paths are SQL-expressible → oracle-checked; MinHash+LSH,
  * SimHash, and embedding near-dup use engine-specific hashing (xxhash64)
  * → registered rows-only.
  */
object DedupCatalog {

  private val sqlNorm =
    "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"

  /** Exact dedup over a deliberately doubled corpus (documents ∪ shifted
    * copy) — every group has exactly one keeper and two copies.
    */
  val dExact = QueryDef(
    "q_d_exact",
    (s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val doubled = d.unionByName(
        d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.exactGroups(doubled, "doc_id", "text")
        .orderBy("keep_id")
        .select("fp", "keep_id", "n_copies")
    },
    Some("""
      WITH doubled AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents),
      g AS (
        SELECT md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM doubled GROUP BY 1)
      SELECT fp, keep_id, n_copies FROM g ORDER BY keep_id""")
  )

  /** n-gram Jaccard near-dup pairs (3-gram shingles, J ≥ 0.3, shingle
    * document-frequency cap 100).
    */
  val dJaccard = QueryDef(
    "q_d_ngram_jaccard",
    (s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.3, maxShingleFreq = 100)
        .select(col("id1"), col("id2"), r6(col("jaccard")).as("jaccard"))
        .orderBy("id1", "id2"),
    Some(s"""
      WITH toks AS (
        SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        FROM toks WHERE len(tk) >= 3),
      rare AS (
        SELECT shingle FROM sh GROUP BY 1
        HAVING count(*) BETWEEN 2 AND 100),
      shf AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      common AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
        FROM shf a JOIN shf b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id1, id2,
             ${sqlR6("c / CAST(s1.sz + s2.sz - c AS DOUBLE)")} AS jaccard
      FROM common
      JOIN sizes s1 ON s1.doc_id = id1
      JOIN sizes s2 ON s2.doc_id = id2
      WHERE c / CAST(s1.sz + s2.sz - c AS DOUBLE) >= 0.3
      ORDER BY id1, id2""")
  )

  /** MinHash + banded LSH near-dup pairs, verified by exact Jaccard
    * (engine-specific hashing → rows-only check).
    */
  val dMinHash = QueryDef(
    "q_d_minhash_lsh",
    (s, dir) =>
      Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, numPerm = 32, bands = 8, threshold = 0.3)
        .select(col("id1"), col("id2"), r6(col("jaccard")).as("jaccard"))
        .orderBy("id1", "id2"),
    None
  )

  /** SimHash near-dup pairs (hamming ≤ 12 of 64 bits; rows-only). */
  val dSimHash = QueryDef(
    "q_d_simhash",
    (s, dir) =>
      Dedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text",
          maxHamming = 12)
        .orderBy("id1", "id2"),
    None
  )

  /** Embedding-cosine near-dup pairs via hyperplane LSH over a corpus with
    * planted duplicates (the synthetic embeddings are well-separated — max
    * pairwise cosine 0.51 — so a copy with shifted ids provides the
    * realistic ≥0.95 near-dup regime; rows-only).
    */
  val dEmbed = QueryDef(
    "q_d_embed_neardup",
    (s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e.unionByName(
        e.select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
      Dedup.embeddingNearDups(planted, "vec_id", "embedding",
          threshold = 0.95, numBits = 64, bands = 8)
        .select(col("id1"), col("id2"), r6(col("cos")).as("cos"))
        .orderBy("id1", "id2")
    },
    None
  )

  val all: Seq[QueryDef] = Seq(dExact, dJaccard, dMinHash, dSimHash, dEmbed)
}
