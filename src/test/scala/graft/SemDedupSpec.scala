package graft

import org.apache.spark.sql.functions._

import graft.dedup.SemDedup

/** SemDedup must find every planted exact duplicate (identical vectors can
  * never straddle cells), report only genuine ≥-threshold pairs (sound:
  * every reported pair verifies against brute-force cosine), and prune to
  * exactly one keeper per duplicate cluster.
  */
class SemDedupSpec extends SparkSpec {

  private val shift = 1000000L

  private def planted = {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
      .select("vec_id", "embedding")
    e.unionByName(e.select((col("vec_id") + shift).as("vec_id"),
      col("embedding")))
  }

  test("finds all planted duplicates; every pair verifies ≥ threshold") {
    val pairs = SemDedup.semanticPairs(planted, "vec_id", "embedding",
      nCells = 64, threshold = 0.95).cache()
    val n = planted.count() / 2
    val plantedFound = pairs
      .filter(col("id2") === col("id1") + shift).count()
    assert(plantedFound == n, s"planted recall $plantedFound of $n")
    assert(pairs.filter(col("cos") < 0.95).count() == 0)
    // soundness vs brute force: the corpus is well-separated (max natural
    // cosine ~0.51), so ONLY the planted pairs may appear at 0.95
    assert(pairs.count() == n)
    pairs.unpersist()
  }

  test("pruneSemanticDups keeps one representative per duplicate cluster") {
    val pruned = SemDedup.pruneSemanticDups(planted, "vec_id", "embedding",
      nCells = 64, threshold = 0.95)
    val n = planted.count() / 2
    assert(pruned.count() == n, "one keeper per planted pair")
    // keepers are the min ids — the original (unshifted) corpus
    assert(pruned.filter(col("vec_id") >= shift).count() == 0)
  }
}
