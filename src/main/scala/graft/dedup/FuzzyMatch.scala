package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution primitive (record
  * linkage): generate candidate pairs ONLY within a blocking key, then
  * verify each candidate with an edit-distance predicate. The classic
  * blocking+verify shape (Fellegi–Sunter record linkage; same
  * candidates-then-verify contract as the LSH dedup family): the all-pairs
  * O(n²) comparison never happens — candidate volume is Σ_blocks C(|b|,2),
  * bounded by the blocking scheme, and the quadratic-cost `levenshtein`
  * only runs on candidates.
  *
  * At 100 TB: one shuffle on the blocking key; skewed blocks are ordinary
  * join skew (AQE / SkewJoin-saltable). Choosing blocking keys is the
  * recall/cost dial exactly as `maxShingleFreq` is for n-gram Jaccard.
  *
  * Reference twin: capability beyond the reference (its pandas ETL
  * deduplicates only on exact ticker/date keys).
  */
object FuzzyMatch {

  /** Near-duplicate (id1, id2, name1, name2, dist) pairs, id1 < id2, with
    * 1 ≤ levenshtein ≤ maxDist (0 = exact duplicate — that's exact dedup's
    * job, excluded here). `blockCols` must be non-null expressions over
    * `df`'s columns.
    */
  def pairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[Column], maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1: $maxDist")
    val keyed = df.select(
      (col(idCol).as("__id") +: col(nameCol).as("__name") +:
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i") }): _*)
    val blockKeys = blockCols.indices.map(i => s"__b$i")
    val joinCond = blockKeys
      .map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _) && (col("a.__id") < col("b.__id"))
    keyed.as("a").join(keyed.as("b"), joinCond)
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"),
        col("a.__name").as("name1"), col("b.__name").as("name2"),
        levenshtein(col("a.__name"), col("b.__name")).cast("long").as("dist"))
      .where(col("dist").between(1, maxDist))
  }
}
