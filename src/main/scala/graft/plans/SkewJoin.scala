package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (builder brief: "salting for skew").
  *
  * A hash join shuffles both sides on the key — one hot key lands its
  * entire row set on one task. Salting spreads the fact side across
  * `saltCount` sub-keys (derived from a per-row column, so the spread is
  * deterministic) and replicates the dimension side `saltCount`× via an
  * explode; the join key becomes (key, salt) and the hot key fans out over
  * `saltCount` tasks. AQE's skew-join handles moderate skew automatically;
  * explicit salting is for the pathological keys AQE splits can't fix
  * (e.g. one key = half the table).
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `key`, salted `saltCount` ways.
    * `factRowId` is any fact column whose values spread rows (an id, a
    * timestamp) — salt = hash(rowId) mod saltCount.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factRowId: String, saltCount: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(factRowId)), lit(saltCount)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltCount - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
