package graft.sketches

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, "bottom-k") distinct-count sketch — Bar-Yossef et
  * al. (RANDOM 2002), Beyer et al. "On synopses for distinct-value
  * estimation under multiset operations" (SIGMOD 2007): keep the k smallest
  * hash values of the key set; with U₍k₎ the k-th smallest hash mapped into
  * (0, 1], the unbiased estimator is (k−1)/U₍k₎. Complements the HLL sketch
  * ([[Hll]]): a KMV synopsis additionally supports set INTERSECTION
  * estimates (Beyer's multiset operations) and carries actual key hashes,
  * at O(k) space instead of O(2^p) registers.
  *
  * Scale design: the hash is a codegen'd md5 prefix; the bottom-k
  * selection is TWO bounded stages, never a global sort — a salted
  * partial bottom-k (parallelism |groups| × salts, each partition keeps k
  * rows), then the final k over ≤ salts·k survivors per group. The sketch
  * property (bottom-k of a union = bottom-k of the merged bottom-ks) is
  * exactly what makes the salted partial pass correct — the same
  * mergeability a 1000-executor tree aggregation relies on.
  *
  * Cross-engine determinism: the hash is the repo-standard portable md5
  * 60-bit prefix (`conv(substring(md5(key),1,15),16,10)` ==
  * DuckDB `CAST('0x'||substr(md5(key),1,15) AS BIGINT)`), distinct values
  * are deduped per group before ranking (so `ORDER BY h` is a total
  * order), and the estimate is one fixed float expression over (k, h_k) —
  * any engine replays it bit-for-bit.
  */
object Kmv {

  /** Hash space size 2^60 (15 hex chars) — the (0,1] mapping denominator. */
  val HashSpace: Double = math.pow(2, 60)

  /** Sql literal of [[HashSpace]] (exact integer-valued double). */
  val HashSpaceSql: String = "1152921504606846976.0"

  /** Portable 60-bit key hash (see TextAnalysis.hashBucket) — the native
    * functions.Md5Prefix60 expression (bit-identical to the conv chain,
    * one digest per row instead of three intermediate strings).
    */
  def keyHash(key: Column): Column =
    graft.functions.Md5Prefix60.md5Prefix60(key)

  /** DuckDB spelling of [[keyHash]]. */
  def sqlKeyHash(e: String): String =
    s"CAST('0x' || substr(md5(CAST(($e) AS VARCHAR)), 1, 15) AS BIGINT)"

  /** The k smallest distinct key hashes per group, as rows
    * (groupCols…, h). Parallelism stays |groups| × `salts` until the data
    * is reduced to ≤ salts·k rows per group; only the final tiny selection
    * partitions by group alone.
    */
  def bottomK(df: DataFrame, groupCols: Seq[String], key: Column, k: Int,
      salts: Int = 32): DataFrame =
    selectBottomK(
      df.select(groupCols.map(col) :+ keyHash(key).as("h"): _*).distinct(),
      groupCols, k, salts)

  /** Bottom-k selection over an EXISTING distinct (groupCols…, h) table —
    * also the sketch MERGE: bottom-k of a union of part-sketches (distinct
    * the union first — a key present in several parts must collapse to one
    * hash row) equals the bottom-k of the whole key set.
    */
  def selectBottomK(hashed: DataFrame, groupCols: Seq[String], k: Int,
      salts: Int = 32): DataFrame = {
    require(k > 1, s"k must exceed 1 for the (k-1)/U_(k) estimator: $k")
    val w1 = Window
      .partitionBy(groupCols.map(col) :+ pmod(col("h"), lit(salts)): _*)
      .orderBy("h")
    val partial = hashed
      .withColumn("__kmv_r", row_number().over(w1))
      .filter(col("__kmv_r") <= k)
      .drop("__kmv_r")
    val w2 = Window.partitionBy(groupCols.map(col): _*).orderBy("h")
    partial.withColumn("__kmv_r", row_number().over(w2))
      .filter(col("__kmv_r") <= k)
      .drop("__kmv_r")
  }

  /** Per-group estimate from a [[bottomK]] sketch: (k−1)·2^60/h_k, except
    * a group with fewer than k distinct hashes holds its ENTIRE key set —
    * the sketch size is the exact count.
    */
  def estimate(bottom: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    bottom.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("h_k"))
      .withColumn("kmv_est",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit(k - 1.0) * lit(HashSpace) /
            col("h_k").cast("double")))
}
