package graft.sketches

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch frequency estimation (Cormode & Muthukrishnan, "An
  * improved data stream summary: the count-min sketch and its
  * applications", 2005) on codegen'd built-ins — the heavy-hitter /
  * frequency summary a 100 TB pipeline keeps when exact per-value counts
  * are unaffordable to store.
  *
  * Scale design:
  *
  *  - value counts are ONE map-side-combinable aggregation (the same
  *    shuffle an exact count would pay — the sketch's win is the bounded
  *    d×w state that ships afterwards, not the build);
  *  - the counter table is at most d·w rows no matter the input (here
  *    4·4096), i.e. a broadcastable summary that merges across corpora by
  *    plain (row, bucket) addition — the mergeability that makes it
  *    distributable;
  *  - estimation is a join against that tiny table + a min over d rows.
  *
  * Determinism: hashing is xxhash64 seeded by the row index (hash of the
  * (i, value) pair), counters are exact integer sums, and the estimate is
  * a min — every value is integer end-to-end, so any engine replaying from
  * the dumped (value, i, bucket) mapping agrees bit-for-bit.
  */
object CountMin {

  /** (value, i, bucket) hash mapping for each of the d counter rows —
    * the only engine-specific piece (xxhash64); dump this for replay.
    */
  def bucketMap(values: DataFrame, valueCol: String, d: Int, w: Int): DataFrame = {
    require((w & (w - 1)) == 0 && w > 0, s"width must be a power of two: $w")
    require(d >= 1 && d <= 16, s"depth must be in [1,16]: $d")
    values.select(col(valueCol),
        explode(array((0 until d).map { i =>
          struct(lit(i).as("i"),
            xxhash64(lit(i), col(valueCol)).bitwiseAND(lit((w - 1).toLong))
              .as("b"))
        }: _*)).as("ib"))
      .select(col(valueCol), col("ib.i").as("i"), col("ib.b").as("b"))
  }

  /** d×w counter table (i, b, c) from exact per-value counts
    * (valueCol, cntCol). Output bounded by d·w rows.
    */
  def sketch(counts: DataFrame, valueCol: String, cntCol: String,
      d: Int, w: Int): DataFrame =
    bucketMap(counts.select(valueCol, cntCol), valueCol, d, w)
      .join(counts, valueCol)
      .groupBy("i", "b").agg(sum(col(cntCol)).as("c"))

  /** Point-frequency estimates: min over the d counters each value hashes
    * to. `sk` is a [[sketch]] output (broadcast — it is ≤ d·w rows).
    */
  def estimate(values: DataFrame, valueCol: String, sk: DataFrame,
      d: Int, w: Int): DataFrame =
    bucketMap(values, valueCol, d, w)
      .join(broadcast(sk), Seq("i", "b"))
      .groupBy(valueCol).agg(min(col("c")).as("cms_est"))
}
