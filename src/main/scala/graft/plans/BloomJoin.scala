package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit bloom-prefiltered semi join — the runtime-filter pattern
  * (Spark's own `InjectRuntimeFilter` applies it opportunistically; this
  * operator is the user-controlled form for when the build side is KNOWN
  * to be selective): build a bloom filter over the dim keys, prune fact
  * rows against it BEFORE the join shuffle, then run the exact semi join
  * on the survivors to remove the false positives.
  *
  * Scale design: at 100 TB the fact-side shuffle dominates a semi join;
  * a few-MB bloom filter broadcast into the scan stage drops ~(1 - sel -
  * fpp) of fact rows before they are ever serialized into the exchange.
  * The final semi join guarantees the result is EXACTLY the plain semi
  * join — the bloom stage is result-invariant (the same gate shape as
  * the salted join: layout changes, semantics don't).
  *
  * The membership probe is Spark's own codegen'd
  * `BloomFilterMightContain` expression (catalyst), fed a filter built
  * with the matching `util.sketch` wire format by
  * `DataFrameStatFunctions.bloomFilter` — both sides speak putLong /
  * mightContainLong, no UDF in the hot path.
  */
object BloomJoin {

  /** Idempotent per-session registration of the membership predicate. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")

  /** Aggregate the dim side's (long) keys into a serialized bloom filter —
    * a distributed aggregation; only the filter bytes come to the driver.
    */
  def buildFilter(dim: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.select(col(keyCol).cast("long").as("k"))
      .stat.bloomFilter("k", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(filter, key)` as a Column (requires register()). */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    call_function("graft_bloom_contains", lit(filterBytes), key.cast("long"))

  /** The composed operator: bloom-prune `fact` on `factKey` against
    * `dim`'s `dimKey` set, then exact left-semi join the survivors.
    * Result is identical to `fact.join(dim, fact(factKey) === dim(dimKey),
    * "left_semi")` — only the amount of shuffled data changes.
    *
    * Size ceiling: the serialized filter rides the plan as a `lit()` byte
    * literal (the same transport Spark's own `InjectRuntimeFilter` gives
    * its scalar-subquery result), which is copied into every serialized
    * task — fine at a few MB, a driver/codegen hazard at tens. The default
    * cap matches Spark's own runtime-filter ceiling
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumBits` = 67108864 bits
    * = 8 MB); an `expectedItems` large enough to blow it fails loudly here
    * rather than degrading the driver — at that dim cardinality the bloom
    * stage stops paying for itself and a plain shuffled semi join is the
    * right plan anyway.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01,
      maxFilterBytes: Int = 8 << 20): DataFrame = {
    register(fact.sparkSession)
    // fail BEFORE building: the optimal-bits formula (the same one
    // util.sketch.BloomFilter sizes with) predicts the filter size, so an
    // oversized request dies without allocating per-partition bitsets
    val predictedBytes =
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2)) / 8).toLong
    require(predictedBytes <= maxFilterBytes,
      s"bloom filter for $expectedItems items @ fpp=$fpp would serialize" +
        s" to ~$predictedBytes B > cap $maxFilterBytes B: a plan-literal" +
        " this large bloats every task binary — use a plain semi join at" +
        " this dim cardinality or raise maxFilterBytes")
    val bytes = buildFilter(dim, dimKey, expectedItems, fpp)
    fact.filter(mightContain(bytes, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}
