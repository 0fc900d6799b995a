package graft

import org.apache.spark.sql.functions._

import graft.sketches.CountMin

/** CMS invariants: estimates are one-sided (est ≥ exact, never under),
  * the counter table is bounded by d·w, and partial sketches merge by
  * plain addition to the full sketch (the distributability property).
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val d = 4
  private val w = 256

  private def toks = spark.read.parquet(s"$sfCorrect/documents.parquet")
    .select(explode(split(
      graft.text.TextAnalysis.normText(lower(col("text"))), " ")).as("tok"))
    .filter(length(col("tok")) > 0)

  test("estimate never underestimates; bounded counter table") {
    val tc = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val sk = CountMin.sketch(tc, "tok", "cnt", d, w).cache()
    try {
      assert(sk.count() <= d.toLong * w)
      val bad = CountMin.estimate(tc.select("tok"), "tok", sk, d, w)
        .join(tc, "tok")
        .filter(col("cms_est") < col("cnt"))
        .count()
      assert(bad == 0, s"$bad tokens underestimated")
    } finally sk.unpersist()
  }

  test("partial sketches merge additively to the full sketch") {
    val tc = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val h1 = tc.filter(xxhash64(col("tok")) % 2 === 0)
    val h2 = tc.filter(xxhash64(col("tok")) % 2 =!= 0)
    val merged = CountMin.sketch(h1, "tok", "cnt", d, w)
      .unionByName(CountMin.sketch(h2, "tok", "cnt", d, w))
      .groupBy("i", "b").agg(sum("c").as("c"))
    val full = CountMin.sketch(tc, "tok", "cnt", d, w)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("exact value for a key colliding with nothing heavy") {
    val tc = Seq(("alpha", 100L), ("beta", 7L)).toDF("tok", "cnt")
    val sk = CountMin.sketch(tc, "tok", "cnt", d, w)
    val est = CountMin.estimate(tc.select("tok"), "tok", sk, d, w)
      .orderBy("tok").collect()
    // with 2 keys in 4x256 counters a full 4/4 collision is impossible
    assert(est.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("alpha", 100L), ("beta", 7L)))
  }
}
