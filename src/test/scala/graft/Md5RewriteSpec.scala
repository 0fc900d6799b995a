package graft

import org.apache.spark.sql.functions._

import graft.functions.{Md5ChainRewrite, Md5Prefix60}

/** The chain-rewrite rule must (a) actually fire on the documented
  * portable SQL spelling, (b) leave near-miss patterns alone, and
  * (c) produce bit-identical results on a rewritten plan.
  */
class Md5RewriteSpec extends SparkSpec {

  private def installed(): Unit = Md5ChainRewrite.install(spark)

  private def optimizedContainsNative(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan
      .expressions.exists(_.exists(_.isInstanceOf[Md5Prefix60]))

  test("rule fires on the portable SQL chain (DataFrame and SQL text)") {
    installed()
    // a FILE-backed frame: a local Seq would be constant-folded whole by
    // ConvertToLocalRelation before the plan could be inspected
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val viaDf = docs.select(
      conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    assert(optimizedContainsNative(viaDf), "DF-API chain not rewritten")
    docs.createOrReplaceTempView("md5_rw_t")
    val viaSql = spark.sql(
      "SELECT CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), " +
        "16, 10) AS BIGINT) AS h FROM md5_rw_t")
    assert(optimizedContainsNative(viaSql), "SQL chain not rewritten")
  }

  test("rewritten plan returns the identical values") {
    installed()
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 300).map(_ => rnd.nextLong().toString).toDF("s")
    df.createOrReplaceTempView("md5_rw_v")
    val got = spark.sql(
      "SELECT s, CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) " +
        "AS h FROM md5_rw_v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference values computed WITHOUT the optimizer: evaluate the exact
    // byte math directly
    got.foreach { case (s, h) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s.getBytes("UTF-8"))
      var v = 0L
      (0 until 7).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      assert(v == h, s"value mismatch for $s")
    }
  }

  test("near-miss patterns are left alone") {
    installed()
    // file-backed for the same ConvertToLocalRelation reason as above
    val df = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id").cast("string").as("s"))
    // different substring width (14), different base (8), no long cast
    val misses = Seq(
      df.select(conv(substring(md5(col("s").cast("string")), 1, 14), 16, 10)
        .cast("long").as("h")),
      df.select(conv(substring(md5(col("s").cast("string")), 1, 15), 16, 8)
        .cast("long").as("h")),
      df.select(conv(substring(md5(col("s").cast("string")), 1, 15), 16, 10)
        .as("h")))
    misses.zipWithIndex.foreach { case (m, i) =>
      assert(!optimizedContainsNative(m), s"near-miss $i was rewritten")
    }
  }
}
