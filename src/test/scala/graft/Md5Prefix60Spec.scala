package graft

import org.apache.spark.sql.functions._

import graft.functions.Md5Prefix60

/** The native 60-bit md5-prefix expression must be BIT-IDENTICAL to the
  * portable SQL chain it replaces — every consuming query's oracle still
  * spells the chain in DuckDB, so any divergence would fail ~20 gates.
  */
class Md5Prefix60Spec extends SparkSpec {

  private def chain(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  test("native expression equals the conv(substring(md5)) chain on " +
      "edge and random inputs") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    val cases = Seq("", " ", "a", "0", "-1", "héllo wörld", "日本語テキスト",
      "line1\nline2\ttabbed", "#|#", "",
      "x" * 10000) ++
      (1 to 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(60)).mkString) ++
      (1 to 100).map(_ => rnd.nextLong().toString)
    val df = cases.toDF("s")
    val bad = df.select(col("s"), chain(col("s")).as("want"),
        Md5Prefix60.md5Prefix60(col("s")).as("got"))
      .where(col("want") =!= col("got"))
      .collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(3).mkString("; ")}")
  }

  test("numeric keys hash identically through both spellings (the " +
      "cast-to-string path)") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 1000L).toDF("k")
    val bad = df.select(chain(col("k")).as("want"),
        Md5Prefix60.md5Prefix60(col("k")).as("got"))
      .where(col("want") =!= col("got")).count()
    assert(bad == 0L)
  }

  test("values stay in [0, 2^60) — the contentUniform/KMV domain contract") {
    val sp = spark
    import sp.implicits._
    val mm = (1L to 2000L).toDF("k")
      .select(Md5Prefix60.md5Prefix60(col("k")).as("h"))
      .agg(min("h"), max("h")).head()
    assert(mm.getLong(0) >= 0L)
    assert(mm.getLong(1) < (1L << 60))
  }

  test("null input yields null, not a crash") {
    val sp = spark
    import sp.implicits._
    val r = Seq[Option[String]](None, Some("a")).toDF("s")
      .select(Md5Prefix60.md5Prefix60(col("s")).as("h")).collect()
    assert(r.count(_.isNullAt(0)) == 1)
  }
}
