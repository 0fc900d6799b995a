package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The native DotProduct must be BIT-identical to the higher-order fold —
  * that equivalence is what lets oracle-checked paths use it.
  */
class VectorFunctionsSpec extends SparkSpec {

  test("native dot == fold dot, bit-for-bit, on real embeddings") {
    val e = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val pairs = e.as("a").crossJoin(e.as("b").limit(5))
      .select(col("a.vec_id"), col("b.vec_id"),
        VectorFunctions.dotProduct(spark, col("a.v"), col("b.v")).as("nat"),
        aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
          lit(0.0), _ + _).as("fold"))
    val bad = pairs.filter(col("nat") =!= col("fold")).count()
    assert(bad == 0, s"$bad pairs differ")
    assert(pairs.count() == 2500)
  }

  test("null and length edge cases") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),   // 11.0
      (Seq(1.0), Seq(1.0, 2.0))          // length mismatch → null
    ).toDF("a", "b")
    val r = df.select(call_function("graft_dot", col("a"), col("b")).as("d"))
      .collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0))
    val withNull = spark.sql(
      "SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS d")
    assert(withNull.collect()(0).isNullAt(0))
    assert(spark.sql("SELECT graft_dot(NULL, array(1.0d)) AS d")
      .collect()(0).isNullAt(0))
  }
}
