package graft

import org.apache.spark.sql.functions._

import graft.similarity.SparseCosine

/** SparseCosine must equal the brute-force cosine over the SAME quantized
  * df-capped vectors, pair for pair — and its integer threshold test must
  * agree with the float definition it replaces.
  */
class SparseCosineSpec extends SparkSpec {

  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toSeq.toDF("d", "text")
      .select(col("d"), explode(split(col("text"), " ")).as("w"))

  test("identical documents score cosine 1 and survive any threshold") {
    val p = SparseCosine.pairs(
      toks((1L, "a b c"), (2L, "a b c"), (3L, "x y z")),
      "d", "w", 99, 100, maxDf = 10)
      .collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getAs[Long]("da") == 1L && r.getAs[Long]("db") == 2L)
    assert(r.getAs[Double]("cos") == 1.0)
  }

  test("threshold test matches brute force over the quantized vectors") {
    val data = Seq(
      (1L, "apple banana cherry banana"),
      (2L, "apple banana date"),
      (3L, "cherry date elderberry"),
      (4L, "fig grape apple"),
      (5L, "banana banana banana cherry"))
    val n = data.length
    // brute force in the driver over the identical quantization
    val tf = data.flatMap { case (d, t) =>
      t.split(" ").groupBy(identity).map { case (w, o) => (d, w, o.length) }
    }
    val df = tf.groupBy(_._2).map { case (w, rs) => w -> rs.size }
    val wq = tf.map { case (d, w, f) =>
      (d, w, math.floor(f.toDouble * math.log(n.toDouble / df(w)) * 1e3
        + 0.5).toLong)
    }.filter(_._3 != 0L)
    val byDoc = wq.groupBy(_._1).map { case (d, rs) =>
      d -> rs.map(r => r._2 -> r._3).toMap
    }
    def cos(a: Map[String, Long], b: Map[String, Long]): (Long, Long, Long) = {
      val dot = a.keySet.intersect(b.keySet).toSeq.map(k => a(k) * b(k)).sum
      (dot, a.values.map(v => v * v).sum, b.values.map(v => v * v).sum)
    }
    val want = (for {
      da <- byDoc.keys; db <- byDoc.keys if da < db
      (dot, na2, nb2) = cos(byDoc(da), byDoc(db))
      if dot > 0 && 9L * dot * dot >= 4L * na2 * nb2 // tau = 2/3
    } yield (da, db, dot, na2, nb2)).toSet
    val got = SparseCosine.pairs(toks(data.map(r => (r._1, r._2)): _*),
        "d", "w", 2, 3, maxDf = n.toLong)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Long]("dot"), r.getAs[Long]("na2"), r.getAs[Long]("nb2")))
      .toSet
    assert(want.nonEmpty, "test corpus must produce at least one pair")
    assert(got == want)
  }

  test("df cap removes ubiquitous tokens from dots AND norms") {
    // "the" appears in all 3 docs; cap df at 2 → vectors exclude it
    val p = SparseCosine.pairs(
      toks((1L, "the a"), (2L, "the a"), (3L, "the b")),
      "d", "w", 1, 2, maxDf = 2)
      .collect()
    assert(p.length == 1) // only (1,2) share 'a'; 'the' is capped out
    assert(p.head.getAs[Double]("cos") == 1.0)
  }
}
