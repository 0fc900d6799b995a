package graft

import org.apache.spark.sql.functions._

import graft.plans.HilbertCurve

/** Hilbert index properties: the Column expression matches the plain-Scala
  * recurrence exhaustively, the index is a permutation of the grid, and —
  * the reason to prefer it over Z-order for layout — consecutive indexes
  * are always Manhattan-adjacent cells, so contiguous index ranges are
  * tight key-space rectangles.
  */
class HilbertCurveSpec extends SparkSpec {

  test("expression matches the Scala recurrence on a full 6-bit grid") {
    val sp = spark
    import sp.implicits._
    val bits = 6
    val n = 1 << bits
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val got = grid
      .withColumn("d", HilbertCurve.index(col("x"), col("y"), bits))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) =>
      assert(d == HilbertCurve.indexScala(x, y, bits),
        s"($x,$y): expr $d != scala ${HilbertCurve.indexScala(x, y, bits)}")
    }
  }

  test("index is a permutation of [0, 4^bits) and consecutive cells are " +
      "Manhattan-adjacent") {
    val bits = 5
    val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n }
      yield (HilbertCurve.indexScala(x, y, bits), x, y)
    val sorted = cells.sortBy(_._1)
    assert(sorted.map(_._1) == (0L until (n.toLong * n)).toSeq,
      "indexes are not a permutation of the grid")
    sorted.sliding(2).foreach {
      case Seq((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"jump from ($x1,$y1) to ($x2,$y2)")
      case _ => ()
    }
  }

  test("quadrant prefix property: the top two index bits pin the quadrant") {
    val bits = 4
    val n = 1 << bits
    for { x <- 0 until n; y <- 0 until n } {
      val d = HilbertCurve.indexScala(x, y, bits)
      val quadrant = d >> (2 * (bits - 1)) // which quarter of the curve
      // each quarter of the curve stays inside one spatial quadrant
      val (qx, qy) = (x >> (bits - 1), y >> (bits - 1))
      val expected = (qx, qy) match {
        case (0, 0) => 0L
        case (0, 1) => 1L
        case (1, 1) => 2L
        case (1, 0) => 3L
        case other  => sys.error(s"impossible quadrant $other")
      }
      assert(quadrant == expected, s"($x,$y) d=$d")
    }
  }

  test("withIndex (the projection-chain form) matches the recurrence at " +
      "16 bits, where the single-expression form cannot even plan") {
    val sp = spark
    import sp.implicits._
    val bits = 16
    val pts = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L), (1L, 40000L), (32768L, 32767L))
    val got = HilbertCurve.withIndex(
      pts.toDF("x", "y"), col("x"), col("y"), bits, "d")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) =>
      assert(d == HilbertCurve.indexScala(x, y, bits), s"($x,$y)")
    }
  }

  test("out-of-domain values fold into the top cell instead of corrupting " +
      "the index") {
    val sp = spark
    import sp.implicits._
    val bits = 4
    val top = (1L << bits) - 1
    val got = Seq((999L, 999L)).toDF("x", "y")
      .select(HilbertCurve.index(col("x"), col("y"), bits).as("d"))
      .as[Long].head()
    assert(got == HilbertCurve.indexScala(top, top, bits))
  }
}
