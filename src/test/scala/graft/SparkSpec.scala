package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + golden-compare helpers for all suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  val refDir = "/root/reference"
  val sfSmoke = "/root/testdata/sf0.001"
  val sfCorrect = "/root/testdata/sf0.01"

  /** Compare two frames after sorting rows by `sortCols`: same row count,
    * same columns, per-cell equality with `tol` for floating point.
    */
  def assertSameData(
      got: DataFrame,
      want: DataFrame,
      sortCols: Seq[String],
      tol: Double = 1e-9): Unit = {
    assert(
      got.columns.sorted.toSeq == want.columns.sorted.toSeq,
      s"column mismatch: got ${got.columns.toSeq} want ${want.columns.toSeq}")
    val cols = want.columns.toSeq
    val g = got.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    val w = want
      .orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    assert(g.length == w.length, s"row count: got ${g.length} want ${w.length}")
    g.zip(w).zipWithIndex.foreach { case ((gr, wr), i) =>
      cols.indices.foreach { j =>
        val (gv, wv) = (gr.get(j), wr.get(j))
        (gv, wv) match {
          case (null, null) => ()
          case (a: Double, b: Double) =>
            assert(
              (a.isNaN && b.isNaN) || math.abs(a - b) <= tol * math.max(1.0, math.abs(b)),
              s"row $i col ${cols(j)}: got $a want $b")
          case (a: Float, b: Float) =>
            assert(math.abs(a - b) <= tol * math.max(1.0, math.abs(b)),
              s"row $i col ${cols(j)}: got $a want $b")
          case (a, b) =>
            assert(a != null && a.toString == String.valueOf(b),
              s"row $i col ${cols(j)}: got $a want $b")
        }
      }
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // pandas-like float semantics
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
