package graft

import graft.analytics.HoltWinters

/** Holt–Winters kernel properties: agreement with an independently-written
  * textbook implementation, signal recovery on a constructed series, and
  * the short-series guard.
  */
class HoltWintersSpec extends SparkSpec {

  // independent reference implementation (map-based seasonal index, no
  // ring buffer — a structurally different spelling of the same math)
  private def reference(ys: Seq[Double], m: Int, a: Double, b0: Double,
      g: Double): Seq[(Int, Double, Double, Double, Double)] = {
    if (ys.length < 2 * m + 1) return Seq.empty
    val m1 = ys.take(m).map(BigDecimal(_)).sum.toDouble / m
    val m2 = ys.slice(m, 2 * m).map(BigDecimal(_)).sum.toDouble / m
    var l = m1
    var b = (m2 - m1) / m
    val season = scala.collection.mutable.Map[Int, Double]()
    (0 until m).foreach(i => season(i + 1) = ys(i) - m1)
    (m until ys.length).map { t0 =>
      val t = t0 + 1
      val y = ys(t0)
      val sOld = season(t - m)
      val fitted = l + b + sOld
      val l1 = a * (y - sOld) + (1 - a) * (l + b)
      val b1 = b0 * (l1 - l) + (1 - b0) * b
      season(t) = g * (y - l1) + (1 - g) * sOld
      l = l1
      b = b1
      (t, l1, b1, season(t), fitted)
    }
  }

  test("kernel matches an independent textbook implementation") {
    val ys = (0 until 40).map(t =>
      100.0 + 0.5 * t + Seq(3.0, -2.0, 1.0, 0.0, -1.5, 2.5, -3.0)(t % 7))
      .toIndexedSeq
    val got = HoltWinters.fit(ys, 7, 0.3, 0.1, 0.2)
    val want = reference(ys, 7, 0.3, 0.1, 0.2)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, (t, l, b, s, f)) =>
      assert(g.t == t)
      assert(math.abs(g.level - l) < 1e-12, s"level at $t")
      assert(math.abs(g.trend - b) < 1e-12, s"trend at $t")
      assert(math.abs(g.season - s) < 1e-12, s"season at $t")
      assert(math.abs(g.fitted - f) < 1e-12, s"fitted at $t")
    }
  }

  test("recovers trend and seasonal deltas on a clean constructed series") {
    val pattern = Seq(4.0, -3.0, 2.0, -1.0, 0.0, 1.0, -3.0)
    val ys = (0 until 200).map(t => 50.0 + 0.25 * t + pattern(t % 7))
      .toIndexedSeq
    val steps = HoltWinters.fit(ys, 7, 0.3, 0.1, 0.2)
    val tail = steps.takeRight(7)
    // converged trend ≈ the true slope; seasonal states ≈ the pattern
    tail.foreach(st => assert(math.abs(st.trend - 0.25) < 0.05,
      s"trend ${st.trend}"))
    val gotSeason = tail.map(st => (st.t - 1) % 7 -> st.season).toMap
    pattern.indices.foreach { i =>
      assert(math.abs(gotSeason(i) - pattern(i)) < 0.3,
        s"season $i: ${gotSeason(i)} vs ${pattern(i)}")
    }
    // one-step forecasts track the clean series closely once converged
    tail.foreach { st =>
      assert(math.abs(st.fitted - ys(st.t - 1)) < 0.5,
        s"fitted at ${st.t}")
    }
  }

  test("series shorter than two full init seasons yields no fit; the " +
      "recurrence re-smooths from season 2 onward") {
    assert(HoltWinters.fit(IndexedSeq.fill(14)(1.0), 7, 0.3, 0.1, 0.2).isEmpty)
    // len 15: init consumes y1..y14, steps run over y8..y15 (season 2 is
    // re-smoothed — the classical convention, mirrored by the oracle)
    assert(HoltWinters.fit(IndexedSeq.fill(15)(1.0), 7, 0.3, 0.1, 0.2).length == 8)
  }
}
