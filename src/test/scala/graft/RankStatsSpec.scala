package graft

import graft.analytics.RankStats

/** analytics.RankStats against hand-computed Mann–Whitney values — the
  * formula gate the DuckDB oracle can't provide (it replays the same
  * computation, proving cross-engine equality, not textbook correctness).
  */
class RankStatsSpec extends SparkSpec {

  import spark.implicits._

  private def mwu(rows: Seq[(Long, String)]) =
    RankStats.mannWhitney(rows.toDF("v", "g"), "v", "g", "A")
      .collect().head

  test("no ties: A={1,2,4}, B={3,5} -> U_A = 1 + 2 + 0 = 4? textbook") {
    // ranks: 1→1, 2→2, 3→3, 4→4, 5→5; rankSum_A = 1+2+4 = 7
    // U_A = rankSum_A − n_a(n_a+1)/2 = 7 − 6 = 1
    val r = mwu(Seq((1L, "A"), (2L, "A"), (4L, "A"), (3L, "B"), (5L, "B")))
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0)
  }

  test("U_A + U_B = n_a * n_b") {
    val data = Seq((10L, "A"), (20L, "A"), (15L, "B"), (25L, "B"),
      (30L, "A"), (5L, "B"))
    val uA = mwu(data).getDouble(2)
    val uB = mwu(data.map { case (v, g) =>
      (v, if (g == "A") "B" else "A") }).getDouble(2)
    assert(uA + uB == 3.0 * 3.0)
  }

  test("ties get averaged ranks") {
    // A={1,2}, B={2,3}: ranks 1→1, 2→2.5 (avg of 2,3), 3→4
    // rankSum_A = 1 + 2.5 = 3.5; U_A = 3.5 − 3 = 0.5
    val r = mwu(Seq((1L, "A"), (2L, "A"), (2L, "B"), (3L, "B")))
    assert(r.getDouble(2) == 0.5)
  }

  private def ks(rows: Seq[(Long, String)]) =
    RankStats.kolmogorovSmirnov(rows.toDF("v", "g"), "v", "g", "A")
      .collect().head

  test("KS: disjoint supports give D = 1") {
    val r = ks(Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B")))
    assert(r.getDouble(2) == 1.0)
  }

  test("KS: identical samples give D = 0") {
    val r = ks(Seq((1L, "A"), (2L, "A"), (1L, "B"), (2L, "B")))
    assert(r.getDouble(2) == 0.0)
  }

  test("KS: hand-computed interleaved case") {
    // A={1,3}, B={2,4}: F_A−F_B at v=1: 1/2−0; v=2: 1/2−1/2; v=3: 1−1/2;
    // v=4: 1−1 → D = 1/2
    val r = ks(Seq((1L, "A"), (3L, "A"), (2L, "B"), (4L, "B")))
    assert(r.getDouble(2) == 0.5)
  }

  test("identical distributions give z = 0") {
    // perfectly symmetric: U_A = meanU exactly
    val r = mwu(Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "B"),
      (5L, "B"), (6L, "A"), (7L, "B"), (8L, "A")))
    assert(math.abs(r.getDouble(3)) < 1e-12 ||
      r.getDouble(2) == 4.0 * 4.0 / 2.0)
  }
}
