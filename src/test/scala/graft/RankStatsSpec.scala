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

  private def gini(rows: Seq[(String, Long)]) =
    RankStats.gini(rows.toDF("g", "v"), "v", "g")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

  test("Gini: perfect equality gives 0") {
    val g = gini(Seq(("x", 5L), ("x", 5L), ("x", 5L), ("x", 5L)))
    assert(g("x") == 0.0)
  }

  test("Gini: hand-computed {1,2,3,4} -> 0.25") {
    // G = 2*(1*1+2*2+3*3+4*4)/(4*10) − 5/4 = 60/40 − 1.25 = 0.25
    val g = gini(Seq(("x", 1L), ("x", 2L), ("x", 3L), ("x", 4L)))
    assert(g("x") == 0.25)
  }

  test("Gini: ties match the expanded-rank closed form, per group") {
    // {2,2,4}: sorted ranks 1,2,3 → G = 2*(2+4+12)/(3*8) − 4/3 = 1/6
    // (assert with the identical IEEE expression — 1.5 − 4/3 in doubles);
    // second group checks group isolation: {1,3} → 2*(1+6)/(2*4) − 3/2 = 1/4
    val g = gini(Seq(("a", 2L), ("a", 2L), ("a", 4L),
      ("b", 1L), ("b", 3L)))
    assert(g("a") == 1.5 - 4.0 / 3.0 && g("b") == 0.25)
  }

  test("Gini: single extreme holder approaches (n-1)/n") {
    // {0,0,0,10}: G = 2*4*10/(4*10) − 5/4 = 2 − 1.25 = 0.75 = (n−1)/n
    val g = gini(Seq(("x", 0L), ("x", 0L), ("x", 0L), ("x", 10L)))
    assert(g("x") == 0.75)
  }

  private def spearman(rows: Seq[(String, Long, Long)]) =
    RankStats.spearman(rows.toDF("g", "x", "y"), "x", "y", "g")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

  test("Spearman: perfect monotone relation gives ±1") {
    val inc = spearman(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 90L),
      ("a", 4L, 91L)))
    assert(inc("a") == 1.0)
    val dec = spearman(Seq(("a", 1L, 91L), ("a", 2L, 90L), ("a", 3L, 20L),
      ("a", 4L, 10L)))
    assert(dec("a") == -1.0)
  }

  test("Spearman: textbook no-ties case matches 1 - 6*sum(d^2)/(n(n^2-1))") {
    // x ranks 1..5; y = (2,1,4,3,5) → d² sum = 1+1+1+1+0 = 4
    // ρ = 1 − 24/120 = 0.8
    val r = spearman(Seq(("a", 1L, 20L), ("a", 2L, 10L), ("a", 3L, 40L),
      ("a", 4L, 30L), ("a", 5L, 50L)))
    assert(math.abs(r("a") - 0.8) < 1e-12)
  }

  test("Spearman: ties use midranks (scipy.spearmanr semantics), per group") {
    // x = (1,1,2), y = (10,20,30): x midranks (1.5,1.5,3), y ranks (1,2,3)
    // Pearson of ranks = cov/σxσy = (0.5·... ) → scipy gives 0.866025...
    val r = spearman(Seq(("a", 1L, 10L), ("a", 1L, 20L), ("a", 2L, 30L),
      ("b", 1L, 1L), ("b", 2L, 2L)))
    assert(math.abs(r("a") - 0.8660254037844387) < 1e-12)
    assert(r("b") == 1.0)
  }

  private def medianMad(rows: Seq[(String, Long)]) =
    RankStats.medianMad(rows.toDF("g", "v"), "v", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("medianMad: even count, one gross outlier flagged") {
    // {1,2,3,4,5,100}: med = 3.5 (med2 = 7); d = {5,3,1,1,3,193};
    // MAD = 1.5 (mad4 = 6); only 100 exceeds 0.6745·2d > 3.5·mad4
    val m = medianMad(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("a", 5L), ("a", 100L)))
    assert(m("a") == ((6L, 7L, 6L, 1L)))
  }

  test("medianMad: odd count and MAD=0 degrade to any-deviation flags") {
    // {5,5,5}: med2 = 10, all d = 0, mad4 = 0, no outliers;
    // {5,5,9}: med2 = 10, d = {0,0,8}, mad4 = 0 → the single deviant flags
    val m = medianMad(Seq(("a", 5L), ("a", 5L), ("a", 5L),
      ("b", 5L), ("b", 5L), ("b", 9L)))
    assert(m("a") == ((3L, 10L, 0L, 0L)))
    assert(m("b") == ((3L, 10L, 0L, 1L)))
  }
}
