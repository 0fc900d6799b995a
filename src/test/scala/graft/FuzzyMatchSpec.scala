package graft

import org.apache.spark.sql.functions._

import graft.dedup.FuzzyMatch

/** dedup.FuzzyMatch semantics on crafted names: blocking really prunes,
  * distances are classic Levenshtein, exact duplicates (dist 0) and
  * beyond-threshold pairs are excluded, ids come out ordered.
  */
class FuzzyMatchSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (1L, "acme corp", "A"),
    (2L, "acme corpx", "A"),  // dist 1 from acme corp, same block
    (3L, "acme corp", "A"),   // exact dup of 1 — dist 0, excluded
    (4L, "acme corp", "B"),   // dist 1-able names but different block
    (5L, "zenith ltd", "A")   // same block key col, different first token
  ).toDF("id", "name", "grp")

  private def run(maxDist: Int) =
    FuzzyMatch.pairs(df, "id", "name",
      Seq(col("grp"), split(col("name"), " ").getItem(0)), maxDist)
      .select("id1", "id2", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("finds the near-dup, skips exact dups and cross-block pairs") {
    // (1,3) dist 0 excluded; (1,4)/(3,4) blocked apart; 5 blocked apart
    assert(run(4) == Set((1L, 2L, 1L), (2L, 3L, 1L)))
  }

  test("threshold excludes beyond-maxDist pairs") {
    val wide = Seq(
      (1L, "aaaa x", "A"),
      (2L, "aabb x", "A") // dist 2
    ).toDF("id", "name", "grp")
    val one = FuzzyMatch.pairs(wide, "id", "name", Seq(col("grp")), 1)
      .count()
    val two = FuzzyMatch.pairs(wide, "id", "name", Seq(col("grp")), 2)
      .count()
    assert(one == 0 && two == 1)
  }

  test("id1 < id2 always") {
    val r = FuzzyMatch.pairs(df, "id", "name",
      Seq(split(col("name"), " ").getItem(0)), 4)
      .select("id1", "id2")
      .collect()
    assert(r.nonEmpty && r.forall(x => x.getLong(0) < x.getLong(1)))
  }
}
