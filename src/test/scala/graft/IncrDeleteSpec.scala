package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Tombstone deletes in the funnel IVM (q_pipeline_incr_delete, r14
  * verdict order #4): the gate's consistency flags prove the incremental
  * COUNTS equal the full recompute, but counts alone cannot distinguish
  * "the suppressed copy resurfaced" from "the original was retained" —
  * both leave the exact-stage count unchanged. This spec pins keeper
  * IDENTITY for every planted delete shape:
  *   - RESURFACE: deleting a base original whose fp suppressed a batch-1
  *     copy makes the COPY the keeper;
  *   - NO-OP: deleting only the suppressed copy leaves the ORIGINAL the
  *     keeper;
  *   - VANISH: deleting both members removes the fingerprint entirely.
  * Plus the gate-level invariant at both SFs: four rows, all consistent.
  */
class IncrDeleteSpec extends SparkSpec {

  private def gateRows(sf: String) =
    graft.queries.DedupCatalog.all
      .find(_.name == "q_pipeline_incr_delete").get
      .query(spark, sf).collect()

  test("q_pipeline_incr_delete: four stages, all consistent (both SFs)") {
    Seq(sfSmoke, sfCorrect).foreach { sf =>
      val rows = gateRows(sf)
      assert(rows.length == 4, s"$sf: expected 4 stage rows")
      rows.foreach { r =>
        assert(r.getAs[Boolean]("consistent"),
          s"$sf: stage ${r.getAs[String]("stage")} inconsistent: $r")
      }
      // non-vacuous: the input stage equals base + inserts − tombstones,
      // with a strictly positive tombstone count
      val input = rows.find(_.getAs[String]("stage") == "input").get
      val base = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("text").isNotNull).localCheckpoint(true)
      def n(cond: org.apache.spark.sql.Column) = base.filter(cond).count()
      val inserts = n(col("doc_id") % 37 === 1) +
        n(col("doc_id") % 41 === 1) + 2 * n(col("doc_id") % 53 === 1) +
        n(col("doc_id") % 43 === 1) + n(col("doc_id") % 47 === 1)
      val dels = n(col("doc_id") % 37 === 1 && col("doc_id") % 2 === 0) +
        n(col("doc_id") % 41 === 1 && col("doc_id") % 3 === 0) +
        n(col("doc_id") % 37 === 1 && col("doc_id") % 5 === 0)
      assert(dels > 0, s"$sf: no tombstones planted")
      assert(input.getAs[Long]("n_docs_full") == base.count() + inserts - dels,
        s"$sf: input stage is not base + inserts - tombstones")
    }
  }

  test("keeper succession: resurface, no-op, and vanish shapes") {
    val base = spark.read.parquet(s"$sfCorrect/documents.parquet")
      .filter(col("text").isNotNull).select("doc_id", "text")
      .localCheckpoint(true)
    // the gate's class-1 copies and its three tombstone classes
    val copies = base.filter(col("doc_id") % 37 === 1)
      .select((-(col("doc_id") * 10 + lit(1))).as("doc_id"), col("text"))
    val corpus = base.withColumn("batch", lit(0))
      .unionByName(copies.withColumn("batch", lit(1)))
      .withColumn("fp", md5(graft.text.TextAnalysis.normText(col("text"))))
    val delIds = base
      .filter(col("doc_id") % 37 === 1 && col("doc_id") % 2 === 0)
      .select(col("doc_id"))
      .unionByName(base
        .filter(col("doc_id") % 37 === 1 && col("doc_id") % 5 === 0)
        .select((-(col("doc_id") * 10 + lit(1))).as("doc_id")))
    val keepers = corpus.join(delIds, Seq("doc_id"), "left_anti")
      .withColumn("__rn", row_number().over(Window.partitionBy("fp")
        .orderBy(col("batch"), col("doc_id"))))
      .filter(col("__rn") === 1)
      .select("doc_id", "fp")
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val fpOf = corpus.filter(col("batch") === 0)
      .select("doc_id", "fp").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val origIds = fpOf.keys.filter(_ % 37 == 1).toSeq.sorted
    val resurface = origIds.filter(d => d % 2 == 0 && d % 5 != 0)
    val noop = origIds.filter(d => d % 5 == 0 && d % 2 != 0)
    val vanish = origIds.filter(d => d % 10 == 0)
    assert(resurface.nonEmpty && noop.nonEmpty && vanish.nonEmpty,
      s"a delete shape is unplanted: r=$resurface n=$noop v=$vanish")
    resurface.foreach { d =>
      assert(keepers.get(fpOf(d)).contains(-(d * 10 + 1)),
        s"fp of deleted original $d not inherited by its copy: " +
          s"keeper=${keepers.get(fpOf(d))}")
    }
    noop.foreach { d =>
      assert(keepers.get(fpOf(d)).contains(d),
        s"deleting only the copy of $d changed the keeper: " +
          s"${keepers.get(fpOf(d))}")
    }
    vanish.foreach { d =>
      assert(!keepers.contains(fpOf(d)),
        s"fp of doubly-deleted group $d still has keeper " +
          s"${keepers.get(fpOf(d))}")
    }
  }
}
