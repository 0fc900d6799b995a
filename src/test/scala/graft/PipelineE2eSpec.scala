package graft

import graft.queries.DedupCatalog

/** Semantic invariants of the composed curation funnel (q_pipeline_e2e),
  * beyond the oracle gate: the funnel only ever shrinks (each stage
  * consumes the previous stage's survivors), stages arrive in order, and
  * the exact-dedup stage agrees with an independent distinct-fingerprint
  * count.
  */
class PipelineE2eSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_pipeline_e2e: monotone funnel, ordered stages, exact stage " +
    "matches distinct fingerprints") {
    val rows = DedupCatalog.dPipelineE2e.query(spark, sf).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("input", "exact_dedup", "near_dedup", "quality_gate",
        "repetition_gate"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs.head > 0, "empty input")
    docs.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"funnel grew: $a -> $b") }
    toks.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"token funnel grew: $a -> $b") }

    import org.apache.spark.sql.functions._
    val distinctFps = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull)
      .select(graft.text.TextAnalysis.fingerprint(col("text")))
      .distinct().count()
    assert(docs(1) == distinctFps,
      s"exact_dedup kept ${docs(1)} docs, expected $distinctFps " +
        "distinct fingerprints")
  }

  test("q_pipeline_pack_e2e: budgets respected, packing conserves tokens") {
    val rows = graft.queries.TextCatalog.tPackE2e.query(spark, sf).collect()
    assert(rows.nonEmpty, "empty manifest")
    val packedTotal = rows.head.getAs[Long]("packed_tokens")
    assert(rows.map(_.getAs[Long]("packed_tokens")).distinct.length == 1,
      "global packed_tokens differs across manifest rows")
    assert(rows.map(_.getAs[Long]("sel_tokens")).sum == packedTotal,
      "packing lost or invented tokens")
    rows.foreach { r =>
      val (src, b, selTok) = (r.getAs[String]("source"),
        r.getAs[Long]("budget"), r.getAs[Long]("sel_tokens"))
      assert(selTok <= b, s"$src overfilled: $selTok > budget $b")
      assert(r.getAs[Double]("fill_ratio") <= 1.0 + 1e-12)
      assert(r.getAs[Long]("bins_touched") <=
        r.getAs[Long]("total_bins"), s"$src touches phantom bins")
      assert(r.getAs[Long]("n_sel") > 0, s"$src selected nothing")
    }
  }

  test("q_pipeline_stream_e2e: two chained stateful operators match the " +
    "batch distinct-aggregate and the dedup stage is not a no-op") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.EventsCatalog.ePipelineStream.query(spark, sf)
      .collect().map(r => (r.getAs[Long]("hour_us"),
        r.getAs[String]("event_type"), r.getAs[Long]("n_active")))
    val ev = graft.queries.QueryDef.events(spark, sf)
    val want = ev
      .select(col("user_id"), col("event_type"),
        (col("ts") - pmod(col("ts"), lit(3600000000L))).as("hour_us"))
      .distinct()
      .groupBy("hour_us", "event_type").agg(count(lit(1)).as("n_active"))
      .orderBy("hour_us", "event_type")
      .collect().map(r => (r.getAs[Long]("hour_us"),
        r.getAs[String]("event_type"), r.getAs[Long]("n_active")))
    assert(got.toSeq == want.toSeq,
      s"streaming pipeline diverged from batch (got ${got.length} rows, " +
        s"want ${want.length})")
    val raw = ev.count()
    assert(got.map(_._3).sum < raw,
      "per-hour dedup removed nothing — the stage is a no-op on this data")
  }

  test("q_pipeline_mm_e2e: every odd image clusters with its even " +
    "sibling, 8 clusters, keep-min") {
    val rows = graft.queries.MultimodalCatalog.mmPipelineE2e
      .query(spark, sf).collect()
    assert(rows.length == 16, s"expected 16 images, got ${rows.length}")
    rows.foreach { r =>
      val (id, cl, keep) = (r.getAs[Long]("img_id"),
        r.getAs[Long]("cluster"), r.getAs[Boolean]("keep"))
      assert(cl == id - (id % 2),
        s"image $id landed in cluster $cl, expected its even sibling " +
          s"${id - (id % 2)} — banding/verify/CC broke the planted pairs")
      assert(keep == (id % 2 == 0), s"keep-min violated at image $id")
    }
    assert(rows.map(_.getAs[Long]("cluster")).distinct.length == 8)
  }

  test("q_pipeline_ivfpq_e2e: self wins rank 1 in its own cell, adc " +
    "monotone within each query") {
    val rows = graft.queries.SimilarityCatalog.sIvfPq.query(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nn_id"), r.getAs[Double]("adc")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 5, s"expected 5 queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      // rank 1 is always the query's own vector (its residual encodes to
      // itself-adjacent codes, adc ≈ 0) and is dropped — the surviving
      // ranks must be exactly 2..4
      assert(sorted.map(_._2).toSeq == Seq(2L, 3L, 4L),
        s"query $q ranks ${sorted.map(_._2).toSeq} — self did not win " +
          "rank 1, the ADC lookup or probe selection is broken")
      assert(!sorted.exists(_._3 == q), s"query $q returned itself")
      sorted.map(_._4).sliding(2).foreach { w =>
        assert(w(1) >= w(0), s"query $q adc not monotone with rank") }
    }
  }

  test("q_pipeline_graph_e2e: community sizes agree with q_g_labelprop, " +
    "rank mass bounds its top member") {
    val e2e = graft.queries.MiscCatalog.qGraphE2e.query(spark, sf).collect()
    assert(e2e.nonEmpty)
    e2e.foreach { r =>
      val (n, mass, topRank) = (r.getAs[Long]("n_nodes"),
        r.getAs[Long]("rank_mass"), r.getAs[Long]("top_rank"))
      assert(n >= 1 && topRank >= 1 && mass >= topRank,
        s"community ${r.getAs[Long]("community")}: mass $mass < top " +
          s"$topRank or empty")
    }
    // both gates score the IDENTICAL lpaState partition — sizes must agree
    val sizes = graft.queries.MiscCatalog.qLabelProp.query(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("seed_key") * 2 +
        (if (r.getAs[String]("seed_type") == "supplier") 1L else 0L),
        r.getAs[Long]("size"))).toMap
    val checked = e2e.flatMap { r =>
      sizes.get(r.getAs[Long]("community"))
        .map(sz => (r.getAs[Long]("community"), r.getAs[Long]("n_nodes"), sz))
    }
    assert(checked.nonEmpty, "no community overlap between the two gates")
    checked.foreach { case (c, n, sz) =>
      assert(n == sz, s"community $c: e2e n_nodes $n != labelprop size $sz")
    }
  }

  test("q_pipeline_cdc_e2e: incremental view exactly equals full " +
    "recompute, row conservation holds") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.MiscCatalog.qCdcE2e.query(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("consistent"),
        s"segment ${r.getAs[String]("seg")}: incremental aggregate " +
          "diverged from full recompute — the delta algebra is wrong")
    }
    assert(rows.exists(_.getAs[String]("seg") == "UPSERTED"),
      "updates/inserts never landed in the UPSERTED segment")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val nBase = cust.count()
    val nDel = cust.filter(col("c_custkey") % 13 === 0).count()
    val nIns = cust.filter(col("c_custkey") % 10 === 0).count()
    assert(rows.map(_.getAs[Long]("n_full")).sum == nBase - nDel + nIns,
      "merged snapshot lost or invented rows")
  }

  test("q_pipeline_ml_e2e: split partitions the feature table ~80/20, " +
    "scores are well-formed") {
    import org.apache.spark.sql.functions._
    val r = graft.queries.MiningCatalog.m53MlE2e.query(spark, sf)
      .collect()(0)
    val (nTr, nTe) = (r.getAs[Long]("n_train"), r.getAs[Long]("n_test"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val nFeat = li.select(col("l_returnflag"),
        date_trunc("day", col("l_shipdate"))).distinct().count() -
      li.select("l_returnflag").distinct().count() // first day per flag
    assert(nTr + nTe == nFeat,
      s"split lost rows: $nTr + $nTe != $nFeat feature rows")
    val frac = nTr.toDouble / (nTr + nTe)
    assert(frac > 0.75 && frac < 0.85,
      s"content-addressed 80/20 split came out at $frac")
    assert(r.getAs[Double]("mse") >= 0.0)
    assert(r.getAs[Double]("r2_score") <= 1.0)
  }

  // ---- degenerate-path property tests (r13 verdict order #5): drive
  // each composed-gate stage to ZERO survivors / a single-row train split
  // and assert the pipeline still reports instead of erroring — the
  // trivially-empty-filter trap a fixed-threshold gate never exercises.

  test("q_pipeline_e2e: quality gate driven to zero survivors reports 0 " +
    "docs downstream without erroring") {
    val rows = DedupCatalog
      .curationFunnel(spark, sf, minTokens = Int.MaxValue)
      .collect()
    assert(rows.length == 5, "stage rows missing")
    val byStage = rows.map(r =>
      r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(byStage("near_dedup") > 0, "upstream emptied unexpectedly")
    assert(byStage("quality_gate") == 0,
      s"minTokens=MaxValue should empty the quality gate, " +
        s"got ${byStage("quality_gate")}")
    assert(byStage("repetition_gate") == 0,
      "empty quality stage must flow through as 0, not error")
    val qRow = rows.find(_.getAs[String]("stage") == "quality_gate").get
    assert(qRow.isNullAt(qRow.fieldIndex("n_tokens")) ||
      qRow.getAs[Long]("n_tokens") == 0L,
      "token sum over zero docs must be null/0")
  }

  test("q_pipeline_e2e: repetition gate driven to zero survivors " +
    "reports 0 while quality stage stays populated") {
    val rows = DedupCatalog
      .curationFunnel(spark, sf, minDistinct = 1.5) // ratio ≤ 1 by def
      .collect()
    val byStage = rows.map(r =>
      r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(byStage("quality_gate") > 0, "quality gate should still pass docs")
    assert(byStage("repetition_gate") == 0,
      "minDistinct>1 must empty the repetition gate without erroring")
  }

  test("q_pipeline_ml_e2e: single-row train split (zero x-variance) " +
    "still yields the one audit row") {
    import org.apache.spark.sql.functions._
    val feat = graft.queries.MiningCatalog.mlE2eFeat(spark, sf)
    val us = feat.select("u").orderBy("u").limit(2).collect()
      .map(_.getDouble(0))
    assert(us.length == 2 && us(0) < us(1), "need ≥2 distinct u values")
    val frac = (us(0) + us(1)) / 2 // exactly one row below the split
    val rows = graft.queries.MiningCatalog.mlE2eFit(feat, frac).collect()
    assert(rows.length == 1, "degenerate fit must still emit its audit row")
    val r = rows(0)
    assert(r.getAs[Long]("n_train") == 1L,
      s"expected 1 train row, got ${r.getAs[Long]("n_train")}")
    assert(r.getAs[Long]("n_test") >= 1L)
    // slope divides by zero x-variance — the collect() above succeeding
    // is the property under test; NaN/null slope values are acceptable
  }

  test("q_pipeline_ml_e2e: empty train split still yields the audit row") {
    val feat = graft.queries.MiningCatalog.mlE2eFeat(spark, sf)
    val rows = graft.queries.MiningCatalog.mlE2eFit(feat, 0.0).collect()
    assert(rows.length == 1, "empty train must still emit its audit row")
    assert(rows(0).getAs[Long]("n_train") == 0L)
  }
}
