package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.similarity.IvfPqIndex

/** Persisted IVF-PQ with exact re-rank (q_s_ivfpq_persist, r14 verdict
  * order #3): beyond the oracle hash, pin the claims that make this the
  * storage-bounded 100 TB layout:
  *   1. CODES-ONLY LISTS — the inverted-list schema carries no raw
  *      vector, and the lists' on-disk bytes are a small fraction of the
  *      raw side table's (the whole point of PQ);
  *   2. PRUNING — the probe's codes scan reads only the probed cells'
  *      partition directories;
  *   3. EXACT RE-RANK — every returned cosine is bit-identical to a
  *      direct recompute from the raw embeddings (the refine step really
  *      consults exact vectors, not ADC approximations), results are
  *      exactly k per query, descending per query.
  */
class PersistedIvfPqSpec extends SparkSpec {

  private val nCells = 8
  private val k = 4
  private val nProbe = 3
  private val refine = 12

  private def dirBytes(p: Path): Long = {
    val st = Files.walk(p)
    try st.iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(Files.size)
      .sum
    finally st.close()
  }

  test("persisted IVF-PQ: codes-only lists, pruned probe, exact re-rank") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
      .localCheckpoint(true)
    val q = e.filter(col("vec_id") < 5).localCheckpoint(true)
    val stage = Files.createTempDirectory("graft_ivfpq_spec")
    try {
      IvfPqIndex.write(e, "vec_id", "embedding", nCells, 64, 8, 16,
        stage.toString)

      // 1a. the lists carry codes only — no vector column
      val lists = graft.sources.ManifestedPartitions.readLatest(
        spark, stage.toString, "lists", "cell")
      assert(lists.schema.fieldNames.sorted.toSeq == Seq("cell", "codes", "id"),
        s"unexpected list schema: ${lists.schema.fieldNames.toSeq}")
      // 1b. bytes(codes lists) ≪ bytes(raw side table): 8 int codes vs 64
      // doubles per row is 32× logical; parquet encoding keeps it ≥ 4×
      // even at this tiny SF (dictionary+RLE shine on the codes)
      val listsB = dirBytes(stage.resolve("lists"))
      val rawB = dirBytes(stage.resolve("raw"))
      assert(listsB * 4 < rawB,
        s"codes lists $listsB B not ≪ raw $rawB B — PQ compression lost")

      // 2. pruning: the codes scan touches only probed partitions — the
      // probe constructs exactly the probed cells' live paths, so the
      // unlisted directories are never opened
      val probed = IvfPqIndex
        .queryCells(spark, stage.toString, q, "vec_id", "embedding", nProbe)
        .select("cell").distinct().collect().map(_.getInt(0)).toSet
      val filesRead = graft.sources.ManifestedPartitions.read(
          spark, stage.toString, "lists", "cell",
          graft.sources.ManifestedPartitions.prunedEntries(
            spark, stage.toString, "lists", probed.toSeq))
        .select(input_file_name().as("f"))
        .collect().map(_.getString(0)).toSet
      val cellsRead = filesRead.flatMap { f =>
        "cell=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)
      }
      assert(cellsRead.nonEmpty && cellsRead.subsetOf(probed),
        s"scan touched unprobed cells: ${cellsRead -- probed}")
      assert(probed.size < nCells,
        s"all $nCells cells probed — pruning test is vacuous")

      // 3. exact re-rank parity
      val res = IvfPqIndex.probe(spark, stage.toString, q,
          "vec_id", "embedding", k, nProbe, refine)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      assert(res.length == 5 * k, s"expected ${5 * k} rows, got ${res.length}")
      res.groupBy(_._1).foreach { case (qid, rows) =>
        val byRank = rows.sortBy(_._2)
        assert(byRank.map(_._2).toSeq == (1 to k),
          s"query $qid ranks not 1..$k")
        assert(byRank.map(_._4).toSeq == byRank.map(_._4).sorted.reverse.toSeq,
          s"query $qid cosines not descending")
      }
      // each cosine bit-equals a direct exact recompute of that pair —
      // the refine step consulted raw vectors, not the ADC approximation
      val exact = e.select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      def cosine(a: Seq[Double], b: Seq[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) {
          dot += a(i) * b(i); i += 1
        }
        i = 0
        while (i < a.length) { na += a(i) * a(i); i += 1 }
        i = 0
        while (i < b.length) { nb += b(i) * b(i); i += 1 }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      res.foreach { case (qid, _, nn, cos) =>
        val want = cosine(exact(nn), exact(qid))
        assert(cos == want,
          s"cos($qid,$nn)=$cos is not the exact value $want")
      }
    } finally graft.similarity.IvfIndex.deleteDir(stage.toString)
  }

  test("version-pinned probe reads codes AND raw at ONE snapshot — a " +
    "racing delete cannot tear the cross-dataset read (ADVICE r16)") {
    val e = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
      .localCheckpoint(true)
    val q = e.filter(col("vec_id") < 5).localCheckpoint(true)
    val stage = Files.createTempDirectory("graft_ivfpq_pin")
    try {
      IvfPqIndex.write(e, "vec_id", "embedding", nCells, 64, 8, 16,
        stage.toString) // v1
      def vals(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val pinned = IvfPqIndex.probe(spark, stage.toString, q,
        "vec_id", "embedding", k, nProbe, refine, version = Some(1L))
      val before = vals(pinned)
      // the delete purges a slice from BOTH datasets as version 2 — the
      // old probe's second "latest" resolution would now fetch raw
      // vectors from v2 and silently drop v1 candidates from the re-rank
      val purged = IvfPqIndex.delete(spark, stage.toString,
        e.filter(pmod(col("vec_id"), lit(9)) === 4)
          .select(col("vec_id").as("id")))
      assert(purged > 0, "delete purged nothing — test is vacuous")
      assert(vals(pinned) == before,
        "pinned probe's results changed under a concurrent delete commit")
      // the pinned snapshot still ranks TOMBSTONED vectors (they were
      // live at v1) — proof the raw fetch really reads v1, not latest
      val deadIds = e.filter(pmod(col("vec_id"), lit(9)) === 4)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(before.exists(t => deadIds.contains(t._3)),
        "pinned v1 probe returned no tombstoned vector — cannot tell " +
          "v1 raw reads from latest; strengthen the fixture")
      // a fresh (latest) probe serves the vacuumed index: none of them
      val fresh = vals(IvfPqIndex.probe(spark, stage.toString, q,
        "vec_id", "embedding", k, nProbe, refine))
      assert(!fresh.exists(t => deadIds.contains(t._3)),
        "fresh probe returned a deleted vector")
    } finally graft.similarity.IvfIndex.deleteDir(stage.toString)
  }
}
