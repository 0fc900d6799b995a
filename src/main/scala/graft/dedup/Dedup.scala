package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for a training-data pipeline (builder brief):
  * exact (hash-groupBy), n-gram Jaccard, MinHash+LSH (Broder, "On the
  * resemblance and containment of documents", 1997), SimHash (Charikar,
  * "Similarity estimation techniques from rounding algorithms", 2002), and
  * embedding-cosine near-dup via random-hyperplane LSH (same paper).
  *
  * Scale design:
  *  - exact dedup is one hash shuffle on the fingerprint;
  *  - candidate generation always goes through bounded-width keys
  *    (shingles / LSH bands / simhash chunks), never an O(n²) cross join;
  *  - hot shingles are frequency-capped (`maxShingleFreq`) so a stopword
  *    shingle can't produce a quadratic bucket at 100 TB;
  *  - verification (true Jaccard / hamming / cosine) runs only on candidate
  *    pairs.
  */
object Dedup {

  /** Eager one-shot materialization for intermediates consumed by several
    * plan subtrees (self-joins, doc-size tables, verification re-attach).
    * `localCheckpoint(eager = true)` computes the blocks ONCE, up front:
    *
    *  - no first-materialization contention: a lazy `.cache()` shared by
    *    four consumer subtrees makes concurrently-scheduled stages race
    *    per-partition compute locks — under ambient machine load that
    *    serialization inflates wall time several-fold (BENCH_r03 measured
    *    q_d_ngram_jaccard at 15.3 s in-suite vs 2.9 s isolated);
    *  - no CacheManager entry, so `spark.catalog.clearCache()` is not
    *    required — but the blocks DO stay registered with the session
    *    until unpersisted (verified empirically on Spark 4.1: GC never
    *    reclaims a locally-checkpointed RDD). Lifecycle contract: Bench/
    *    Verify unpersist via `getPersistentRDDs` between queries; long-
    *    lived callers should do the same once the operator's output is
    *    consumed (pipeline.CurationMain shows the pattern — it frees each
    *    stage's blocks as the next stage materializes);
    *  - truncated lineage: on a cluster, a lost block fails the job loudly
    *    (inputs are deterministic, so a job-level retry is safe) instead
    *    of silently recomputing one partition mid-query.
    */
  private def materialize(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  /** Like [[materialize]], but also returns a DIRECT handle on the
    * persisted RDD backing the checkpoint, so the caller can free exactly
    * the block it created — no set-differencing of the session-global
    * `sc.getPersistentRDDs` registry, which would mis-attribute (and
    * wrongly unpersist) blocks registered concurrently by unrelated
    * queries on the same session. The checkpointed Dataset's plan is a
    * scan over the persisted internal RDD, so walking the short lineage of
    * `cp.rdd` to the first node with a non-NONE storage level finds it.
    * Throws if no persisted node is found (loud, spec-covered) rather
    * than silently leaking the block.
    */
  private def materializeTracked(
      df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val cp = df.localCheckpoint(eager = true)
    def find(r: org.apache.spark.rdd.RDD[_],
        depth: Int): Option[org.apache.spark.rdd.RDD[_]] =
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        Some(r)
      else if (depth == 0) None
      else r.dependencies.iterator
        .flatMap(d => find(d.rdd, depth - 1)).nextOption()
    val backing = find(cp.rdd, 8).getOrElse {
      // loud and diagnosable: if a Spark upgrade re-layers Dataset.rdd's
      // wrappers past depth 8, the walked lineage in the message shows the
      // new shape immediately instead of forcing a debugger session
      def render(r: org.apache.spark.rdd.RDD[_], depth: Int): Seq[String] = {
        val line = s"${"  " * (8 - depth)}${r.getClass.getSimpleName}" +
          s"[${r.id}] storage=${r.getStorageLevel.description}"
        line +: (if (depth == 0) Seq.empty[String]
                 else r.dependencies.flatMap(d => render(d.rdd, depth - 1)).toSeq)
      }
      throw new IllegalStateException(
        "localCheckpoint produced no persisted RDD within lineage depth 8; " +
          "walked lineage:\n" + render(cp.rdd, 8).mkString("\n"))
    }
    (cp, backing)
  }

  // ---- exact ----

  /** Exact dedup: one keeper (min id) per normalized-content fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup applied: rows whose id is the keeper of its group. */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ---- shingles ----

  /** Distinct word n-gram shingles per document: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val toks = split(TextAnalysis.normText(lower(col(textCol))), " ")
    // guard: sequence(0, negative) counts DOWN in Spark — short docs would
    // otherwise explode into invalid indices.
    // The explode generator is a deliberate projection barrier: without it,
    // project collapsing inlines the regex split into every element_at of
    // the shingle lambda (≈ tokens×n split evaluations per row — measured
    // 8× slower). Post-explode, element_at reads the materialized array.
    val idxs = when(size(col("toks")) >= n,
      sequence(lit(0), size(col("toks")) - n))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("id"), toks.as("toks"))
      .select(col("id"), col("toks"), explode(idxs).as("i"))
      .select(col("id"),
        concat_ws(" ", (0 until n).map(k =>
          element_at(col("toks"), col("i") + k + 1)): _*).as("shingle"))
      .distinct()
  }

  /** n-gram Jaccard near-dup pairs: candidates share ≥1 shingle; exact
    * Jaccard |A∩B| / |A∪B| ≥ threshold. `maxShingleFreq` drops shingles
    * shared by more than that many docs (stopword-shingle skew guard).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.3,
      maxShingleFreq: Int = 100): DataFrame =
    jaccardPairsFromShingles(
      materialize(shingles(df, idCol, textCol, n)), threshold,
      maxShingleFreq)

  /** [[jaccardPairs]] over an ALREADY-materialized shingle table — the
    * entry point for callers that run several dedup stages over the same
    * corpus (e.g. the LSH recall audit), so the shingle explode+distinct
    * is paid once instead of per stage.
    */
  def jaccardPairsFromShingles(sh: DataFrame, threshold: Double = 0.3,
      maxShingleFreq: Int = 100): DataFrame = {
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleFreq && col("df") >= 2)
      .select("shingle")
    val shF = sh.join(rare, Seq("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = shF.as("a").join(shF.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz1") + col("sz2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Containment near-dup pairs: C(A,B) = |A∩B| / min(|A|,|B|) over the
    * same capped shingle sets as [[jaccardPairs]] — the ASYMMETRIC
    * duplication test (a short document embedded whole inside a longer
    * one scores ≈1 here while its Jaccard stays small; the "quoted
    * article inside a crawl page" case every corpus dedup also needs).
    * Same candidate bound and join shape as the Jaccard path.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.6,
      maxShingleFreq: Int = 100): DataFrame = {
    val sh = materialize(shingles(df, idCol, textCol, n))
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleFreq && col("df") >= 2)
      .select("shingle")
    val shF = sh.join(rare, Seq("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = shF.as("a").join(shF.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id1")
        .withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2")
        .withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("containment",
        col("common").cast("double")
          / least(col("sz1"), col("sz2")).cast("double"))
      .filter(col("containment") >= threshold)
      .select("id1", "id2", "common", "containment")
  }

  // ---- MinHash + LSH ----

  /** (id, band, bh) LSH band buckets of the MinHash signature computed from
    * a (id, shingle) DataFrame: `numPerm` permutations approximated by
    * seeded xxhash64 of the shingle, banded into `bands` buckets.
    * Exposed so the banding join can be re-derived (and oracle-checked)
    * from a dump of the buckets themselves.
    */
  def minHashBuckets(sh: DataFrame, numPerm: Int = 32,
      bands: Int = 8): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    // one aggregation computes all minhash components (map-side combined)
    val minhashes = (0 until numPerm).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"mh$i"))
    val sig = sh.groupBy("id").agg(minhashes.head, minhashes.tail: _*)
    // band hash = hash of the band's rows; explode to (id, band, bandHash)
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
  }

  /** MinHash signature per doc: `numPerm` permutations approximated by
    * seeded xxhash64 of the shingle; banded into `bands` LSH buckets.
    * Returns candidate pairs with their verified exact Jaccard.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerm: Int = 32, bands: Int = 8,
      threshold: Double = 0.3): DataFrame = {
    val sh = materialize(shingles(df, idCol, textCol, n))
    val buckets = minHashBuckets(sh, numPerm, bands)
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    verifyJaccard(cand, sh, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs against the
    * (uncapped) shingle table — public so multi-stage pipelines (the LSH
    * recall audit) can feed their own candidate set without recomputing
    * shingles. The intersection is two equi-joins keyed on
    * (id, shingle) — never the |A|×|B| blow-up of joining both shingle
    * lists per pair.
    */
  def verifyJaccard(cand: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = cand
      .join(sh.withColumnRenamed("id", "id1"), "id1")
      .join(sh.withColumnRenamed("id", "id2"), Seq("id2", "shingle"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz1") + col("sz2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  // ---- SimHash ----

  /** 64-bit SimHash per doc: sign of the per-bit sum of token hashes.
    *
    * Implemented as 64 plain integer aggregates — `ones_i =
    * sum((h >> i) & 1)` plus one `count(*)` — all fused into a single
    * codegen'd HashAggregate with map-side combine. The ±1 vote sum for bit
    * i is `2·ones_i − n`, so bit i is set iff `2·ones_i > n`: bit-identical
    * to the vote formulation with no per-row allocation. (A prior
    * `Summarizer.sum` vector-aggregate variant built a 64-element array +
    * ml.Vector object per TOKEN row — an ObjectHashAggregate outside
    * whole-stage codegen that benched 33× slower at sf0.1.)
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(split(TextAnalysis.normText(lower(col(textCol))), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val ones = (0 until 64).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L))).as(s"b$i"))
    val agg = tok.groupBy("id").agg(count(lit(1)).as("n"), ones: _*)
    val sim = (0 until 64).map(i =>
      when(col(s"b$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    agg.select(col("id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: `chunks`-way banding of the 64-bit signature
    * (any identical chunk → candidate), then exact hamming ≤ maxHamming via
    * bit_count.
    *
    * Recall guarantee (pigeonhole): a pair with hamming ≤ chunks−1 always
    * shares at least one chunk. With the default 4×16-bit chunks that means
    * full recall only up to hamming 3; `maxHamming` > chunks−1 yields
    * APPROXIMATE recall — pairs whose differing bits touch every chunk are
    * missed. Raising `chunks` toward maxHamming+1 restores the guarantee
    * but shrinks chunk width (64/chunks bits), multiplying random bucket
    * collisions by ~2^Δwidth per chunk — at 100 TB prefer a tight radius
    * (the Manku-et-al. web-dedup setting is hamming ≤ 3 on 64 bits) over
    * wide-radius guaranteed banding.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    require(chunks > 0 && 64 % chunks == 0, "chunks must divide 64")
    val width = 64 / chunks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sig = materialize(simHash(df, idCol, textCol))
    val chunked = sig.select(col("id"), col("simhash"),
      explode(array((0 until chunks).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("simhash"), i * width).bitwiseAND(mask).as("cv"))): _*))
        .as("cb"))
      .select(col("id"), col("simhash"), col("cb.chunk"), col("cb.cv"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.simhash").as("h1"), col("b.simhash").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  // ---- embedding cosine ----

  /** Cosine similarity of two double arrays (sequential fold — matches a
    * scalar loop exactly).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), _ + _))
    dot / (na * nb)
  }

  /** Embedding near-dup pairs via random-hyperplane LSH: `numBits`-bit
    * signature from deterministic (LCG-seeded) literal plane vectors,
    * `bands` chunk join, exact cosine ≥ threshold verification.
    *
    * Vectors are L2-normalized ONCE up front so verification is a single
    * dot-product fold, and identical vectors always share every band (a
    * true duplicate can never be missed). Candidate volume is governed by
    * bits-per-band: 8 bits/band keeps random-pair collisions ~0.4% per
    * band — no O(n²) stage.
    */
  /** (id, v, vn, sig) hyperplane-LSH signatures: the raw cast-to-double
    * vector, its L2-normalized form, and the packed `numBits`-bit signature
    * from deterministic (LCG-seeded) literal plane vectors. Exposed so the
    * normalization, banding, and cosine verification can ALL be re-derived
    * (and oracle-checked) from a dump — only the plane hashes themselves go
    * unchecked. `dim` avoids the driver-side probe job when the caller
    * knows it.
    */
  def embeddingSignatures(df: DataFrame, idCol: String, vecCol: String,
      numBits: Int = 64, dim: Int = -1): DataFrame = {
    require(numBits <= 64, "numBits must be ≤ 64")
    val v0 = df.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    val d = if (dim > 0) dim else v0.select(size(col("v"))).first().getInt(0)
    val norm = sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), _ + _))
    val v = v0.select(col("id"), col("v"), transform(col("v"), _ / norm).as("vn"))
    // deterministic pseudo-random unit-free planes (components in [-1, 1])
    def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
    val planes: Array[Array[Double]] = Array.tabulate(numBits, d) { (b, i) =>
      (math.floorMod(lcg(lcg(b * 1315423911L + i)), 2000001L) - 1000000L) / 1e6
    }
    // all bits in ONE nested higher-order expression (a loop in codegen,
    // not numBits unrolled aggregates — 64 separate folds compile slowly)
    val planesLit = array(planes.map(p => array(p.map(lit): _*)): _*)
    graft.functions.VectorFunctions.register(df.sparkSession)
    val bitValues = transform(planesLit, p => when(
      call_function("graft_dot", col("vn"), p) > 0, lit(1L)).otherwise(0L))
    // pack bits with a left fold (first plane = highest bit) — any
    // deterministic packing works, banding only needs equal bits to agree
    v.withColumn("sig", aggregate(bitValues, lit(0L), (acc, x) => acc * 2 + x))
  }

  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numBits: Int = 64, bands: Int = 8,
      dim: Int = -1): DataFrame = {
    require(numBits % bands == 0 && numBits <= 64, "bands must divide numBits ≤ 64")
    val bitsPerBand = numBits / bands
    val mask = if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1
    val sigC = materialize(embeddingSignatures(df, idCol, vecCol, numBits, dim))
    // dedup candidate IDs first — the distinct shuffles narrow (id, id)
    // rows, not 2×dim doubles; vectors re-attach after
    val chunks = sigC.select(col("id"),
      explode(array((0 until bands).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("sig"), i * bitsPerBand).bitwiseAND(mask).as("cv"))): _*))
        .as("cb"))
      .select(col("id"), col("cb.chunk"), col("cb.cv"))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val vn = sigC.select(col("id"), col("vn"))
    cand
      .join(vn.select(col("id").as("id1"), col("vn").as("v1")), "id1")
      .join(vn.select(col("id").as("id2"), col("vn").as("v2")), "id2")
      .withColumn("cos", call_function("graft_dot", col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select("id1", "id2", "cos")
  }

  // ---- connected components ----

  /** Connected components over a near-dup pair graph: every vertex's
    * `comp` is the minimum vertex id reachable from it, so one document
    * per duplicate CLUSTER survives — the production dedup semantics when
    * similarity chains (a~b, b~c with a!~c must still collapse to one
    * keeper, which per-pair loser-dropping gets wrong in both directions).
    *
    * Distributed min-label propagation with path halving: labels start at
    * min(self, neighbors); each round (a) relaxes every label to the min
    * of its neighbors' labels, then (b) pointer-jumps comp(v) ←
    * comp(comp(v)). The halving step turns O(diameter) convergence into
    * O(log diameter) — a 200-document template-drift chain converges in a
    * handful of rounds instead of 200 (same effect as large-star/
    * small-star, Kiveris et al., "Connected components in MapReduce and
    * beyond", 2014). Per round: two equi-joins + one min-aggregate, all
    * shuffling on vertex id; state is checkpoint-truncated every round so
    * lineage stays flat and prior-round blocks are freed immediately; the
    * driver-side convergence check is a 1-value count. Throws if the graph
    * hasn't converged within `maxIter` (loud, not silently wrong).
    *
    * Returns (id, comp) for vertices that appear in `pairs`; singletons
    * are absent (callers attach them with a left join + coalesce).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    // every intermediate is tracked by a direct RDD handle (see
    // materializeTracked) so freeing is exact even if unrelated queries
    // persist blocks on the same session concurrently; `live` mirrors the
    // currently-persisted handles so an exceptional exit anywhere in the
    // loop (job failure, OOM, lookup miss) frees them instead of leaking
    // blocks for the rest of the JVM — the same guarantee the happy path
    // gets from its explicit unpersists
    val live = scala.collection.mutable.Set.empty[org.apache.spark.rdd.RDD[_]]
    def tracked(df: DataFrame) = {
      val r = materializeTracked(df); live += r._2; r
    }
    def release(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
      rdd.unpersist(blocking = false); live -= rdd
    }
    try {
      connectedComponentsImpl(pairs, aCol, bCol, maxIter, tracked, release)
    } catch {
      case t: Throwable =>
        live.foreach(_.unpersist(blocking = false))
        throw t
    }
  }

  private def connectedComponentsImpl(pairs: DataFrame, aCol: String,
      bCol: String, maxIter: Int,
      tracked: DataFrame => (DataFrame, org.apache.spark.rdd.RDD[_]),
      release: org.apache.spark.rdd.RDD[_] => Unit): DataFrame = {
    // the symmetrization consumes the pair input twice (both union
    // branches); materialize the narrow projection first so an expensive
    // candidate-generation lineage (e.g. an LSH pair join) runs once
    val (half, halfRdd) = tracked(
      pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst")))
    val (edges, edgesRdd) = tracked(half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    release(halfRdd)
    var (labels, labelsRdd) = tracked(
      edges.groupBy("src").agg(min("dst").as("m"))
        .select(col("src").as("id"), least(col("src"), col("m")).as("comp")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // (a) neighbor relaxation: comp(v) ← min over v's neighbors
      val nbrMin = edges.select(col("src"), col("dst").as("id"))
        .join(labels, Seq("id"))
        .groupBy("src").agg(min("comp").as("ncomp"))
      // (b) path halving (pointer jumping): comp(v) ← comp(comp(v)),
      // looked up in the PREVIOUS round's materialized labels (standard
      // synchronized pointer jumping) — turns O(diameter) convergence
      // into O(log diameter), so a long near-dup chain (template drift)
      // converges within maxIter. One plan, one materialization per round.
      val (next, nextRdd) = tracked(labels
        .join(nbrMin.select(col("src").as("id"), col("ncomp")), Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("c1"))
        .join(labels.select(col("id").as("c1"), col("comp").as("cc")),
          Seq("c1"), "left")
        .select(col("id"),
          least(col("c1"), coalesce(col("cc"), col("c1"))).as("comp"),
          (least(col("c1"), coalesce(col("cc"), col("c1"))) < col("comp"))
            .as("chg")))
      changed = next.filter(col("chg")).count()
      release(labelsRdd)
      labels = next.select("id", "comp")
      labelsRdd = nextRdd
      it += 1
    }
    release(edgesRdd)
    if (changed > 0) {
      release(labelsRdd)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations")
    }
    labels
  }
}
