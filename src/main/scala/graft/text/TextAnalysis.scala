package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (builder brief):
  * token counting, quality scoring, language ID, document fingerprinting.
  * All are built-in Column expressions — codegen'd, shuffle-free, linear
  * scans that hold at 100 TB.
  */
object TextAnalysis {

  /** Whitespace-normalized text: collapse runs of whitespace to single
    * spaces, THEN trim. Order matters: both Spark's and DuckDB's `trim`
    * strip only ' ' (0x20), so trim-first would leave a leading/trailing
    * tab or newline behind as a stray space and count phantom tokens on
    * whitespace-only input.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column =
    when(length(normText(c)) === 0, 0L)
      .otherwise(size(split(normText(c), " ")).cast("long"))

  /** BPE-ish subword count: runs of letters, runs of digits, single other
    * non-space chars — a cheap proxy for tokenizer load.
    */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Quality metrics (length, punctuation ratio, mean token length,
    * stopword ratio) — the reference-style length/punct/stopword heuristics.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = normText(col(textCol))
    val nTokens = wsTokenCount(col(textCol))
    val nStop = Stopwords.map(w =>
      size(regexp_extract_all(concat(lit(" "), lower(t), lit(" ")),
        lit(s" ${w} "), lit(0))).cast("long"))
      .reduce(_ + _)
    df.withColumn("n_chars_calc", length(t).cast("long"))
      .withColumn("n_tokens", nTokens)
      .withColumn("mean_token_len",
        (length(regexp_replace(t, " ", "")).cast("double") / nTokens))
      .withColumn("punct_ratio",
        length(regexp_replace(t, "[a-zA-Z0-9\\s]", "")).cast("double")
          / length(t))
      .withColumn("stopword_ratio", nStop.cast("double") / nTokens)
  }

  /** Language ID by marker-token voting — a tiny n-gram/stopword heuristic
    * (real pipelines plug a model here; the operator shape — argmax over
    * per-language scores in one projection — is what matters at scale).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "los", "es", "y"),
    "fr" -> Seq("le", "les", "est", "et"),
    "zh" -> Seq("de", "shi", "le", "he"))

  def langScore(c: Column, markers: Seq[String]): Column =
    markers.map(w =>
      size(regexp_extract_all(concat(lit(" "), lower(normText(c)), lit(" ")),
        lit(s" $w "), lit(0))).cast("long")).reduce(_ + _)

  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val langs = LangMarkers.keys.toSeq.sorted
    val scored = langs.foldLeft(df)((d, l) =>
      d.withColumn(s"score_$l", langScore(col(textCol), LangMarkers(l))))
    // argmax with deterministic tie-break on language code
    val best = langs.map(l => struct(col(s"score_$l").as("s"),
      lit(l).as("l"))).reduce((a, b) =>
      when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.withColumn("lang_pred", best.getField("l"))
      .drop(langs.map(l => s"score_$l"): _*)
  }

  /** Content fingerprint: md5 of the normalized text (exact-dup key), plus
    * a 64-bit rolling-hash-style prefix for cheap bucketing.
    */
  def fingerprint(c: Column): Column = md5(normText(c))

  def fingerprint64(c: Column): Column = xxhash64(normText(c))

  /** Word n-grams per document — NON-distinct, position dropped: the
    * repetition-signal feed (cf. Dedup.shingles, which dedups for LSH).
    * Empty/whitespace-only docs yield no rows. The explode is the same
    * deliberate generator barrier as in shingles: post-explode,
    * element_at reads the materialized token array instead of re-running
    * the regex split per gram.
    */
  private def grams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val idxs = when(size(col("tk")) >= n,
      sequence(lit(0), size(col("tk")) - n))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("id"), normText(col(textCol)).as("nt"))
      .filter(length(col("nt")) > 0)
      .select(col("id"), split(col("nt"), " ").as("tk"))
      .select(col("id"), col("tk"), explode(idxs).as("i"))
      .select(col("id"), lit(n).as("n"),
        concat_ws(" ", (0 until n).map(k =>
          element_at(col("tk"), col("i") + k + 1)): _*).as("gram"))
  }

  /** Repetition signals (the Gopher-rule family: Rae et al. 2021,
    * "Scaling Language Models", repetition filters §A1.1): per document,
    *  - distinct_token_ratio = |distinct tokens| / |tokens|  (low → loops)
    *  - top_bigram_ratio     = occurrences of the most frequent bigram /
    *    |bigrams|                                            (high → loops)
    *  - dup_trigram_ratio    = fraction of trigram INSTANCES whose trigram
    *    occurs ≥ 2 times in the doc                          (high → loops)
    * NULL where the doc is too short to have the gram (empty docs / <2 /
    * <3 tokens).
    *
    * Scale: one explode to (id, n, gram) instances, one count shuffle on
    * (id, n, gram), one per-doc aggregate — linear, no per-row quadratic
    * array scans (an `array_distinct`/`filter` formulation would be
    * shuffle-free but O(distinct×len) per row, which dies on long docs).
    */
  def repetitionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val g = (1 to 3).map(grams(df, idCol, textCol, _))
      .reduce(_ unionByName _)
    val cnt = g.groupBy("id", "n", "gram").agg(count(lit(1)).as("c"))
    val per = cnt.groupBy("id", "n").agg(
      sum("c").as("total"), count(lit(1)).as("dist"), max("c").as("topc"),
      sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup"))
    val sig = per.groupBy("id").agg(
      max(when(col("n") === 1,
        col("dist").cast("double") / col("total"))).as("distinct_token_ratio"),
      max(when(col("n") === 2,
        col("topc").cast("double") / col("total"))).as("top_bigram_ratio"),
      max(when(col("n") === 3,
        col("dup").cast("double") / col("total"))).as("dup_trigram_ratio"))
    df.select(col(idCol).as("id"))
      .join(sig, Seq("id"), "left")
      .withColumnRenamed("id", idCol)
  }

  // ---- PII detection / scrubbing ----

  /** RE2-safe patterns (no backrefs/lookaround) so Spark's Java regex and
    * other engines' RE2 match identically — required for cross-engine
    * reproducible scrubbing. Whitespace is spelled as the explicit class
    * `[ \t\n\f\r]` rather than `\s`: Java's `\s` includes `\x0B` (vertical
    * tab) while RE2's does not, so `[^\s]+` would tokenize differently
    * between the engines on text containing `\x0B`.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ \\t\\n\\f\\r]+"
  val PhoneRe = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  /** Per-document PII hit counts (emails, URLs, phone-shaped digit runs) —
    * one codegen'd shuffle-free scan. Counts follow the same URL → email →
    * phone cascade as [[scrubPii]] (each pattern counts on text with the
    * earlier patterns already redacted), so a URL's digit path never
    * double-counts as a phone and every count equals the number of
    * redactions the scrub would make.
    */
  def withPiiSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val noUrl = regexp_replace(col(textCol), UrlRe, "[URL]")
    val noEmail = regexp_replace(noUrl, EmailRe, "[EMAIL]")
    // size(null) is -1 in Spark; null text must yield null counts
    def cnt(c: Column, re: String): Column =
      when(c.isNull, lit(null).cast("long"))
        .otherwise(size(regexp_extract_all(c, lit(re), lit(0))).cast("long"))
    df.withColumn("n_emails", cnt(noUrl, EmailRe))
      .withColumn("n_urls", cnt(col(textCol), UrlRe))
      .withColumn("n_phones", cnt(noEmail, PhoneRe))
  }

  /** Redact PII in place. Order is load-bearing and part of the contract:
    * URLs first (so a URL's digit path can't half-match as a phone), then
    * emails, then phones — any engine replaying the same order produces
    * byte-identical scrubbed text.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "[URL]"),
        EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  // ---- deterministic sampling / splits ----

  /** Content-stable [0, buckets) bucket of an id: the first 60 bits of
    * md5(id as string), mod buckets. Engine-portable (any system with md5
    * reproduces it bit-for-bit) and independent of partitioning, run
    * order, and cluster size — the property train/val/test membership
    * needs to survive re-runs and engine migrations, which `rand(seed)`
    * (partitioning-sensitive) and xxhash64 (Spark-specific) both lack.
    * Codegen'd built-ins only; shuffle-free.
    */
  def hashBucket(id: Column, buckets: Int = 1000): Column =
    graft.functions.Md5Prefix60.md5Prefix60(id) % buckets

  /** Content-addressed uniform in (0, 1] from the md5 60-bit prefix — the
    * deterministic, engine-portable stand-in for `rand()` (which depends
    * on partitioning) used by weighted sampling (q_t_wsample) and the
    * capstone's Gumbel resampling keys.
    */
  def contentUniform(id: Column): Column =
    (graft.functions.Md5Prefix60.md5Prefix60(id)
      .cast("double") + 1.0) / math.pow(2, 60)

  /** Deterministic train/val/test assignment by hash bucket:
    * [0,trainPct) → train, [trainPct,trainPct+valPct) → val, rest → test.
    */
  def withSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("bucket", hashBucket(col(idCol), 100))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))

  /** Deterministic epoch-shuffle key: content-stable pseudo-random order
    * per (seed, id) — same engine-portability rationale as [[hashBucket]]
    * (rand(seed) depends on partitioning; xxhash64 is Spark-specific).
    */
  def shuffleKey(id: Column, seed: Int): Column =
    md5(concat(lit(s"e$seed:"), id.cast("string")))

  /** Epoch shuffle: a deterministic global permutation of the corpus —
    * `pos` is the row's 1-based position in md5-order for this seed. The
    * position comes from plans.SequenceOps.withSequenceCols with an EMPTY
    * group set (range-partitioned global row_number — a plain
    * `Window.orderBy` would funnel the whole corpus through one task).
    * Each epoch re-seeds into an independent permutation; a data loader
    * reads `orderBy(pos)` ranges for its shard.
    */
  def epochShuffle(df: DataFrame, idCol: String, seed: Int): DataFrame =
    graft.plans.SequenceOps.withSequenceCols(
        df.withColumn("__sk", shuffleKey(col(idCol), seed)),
        groupCols = Seq.empty,
        orderCols = Seq("__sk", idCol),
        rnCol = Some("pos"))
      .drop("__sk")

  /** Stratified deterministic sample (corpus mixing / rebalancing): keep a
    * row iff its hash bucket (per-mille) falls under its stratum's rate.
    * Rates are data, not a shuffle key — the filter is a codegen'd scan,
    * so re-weighting a 100 TB corpus is one pass with zero shuffles.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      ratesPerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 1000) < rate)
  }

  /** Eager one-shot materialization for an intermediate consumed by
    * several plan subtrees — Spark plans each consumer independently (no
    * cross-subtree CSE; ReuseExchange only collapses identical physical
    * exchanges, which distinct downstream aggregates are not), so without
    * this the corpus scan + token explode would run once PER consumer.
    * Same idiom and lifecycle contract as dedup.Dedup.materialize: blocks
    * stay registered until the caller unpersists (Bench/Verify free
    * between queries via getPersistentRDDs).
    */
  private def materialize(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  // ---- collocations ----

  /** Corpus-wide top-k bigram collocations by pointwise mutual
    * information, PMI = ln( p(w1,w2) / (p(w1)·p(w2)) ), over adjacent
    * token pairs within documents; bigrams below `minCount` are noise and
    * dropped. Ties (identical rationals) break by (w1, w2) ascending.
    *
    * Scale: token explode → per-doc lead() window (partitioned by doc id —
    * no funnel) → bigram/unigram count shuffles → two vocab-sized joins +
    * two broadcast 1-row totals. No quadratic stage.
    */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one corpus scan + explode; uni and the bigram window both read blocks
    val tok = materialize(df
      .select(col(idCol).as("id"), lower(normText(col(textCol))).as("nt"))
      .filter(length(col("nt")) > 0)
      .select(col("id"), posexplode(split(col("nt"), " ")).as(Seq("pos", "w"))))
    val uni = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val nu = uni.agg(sum("c").as("nu"))
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val pairs = tok.withColumn("w2", lead("w", 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("w").as("w1"), col("w2"))
    // consumed by both the total and the min-count filter
    val bigAll = materialize(
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val nb = bigAll.agg(sum("c12").as("nb"))
    bigAll.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .withColumn("pmi",
        log((col("c12").cast("double") / col("nb")) /
          ((col("c1").cast("double") / col("nu")) *
            (col("c2").cast("double") / col("nu")))))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
      .select("w1", "w2", "c12", "pmi")
  }

  // ---- tf-idf ----

  /** Top-k characteristic terms per document by tf-idf over the corpus
    * itself: tf = termCount/docLength, idf = ln(nDocs/docFreq), ties (and
    * only true ties — identical rationals) broken by term ascending.
    *
    * Scale: token explode → (doc,term) count shuffle → doc-total and
    * term-docfreq aggregates joined back (docfreq is vocab-sized:
    * broadcast-able for modest vocab, plain shuffle join at web scale) →
    * per-doc top-k window (partitioned by doc id — no funnel).
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol).as("id"), lower(normText(col(textCol))).as("nt"))
      .filter(length(col("nt")) > 0)
      .select(col("id"), explode(split(col("nt"), " ")).as("w"))
    // (doc,term) counts feed four consumers (join base, doc totals, doc
    // freqs, corpus size) — materialize so the corpus scan + explode +
    // count shuffle run once, not once per consumer
    val tf = materialize(toks.groupBy("id", "w").agg(count(lit(1)).as("c")))
    val tot = tf.groupBy("id").agg(sum("c").as("total"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("dfc"))
    val n = tf.agg(count_distinct(col("id")).as("n"))
    val scored = tf.join(tot, "id").join(dfreq, "w")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        (col("c").cast("double") / col("total")) *
          log(col("n").cast("double") / col("dfc")))
    val byDoc = Window.partitionBy("id")
      .orderBy(col("tfidf").desc, col("w").asc)
    scored.withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rnk").cast("long").as("rnk"),
        col("w").as("term"), col("tfidf"))
  }

  /** Corpus-conditioned unigram-LM quality score (the CCNet/perplexity
    * filtering shape — Wenzek et al. 2020 — with the LM reduced to the
    * corpus's own add-one-smoothed unigram model, the strongest model
    * expressible without external artifacts): per document, the mean
    * natural-log probability of its tokens under
    * p(w) = (count(w) + 1) / (N + V). Low score → unusual token mix.
    *
    * Scale: token explode → vocab count shuffle → token⋈vocab equi-join
    * (vocab-sized right side: broadcast-able for small corpora, plain
    * shuffle join at web scale) → per-doc aggregate. The mean uses exact
    * decimal summation so it is order-independent (oracle-comparable).
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("id"), lower(normText(col(textCol))).as("nt"))
      .filter(length(col("nt")) > 0)
      .select(col("id"), explode(split(col("nt"), " ")).as("w"))
    val counts = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val stats = counts.agg(sum("c").as("N"), count(lit(1)).as("V"))
    val per = toks.join(counts, "w")
      .crossJoin(broadcast(stats))
      .withColumn("lp",
        log((col("c") + 1).cast("double") / (col("N") + col("V")).cast("double")))
      .groupBy("id")
      .agg((sum(col("lp").cast("decimal(38,18)")).cast("double") / count(lit(1)))
        .as("lm_logprob"),
        count(lit(1)).as("n_tokens_scored"))
    df.select(col(idCol).as("id"))
      .join(per, Seq("id"), "left")
      .withColumnRenamed("id", idCol)
  }
}
