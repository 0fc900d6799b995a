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
}
