package graft.queries

import org.apache.spark.sql.functions._

import QueryDef._
import graft.text.TextAnalysis

/** Text-analysis twins over the `documents` table: token counting, quality
  * scoring, language ID, fingerprinting (builder brief: training-data
  * pipeline operators as first-class catalog entries).
  *
  * DuckDB dialect notes: regexp_replace needs the 'g' flag (Spark replaces
  * globally by default); both engines use leftmost-first alternation, and
  * both count non-overlapping regexp_extract_all matches.
  */
object TextCatalog {

  // collapse-then-trim, mirroring TextAnalysis.normText (both engines'
  // trim strips only ' ', so the order is load-bearing for \t/\n edges)
  private val sqlNorm = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"

  /** DuckDB twin of TextAnalysis.wsTokenCount: string_split('') yields ['']
    * (len 1), while the Spark side pins empty text to 0 — mirror the guard
    * so the engines agree on empty/whitespace-only documents too.
    */
  private val sqlWsTokens =
    s"CASE WHEN length($sqlNorm) = 0 THEN 0 ELSE len(string_split($sqlNorm, ' ')) END"

  val tQuality = QueryDef(
    "q_t_quality",
    (s, dir) =>
      TextAnalysis.withQuality(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars_calc"), col("n_tokens"),
          r6(col("mean_token_len")).as("mean_token_len"),
          r6(col("punct_ratio")).as("punct_ratio"),
          r6(col("stopword_ratio")).as("stopword_ratio"))
        .orderBy("doc_id"),
    Some(s"""
      WITH b AS (
        SELECT doc_id, $sqlNorm AS nt,
               $sqlWsTokens AS n_tokens
        FROM documents)
      SELECT doc_id, CAST(length(nt) AS BIGINT) AS n_chars_calc,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             ${sqlR6("length(replace(nt, ' ', '')) / CAST(n_tokens AS DOUBLE)")} AS mean_token_len,
             ${sqlR6("length(regexp_replace(nt, '[a-zA-Z0-9\\s]', '', 'g')) / CAST(length(nt) AS DOUBLE)")} AS punct_ratio,
             ${sqlR6(TextAnalysis.Stopwords.map(w =>
      s"len(regexp_extract_all(' ' || lower(nt) || ' ', ' $w ', 0))")
      .mkString("(", " + ", ") / CAST(n_tokens AS DOUBLE)"))} AS stopword_ratio
      FROM b ORDER BY doc_id""")
  )

  val tTokens = QueryDef(
    "q_t_tokens",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
          TextAnalysis.subwordCount(col("text")).as("subword_tokens"))
        .orderBy("doc_id"),
    Some(s"""
      SELECT doc_id,
             CAST($sqlWsTokens AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS BIGINT) AS subword_tokens
      FROM documents ORDER BY doc_id""")
  )

  val tFingerprint = QueryDef(
    "q_t_fingerprint",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
    Some(s"SELECT doc_id, md5($sqlNorm) AS fp FROM documents ORDER BY doc_id")
  )

  val tLangId = QueryDef(
    "q_t_langid",
    (s, dir) =>
      TextAnalysis.withLangId(t(s, dir, "documents"))
        .select("doc_id", "lang", "lang_pred")
        .orderBy("doc_id"),
    Some {
      val langs = TextAnalysis.LangMarkers.keys.toSeq.sorted
      def score(l: String) = TextAnalysis.LangMarkers(l).map(w =>
        s"len(regexp_extract_all(' ' || lower($sqlNorm) || ' ', ' $w ', 0))")
        .mkString(" + ")
      val scoreCols = langs.map(l => s"(${score(l)}) AS s_$l").mkString(", ")
      val caseChain = langs.map(l =>
        s"WHEN ${langs.map(o => s"s_$l >= s_$o").mkString(" AND ")} THEN '$l'")
        .mkString(" ")
      s"""
      WITH s AS (SELECT doc_id, lang, $scoreCols FROM documents)
      SELECT doc_id, lang, CASE $caseChain END AS lang_pred
      FROM s ORDER BY doc_id"""
    }
  )

  /** Generator/UDTF surface (SURVEY §2.11 notes the reference has none —
    * capability headroom): positional token explosion, one row per token.
    */
  val tExplode = QueryDef(
    "q_t_posexplode",
    (s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(TextAnalysis.normText(col("text")), " "))
            .as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos"),
    Some(s"""
      WITH t AS (
        SELECT doc_id, string_split($sqlNorm, ' ') AS tk
        FROM documents WHERE doc_id < 50)
      SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
             unnest(tk) AS token
      FROM t ORDER BY doc_id, pos""")
  )

  val all: Seq[QueryDef] =
    Seq(tQuality, tTokens, tFingerprint, tLangId, tExplode)
}
