package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + corpus encoding (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the distributed trainer shape: ONE corpus scan builds the
  * distinct-word frequency table, then every merge round runs over that
  * bounded vocabulary (Σ|word| over DISTINCT words, not corpus size), so
  * the loop's cost is dictionary-bounded at 100 TB.
  *
  * Representation: a word is a bracket-delimited token string
  * (`<h><e><l><l><o>`). The brackets make two properties hold that a
  * plain space-separated rendering cannot:
  *  - a merge pair `<a><b>` can only match at token boundaries (never
  *    inside a longer token), and
  *  - string `replace` — non-overlapping, left-to-right in the JVM and
  *    in SQL engines alike — is exactly BPE's greedy merge order
  *    (`<a><a><a>` + merge (a,a) → `<aa><a>`).
  * Vocabulary is pre-tokenized to [a-z0-9]+ words so the markers cannot
  * collide with token text.
  */
object Bpe {

  final case class Merge(step: Int, a: String, b: String, cnt: Long)

  /** Distinct-word frequency table rendered as bracket-token strings:
    * columns (toks, c). One corpus scan + one hash aggregation.
    */
  def vocab0(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(lower(TextAnalysis.normText(col(textCol))).as("nt"))
      .filter(length(col("nt")) > 0)
      .select(explode(split(col("nt"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(concat(lit("<"),
        array_join(split(col("w"), ""), "><"), lit(">")).as("toks"),
        col("c"))

  /** K merge rounds: each counts adjacent token pairs weighted by word
    * frequency, takes the argmax (count desc, pair asc tiebreak — a
    * bounded driver aggregate of exactly ONE row), and applies it to the
    * whole vocabulary with `replace`. Returns the merges in training
    * order plus the encoded vocabulary (toks, c) after all K rounds;
    * the vocab is localCheckpointed per round to truncate lineage.
    */
  def train(spark: SparkSession, v0: DataFrame,
      k: Int): (Seq[Merge], DataFrame) = {
    var vocab = v0.localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (step <- 1 to k) {
      val best = vocab
        .select(col("c"),
          split(regexp_replace(col("toks"), "^<|>$", ""), "><").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("c"), col("ts"),
          explode(sequence(lit(1), size(col("ts")) - 1)).as("i"))
        .select(element_at(col("ts"), col("i")).as("a"),
          element_at(col("ts"), col("i") + 1).as("b"), col("c"))
        .groupBy("a", "b").agg(sum("c").as("cnt"))
        .select(concat(lit("<"), col("a"), lit("><"), col("b"),
          lit(">")).as("pair"), col("a"), col("b"), col("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect().headOption // bounded: ≤ one row per round
        .getOrElse(throw new IllegalStateException(
          s"BPE vocabulary exhausted after ${step - 1} of $k merges — " +
            "no adjacent token pair left to merge"))
      val (pair, a, b, cnt) = (best.getString(0), best.getString(1),
        best.getString(2), best.getLong(3))
      merges += Merge(step, a, b, cnt)
      vocab = vocab.select(
        replace(col("toks"), lit(pair), lit(s"<$a$b>")).as("toks"),
        col("c")).localCheckpoint()
    }
    (merges.result(), vocab)
  }

  /** Explode an encoded vocabulary to one row per token occurrence,
    * weighted by word frequency: columns (tok, c) — the corpus-level
    * token stream a tokenizer produces, without rescanning the corpus.
    */
  def explodeTokens(vocab: DataFrame): DataFrame =
    vocab.select(col("c"),
      explode(split(regexp_replace(col("toks"), "^<|>$", ""), "><"))
        .as("tok"))
}
