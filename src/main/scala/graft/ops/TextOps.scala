package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: quality
  * scoring, language ID, token counting, fingerprinting.
  *
  * All operators are pure column expressions (codegen'd, no UDFs), so
  * they fuse into one WholeStageCodegen span over the parquet scan —
  * at 100 TB each document is touched exactly once, with only the
  * referenced columns read.
  */
object TextOps {

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

  private def norm(text: Column): Column = lower(trim(text))

  /** Whitespace token array. */
  def tokens(text: Column): Column = split(norm(text), "\\s+")

  /** Quality features + composite score (length, punctuation density,
    * stopword ratio, digit ratio, mean token length).
    */
  def qualityFeatures(docs: DataFrame, text: String): DataFrame = {
    val t = col(text)
    val toks = tokens(t)
    val nChars = length(t).cast("double")
    val nTokens = size(toks).cast("double")
    val nPunct = (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double")
    val nDigits = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double")
    val nStop = size(filter(toks, tk => tk.isin(stopwords: _*))).cast("double")
    // No round(): raw IEEE divisions/additions are bit-identical across
    // engines for identical inputs, while round() implementations differ.
    docs
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("punct_ratio", nPunct / nChars)
      .withColumn("digit_ratio", nDigits / nChars)
      .withColumn("stopword_ratio", nStop / nTokens)
      .withColumn("mean_token_len", (nChars - nTokens + lit(1.0)) / nTokens)
      .withColumn(
        "quality_score",
        lit(1.0)
          - least(lit(1.0), col("punct_ratio") * 4)
          - least(lit(1.0), col("digit_ratio") * 4) * 0.5
          + least(lit(0.5), col("stopword_ratio")))
  }

  /** Marker-word language heuristic: deterministic, order-sensitive
    * CASE over language-specific function words.
    */
  def langGuess(text: Column): Column = {
    val padded = concat(lit(" "), norm(text), lit(" "))
    when(padded.like("% el %") || padded.like("% la %"), "es")
      .when(padded.like("% le %") || padded.like("% un %"), "fr")
      .when(padded.like("% der %") || padded.like("% und %"), "de")
      .otherwise("en")
  }

  /** Confusion counts of the heuristic against a labeled column. */
  def langConfusion(docs: DataFrame, text: String, lang: String): DataFrame =
    docs
      .groupBy(col(lang).as("lang_true"), langGuess(col(text)).as("lang_guess"))
      .agg(count(lit(1)).as("n"))

  /** Whitespace + BPE-ish token counts (letters runs, digit runs, single
    * punctuation marks — the shape a byte-pair pretokenizer produces).
    */
  def tokenCounts(docs: DataFrame, text: String): DataFrame = {
    val t = col(text)
    docs
      .withColumn("ws_tokens", size(tokens(t)).cast("long"))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
  }

  /** Document fingerprints: full-content md5 plus head/tail md5s (cheap
    * containment probes), over normalized text.
    */
  def fingerprints(docs: DataFrame, text: String): DataFrame = {
    val n = norm(col(text))
    docs
      .withColumn("fp", md5(n))
      .withColumn("fp_head", md5(substring(n, 1, 32)))
      .withColumn("fp_tail", md5(substring(reverse(n), 1, 32)))
  }
}
