package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. Quality metrics are native
  * column expressions (codegen'd, no UDF); langid/fingerprint use the
  * deterministic kernels in [[TextFunctions]].
  */
object TextAnalysis {

  /** Whitespace tokens (empty-safe). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-piece regex segments
    * (letters / digits / punctuation runs), the usual pre-tokenizer shape. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?U)(?<=\\W)(?=\\w)|(?<=\\w)(?=\\W)|\\s+"), t => length(t) > 0))

  /** Punctuation character count (native regexp_count). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "(?U)\\p{Punct}", ""))

  /** Heuristic document quality in [0,1]: combines length band, mean word
    * length plausibility, punctuation ratio, and alpha ratio. Mirrors the
    * usual Gopher/C4-style filters, all as one codegen'd expression. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val meanWordLen = when(nTok > 0, (nChar - nTok + 1) / nTok).otherwise(lit(0.0))
    val punctRatio = when(nChar > 0, punctCount(text) / nChar).otherwise(lit(1.0))
    val alphaRatio = when(nChar > 0,
      length(regexp_replace(text, "(?U)[^\\p{L}]", "")).cast("double") / nChar).otherwise(lit(0.0))
    val lenScore = least(nTok / 50.0, lit(1.0))
    val wordLenScore = when(meanWordLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    val punctScore = when(punctRatio < 0.2, 1.0).otherwise(0.4)
    round(lenScore * 0.4 + wordLenScore * 0.2 + punctScore * 0.2 + alphaRatio * 0.2, 6)
  }

  def languageOf(text: Column): Column = TextFunctions.languageOf(text)

  def fingerprint(text: Column): Column = TextFunctions.fingerprint(text)

  /** Full per-document report. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      length(t).as("n_chars"),
      qualityScore(t).as("quality"),
      languageOf(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }
}
