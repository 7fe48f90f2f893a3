package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction / scrubbing for training-data pipelines.
  *
  * A training corpus sweep replaces personally-identifying spans with typed
  * placeholder tokens before the text reaches dedup/tokenization. The whole
  * pass is a chain of native `regexp_replace` calls — codegen'd, no UDF, no
  * shuffle: a pure map stage that scales linearly with the corpus and can be
  * fused into the same scan as tokenization/quality scoring.
  *
  * Pattern dialect note: the rules below stick to the regex subset with
  * identical semantics in Java (`java.util.regex`, what Spark compiles) and
  * RE2 (DuckDB) — character classes, bounded repetition, and `\b` word
  * boundaries — so the operator is oracle-checkable.
  */
object Redact {

  /** One redaction rule: spans matching `pattern` become `placeholder`. */
  final case class Rule(name: String, pattern: String, placeholder: String)

  val email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  /** Phone shapes like 1-555-000-1234 / 01-555-000-1234. */
  val phone: Rule = Rule("phone",
    "\\b[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b", "<PHONE>")

  val ipv4: Rule = Rule("ipv4",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")

  /** 13–16 digit runs (card-number-ish). Applied after phone so hyphenated
    * phones are already gone. */
  val longDigits: Rule = Rule("long_digits", "\\b[0-9]{13,16}\\b", "<NUM>")

  val defaultRules: Seq[Rule] = Seq(email, phone, ipv4, longDigits)

  /** Redact one text column. Rule order matters (earlier rules consume their
    * spans before later, broader ones run). */
  def redact(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text)((acc, r) => regexp_replace(acc, r.pattern, r.placeholder))

  /** Count of spans each rule would redact in `text` — audit metric emitted
    * alongside the scrubbed text so a pipeline can alert on PII density. */
  def hitCount(text: Column, rule: Rule): Column =
    size(regexp_extract_all(text, lit(rule.pattern), lit(0)))

  /** Scrub `textCols` in place; append one `<rule>_hits` audit column per
    * rule (counted on the FIRST text column, pre-redaction). */
  def scrub(df: DataFrame, textCols: Seq[String],
            rules: Seq[Rule] = defaultRules): DataFrame = {
    val audited = rules.foldLeft(df)((acc, r) =>
      acc.withColumn(s"${r.name}_hits", hitCount(col(textCols.head), r)))
    textCols.foldLeft(audited)((acc, c) => acc.withColumn(c, redact(col(c), rules)))
  }
}
