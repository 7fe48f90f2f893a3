package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 catalog (q266-): VERDICT r13 asks.
  *
  *  - q266/q267: stage-localizing FORENSIC PROBES for the q248
  *    classifier pipeline (VERDICT r13 ask #2). q248 has been the one
  *    driver-gate red for three rounds while the identical tree is
  *    green against local DuckDB; the remaining suspects are the
  *    driver's oracle-engine build and its result bridging. These two
  *    entries decompose the pipeline so a future red names its stage:
  *      q266 exercises ONLY tokenize → filter → slice → distinct
  *           (per-doc token COUNT, pure INT);
  *      q267 adds ONLY the md5-prefix bucket hash (per-doc SUM of
  *           bucket ids, pure BIGINT).
  *    If q248 reds again: q266 red ⇒ tokenization/regex bridging;
  *    q266 green + q267 red ⇒ the md5/hex-cast bucket hash;
  *    both green + q248 red ⇒ the weight-sum/row-shape bridging.
  *    Both are map-only (a groupBy only in the oracle's replay) and
  *    scale-free: one pass over `text`, no shuffle beyond the sort.
  */
object QueriesRound14 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q266_token_count_probe" -> ((s, dir) => {
      import graft.operators.QualityClassifier
      graft.Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(QualityClassifier.tokenColumn(col("text"))).as("n_toks"))
        .orderBy(col("doc_id"))
    }),

    "q267_bucket_sum_probe" -> ((s, dir) => {
      import graft.operators.QualityClassifier
      val toks = QualityClassifier.tokenColumn(col("text"))
      val z = aggregate(toks, lit(0L),
        (acc, t) => acc + QualityClassifier.bucketColumn(t).cast("long"))
      graft.Tables.load(s, dir, "documents")
        .select(col("doc_id"), z.as("bucket_sum"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(

    // the q248 oracle's own tokenization sub-pipeline, verbatim
    "q266_token_count_probe" ->
      """SELECT doc_id,
        |       CAST(COALESCE(len(list_distinct(list_filter(
        |         string_split_regex(lower(text), '[^a-z]+'),
        |         t -> t <> '')[1:64])), 0) AS INT) AS n_toks
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the q248 oracle's bucket-hash sub-pipeline over the same tokens,
    // summing the BUCKET IDS themselves (no weights): a multiset
    // fingerprint of the md5-prefix hash in pure BIGINT
    "q267_bucket_sum_probe" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_distinct(list_filter(
        |           string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')[1:64]) AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
        |s AS (
        |  SELECT doc_id,
        |         CAST(SUM(CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)
        |                  % 1024) AS BIGINT) AS bucket_sum
        |  FROM tok GROUP BY doc_id)
        |SELECT d.doc_id, CAST(COALESCE(s.bucket_sum, 0) AS BIGINT)
        |         AS bucket_sum
        |FROM d LEFT JOIN s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin
  )
}
