package graft.queries

import graft.Tables
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite / end-to-end queries: the full training-data curation pipeline
  * as one plan, plus remaining frame/predicate parity items.
  */
object QueriesComposite {
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    /** C4/Gopher-style curation in one declarative plan: language filter →
      * quality threshold → exact dedup → near-dup removal → stats. Each
      * stage is one of the verified operators; the composition stays a
      * single Catalyst plan (no materialization between stages). */
    "q93_curation_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val scored = docs
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .filter(col("quality") >= 0.5 && col("n_tokens") >= 10)
      val exactDeduped = Dedup.exact(scored, "doc_id", Seq("text"))
      val cleaned = Dedup.minhashDedup(exactDeduped, "doc_id", "text", threshold = 0.9)
      cleaned.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(avg(col("quality")), 4).as("avg_quality"))
        .orderBy(col("lang"))
    }),

    "q94_range_interval_frame" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT event_id, user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
        FROM events ORDER BY event_id""")
    }),

    "q95_like_escape" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, masked,
               masked LIKE '%!_00%' ESCAPE '!' AS has_u00,
               masked LIKE 'Customer!_%' ESCAPE '!' AS is_customer
        FROM (SELECT c_custkey, replace(c_name, '#', '_') AS masked FROM customer)
        ORDER BY c_custkey""")
    })
  )

  val oracles: Map[String, String] = Map(
    // q93: minhash stage is not SQL-expressible → rows-only
    "q94_range_interval_frame" ->
      """SELECT event_id, user_id,
                count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
         FROM events ORDER BY event_id""",
    "q95_like_escape" ->
      """SELECT c_custkey, masked,
                masked LIKE '%!_00%' ESCAPE '!' AS has_u00,
                masked LIKE 'Customer!_%' ESCAPE '!' AS is_customer
         FROM (SELECT c_custkey, replace(c_name, '#', '_') AS masked FROM customer)
         ORDER BY c_custkey"""
  )
}
