package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 catalog (q245-): closing VERDICT r10's asks.
  *
  *  - q245: bucketed Bloom historical dedup
  *    (`Dedup.bloomHistoryFlagBucketed`) — the bounded-driver-memory form
  *    of q243's operator, on the IDENTICAL fixture so the exact verdicts
  *    hash-match q243's replay. Both physical routes run in one entry:
  *    the broadcast bucket→filter map (default budget) feeds the per-row
  *    verdicts, and a zero-byte budget forces the semi-join degrade whose
  *    flags must equal exact membership bit-for-bit (`degrade_exact`).
  *    Route markers are asserted inside the same fact, so a silent
  *    route flip hash-fails.
  */
object QueriesRound11 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q245_bloom_bucketed_dedup" -> ((s, dir) => {
      import graft.operators.Dedup
      val base = graft.Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val newBatch = base.select(
        (col("doc_id") + 10000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" fresh tail"))).as("text"))
      val bucketed = Dedup.bloomHistoryFlagBucketed(newBatch, base, fpp = 0.01)
      val degraded = Dedup.bloomHistoryFlagBucketed(newBatch, base,
        fpp = 0.01, maxDriverBytes = 0L)
      val normKey = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val hist = base.select(normKey.as("k")).distinct()
      val verdicts = bucketed.df.withColumn("k", normKey)
        .join(hist.withColumn("hit", lit(1)), Seq("k"), "left")
        .select(col("doc_id"), col("maybe_dup"),
          col("hit").isNotNull.as("exact_dup"))
      val facts = verdicts.agg(
        sum(when(col("exact_dup") && !col("maybe_dup"), 1L).otherwise(0L))
          .as("missed"),
        sum(when(!col("exact_dup") && col("maybe_dup"), 1L).otherwise(0L))
          .as("fp"),
        count(lit(1)).as("n"))
        .select((col("missed") === 0L).as("no_false_neg"),
          (col("fp") <= col("n") * 0.05).as("fp_ok"))
      val dver = degraded.df.withColumn("k", normKey)
        .join(hist.withColumn("hit", lit(1)), Seq("k"), "left")
        .agg(sum(when(col("maybe_dup") =!= col("hit").isNotNull, 1L)
          .otherwise(0L)).as("mismatch"))
        .select((col("mismatch") === 0L &&
          lit(degraded.route == "semi-join") &&
          lit(bucketed.route == "bloom-bucketed")).as("degrade_exact"))
      verdicts.select(col("doc_id"), col("exact_dup"))
        .crossJoin(facts).crossJoin(dver)
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // identical exact-verdict replay to q243; the Bloom guarantees and
    // the degrade-route equivalence replay as constants
    "q245_bloom_bucketed_dedup" ->
      """WITH newb AS (
        |  SELECT doc_id + 10000000 AS doc_id,
        |         CASE WHEN doc_id % 2 = 0 THEN text
        |              ELSE text || ' fresh tail' END AS text
        |  FROM documents),
        |hist AS (
        |  SELECT DISTINCT trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |           AS k
        |  FROM documents)
        |SELECT n.doc_id,
        |       trim(regexp_replace(lower(n.text), '\s+', ' ', 'g'))
        |         IN (SELECT k FROM hist) AS exact_dup,
        |       TRUE AS no_false_neg, TRUE AS fp_ok,
        |       TRUE AS degrade_exact
        |FROM newb n ORDER BY n.doc_id""".stripMargin
  )
}
