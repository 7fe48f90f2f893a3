package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar/window surface continuation: regexp table-function shape,
  * array set operations, interval arithmetic, percent_rank/cume_dist,
  * explicit NULLS FIRST/LAST ordering (CrateDB = PG semantics).
  */
object QueriesFunctions3 {
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val stop = Array("the", "a", "of", "and", "data")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Array results serialized via to_json for harness hashability.
    "q85_regexp_extract_all" -> ((s, dir) => {
      T(s, dir, "part").select(
        col("p_partkey"),
        to_json(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0))).as("words"),
        size(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0))).as("n_words"))
        .orderBy(col("p_partkey"))
    }),

    "q86_array_setops" -> ((s, dir) => {
      val toks = array_distinct(split(col("text"), " "))
      val sw = lit(stop)
      T(s, dir, "documents").filter(col("doc_id") < 100).select(
        col("doc_id"),
        to_json(sort_array(array_intersect(toks, sw))).as("stop_hits"),
        to_json(sort_array(array_except(toks, sw))).as("content_toks"),
        size(array_union(toks, sw)).as("n_union"),
        arrays_overlap(toks, sw).as("has_stop"))
        .orderBy(col("doc_id"))
    }),

    "q87_interval_arith" -> ((s, dir) => {
      T(s, dir, "orders").select(
        col("o_orderkey"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("months_since"),
        (col("o_orderdate") + expr("INTERVAL '1-2' YEAR TO MONTH")).as("plus_1y2m"),
        (col("o_orderdate") - expr("INTERVAL '90' DAY")).as("minus_90d"),
        (col("o_orderdate") + expr("INTERVAL '36' HOUR")).as("plus_36h"))
        .orderBy(col("o_orderkey"))
    }),

    "q88_percent_rank" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      // floor(x*1e6), not round(x, 6): percent_rank hits exact decimal
      // midpoints (k/(n-1)) where Spark's BigDecimal HALF_UP and DuckDB's
      // multiply-based round disagree; floor on the identical double is
      // engine-independent.
      s.sql("""
        SELECT c_custkey,
               CAST(floor(percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) * 1e6) AS BIGINT) AS pr_u,
               CAST(floor(cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) * 1e6) AS BIGINT) AS cd_u
        FROM customer ORDER BY c_custkey""")
    }),

    "q89_nulls_ordering" -> ((s, dir) => {
      val withNulls = T(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal"))
      withNulls.orderBy(col("bal").asc_nulls_last, col("c_custkey"))
        .limit(200)
    })
  )

  val oracles: Map[String, String] = Map(
    "q85_regexp_extract_all" ->
      """SELECT p_partkey,
                CAST(to_json(regexp_extract_all(p_name, '[a-z]+')) AS VARCHAR) AS words,
                len(regexp_extract_all(p_name, '[a-z]+')) AS n_words
         FROM part ORDER BY p_partkey""",
    "q86_array_setops" ->
      """SELECT doc_id,
                CAST(to_json(list_sort(list_filter(toks, x -> list_contains(sw, x)))) AS VARCHAR) AS stop_hits,
                CAST(to_json(list_sort(list_filter(toks, x -> NOT list_contains(sw, x)))) AS VARCHAR) AS content_toks,
                len(toks) + len(list_filter(sw, x -> NOT list_contains(toks, x))) AS n_union,
                list_has_any(toks, sw) AS has_stop
         FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
                      ['the', 'a', 'of', 'and', 'data'] AS sw
               FROM documents WHERE doc_id < 100)
         ORDER BY doc_id""",
    "q87_interval_arith" ->
      """SELECT o_orderkey,
                CAST((extract(year FROM o_orderdate) - 1995) * 12
                     + extract(month FROM o_orderdate) - 1 AS BIGINT) AS months_since,
                o_orderdate + INTERVAL '1 year 2 months' AS plus_1y2m,
                o_orderdate - INTERVAL '90 days' AS minus_90d,
                o_orderdate + INTERVAL '36 hours' AS plus_36h
         FROM orders ORDER BY o_orderkey""",
    "q88_percent_rank" ->
      """SELECT c_custkey,
                CAST(floor(percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) * 1e6) AS BIGINT) AS pr_u,
                CAST(floor(cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) * 1e6) AS BIGINT) AS cd_u
         FROM customer ORDER BY c_custkey""",
    "q89_nulls_ordering" ->
      """SELECT c_custkey,
                CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
         FROM customer
         ORDER BY bal ASC NULLS LAST, c_custkey LIMIT 200"""
  )
}
