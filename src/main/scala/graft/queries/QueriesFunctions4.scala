package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Final round-1 coverage batch: primary-key point lookup (`Get`), numeric
  * array aggregates, and chr/char-class functions.
  */
object QueriesFunctions4 {
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference `Get` (Get.java:65): PK point lookup. In Spark this is a
    // pushed-down equality filter — `PushedFilters: [EqualTo(o_orderkey,..)]`
    // reaches the parquet scan (asserted in PlanShapeSpec).
    "q90_pk_lookup" -> ((s, dir) => {
      T(s, dir, "orders").filter(col("o_orderkey") === 1042)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // Array columns serialized via to_json for harness hashability; the
    // long casts keep JSON integer text identical to DuckDB's BIGINT lists.
    "q91_array_numeric" -> ((s, dir) => {
      val arr = sequence(lit(1L), (col("p_size") % 5 + 2).cast("long"))
      T(s, dir, "part").select(
        col("p_partkey"),
        to_json(arr).as("seq_arr"),
        aggregate(arr, lit(0L), (acc, x) => acc + x).as("arr_sum"),
        array_min(arr).cast("long").as("arr_min"),
        array_max(arr).cast("long").as("arr_max"),
        size(arr).cast("long").as("arr_len"),
        (aggregate(arr, lit(0L), (acc, x) => acc + x).cast("double") / size(arr)).as("arr_avg"),
        to_json(concat(array(lit(0L)), arr)).as("prepended"),
        to_json(flatten(array(arr, array(lit(99L))))).as("appended"))
        .orderBy(col("p_partkey"))
    }),

    "q92_chr_ascii" -> ((s, dir) => {
      T(s, dir, "nation").select(
        col("n_nationkey"),
        expr("char(65 + n_nationkey % 26)").as("letter"),
        ascii(col("n_name")).as("first_code"),
        expr("regexp_count(n_name, 'A')").as("n_a"))
        .orderBy(col("n_nationkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q90_pk_lookup" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 1042""",
    "q91_array_numeric" ->
      """SELECT p_partkey,
                CAST(to_json(arr) AS VARCHAR) AS seq_arr,
                CAST(list_sum(arr) AS BIGINT) AS arr_sum,
                CAST(list_min(arr) AS BIGINT) AS arr_min,
                CAST(list_max(arr) AS BIGINT) AS arr_max,
                CAST(len(arr) AS BIGINT) AS arr_len,
                list_sum(arr) / CAST(len(arr) AS DOUBLE) AS arr_avg,
                CAST(to_json(list_prepend(CAST(0 AS BIGINT), arr)) AS VARCHAR) AS prepended,
                CAST(to_json(list_append(arr, CAST(99 AS BIGINT))) AS VARCHAR) AS appended
         FROM (SELECT p_partkey, generate_series(CAST(1 AS BIGINT), p_size % 5 + 2) AS arr FROM part)
         ORDER BY p_partkey""",
    "q92_chr_ascii" ->
      """SELECT n_nationkey,
                chr(65 + n_nationkey % 26) AS letter,
                ascii(n_name) AS first_code,
                length(n_name) - length(replace(n_name, 'A', '')) AS n_a
         FROM nation ORDER BY n_nationkey"""
  )
}
