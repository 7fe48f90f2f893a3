package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-surface continuation (SURVEY.md §2.8): predicate operators
  * (ILIKE, IS DISTINCT FROM, BETWEEN, IN, null-safe), encode/decode
  * (base64/hex/sha), `format`, `try_cast`, record/struct subscripts, and
  * ANY/ALL-style array quantifiers.
  */
object QueriesFunctions2 {
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_predicates" -> ((s, dir) => {
      T(s, dir, "customer").select(
        col("c_custkey"),
        expr("c_name ILIKE '%a%'").as("has_a_ci"),
        expr("nullif(c_mktsegment, 'BUILDING') IS DISTINCT FROM c_mktsegment").as("was_building"),
        col("c_acctbal").between(0, 1000).as("small_bal"),
        col("c_nationkey").isin(1, 3, 5).as("in_nations"),
        col("c_mktsegment").startsWith("B").as("b_seg"),
        col("c_name").like("%0__1%").as("like_pat"))
        .orderBy(col("c_custkey"))
    }),

    "q80_encode_decode" -> ((s, dir) => {
      T(s, dir, "nation").select(
        col("n_name"),
        base64(col("n_name").cast("binary")).as("b64"),
        unbase64(base64(col("n_name").cast("binary"))).cast("string").as("roundtrip"),
        hex(col("n_name")).as("hexed"),
        sha2(col("n_name"), 256).as("sha"))
        .orderBy(col("n_name"))
    }),

    "q81_format" -> ((s, dir) => {
      T(s, dir, "nation").select(
        col("n_nationkey"),
        format_string("%s-%04d", col("n_name"), col("n_nationkey")).as("tagged"),
        format_string("%.2f", col("n_nationkey") / lit(3.0)).as("fixed2"))
        .orderBy(col("n_nationkey"))
    }),

    "q82_try_cast" -> ((s, dir) => {
      T(s, dir, "part").select(
        col("p_partkey"),
        expr("try_cast(substr(p_brand, 7) AS INT)").as("brand_num"),
        expr("try_cast(p_type AS INT)").as("bad_cast"),
        expr("try_cast(p_size AS STRING)").as("size_str"))
        .orderBy(col("p_partkey"))
    }),

    // Struct serialized via to_json so the harness can hash it.
    "q83_struct_subscript" -> ((s, dir) => {
      val st = struct(col("n_nationkey").as("key"), col("n_name").as("name"))
      T(s, dir, "nation").select(
        col("n_nationkey"),
        to_json(st).as("rec"),
        st.getField("name").as("rec_name"))
        .orderBy(col("n_nationkey"))
    }),

    "q84_any_all_array" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      T(s, dir, "documents").filter(col("doc_id") < 100).select(
        col("doc_id"),
        exists(toks, t => length(t) > 6).as("any_long"),
        forall(toks, t => length(t) < 15).as("all_short"),
        exists(toks, t => t === "spark").as("any_spark"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q79_predicates" ->
      """SELECT c_custkey,
                c_name ILIKE '%a%' AS has_a_ci,
                nullif(c_mktsegment, 'BUILDING') IS DISTINCT FROM c_mktsegment AS was_building,
                c_acctbal BETWEEN 0 AND 1000 AS small_bal,
                c_nationkey IN (1, 3, 5) AS in_nations,
                starts_with(c_mktsegment, 'B') AS b_seg,
                c_name LIKE '%0__1%' AS like_pat
         FROM customer ORDER BY c_custkey""",
    "q80_encode_decode" ->
      """SELECT n_name,
                to_base64(n_name::BLOB) AS b64,
                from_base64(to_base64(n_name::BLOB))::VARCHAR AS roundtrip,
                hex(n_name) AS hexed,
                sha256(n_name) AS sha
         FROM nation ORDER BY n_name""",
    "q81_format" ->
      """SELECT n_nationkey,
                printf('%s-%04d', n_name, n_nationkey) AS tagged,
                printf('%.2f', n_nationkey / 3.0) AS fixed2
         FROM nation ORDER BY n_nationkey""",
    "q82_try_cast" ->
      """SELECT p_partkey,
                TRY_CAST(substr(p_brand, 7) AS INT) AS brand_num,
                TRY_CAST(p_type AS INT) AS bad_cast,
                TRY_CAST(p_size AS VARCHAR) AS size_str
         FROM part ORDER BY p_partkey""",
    "q83_struct_subscript" ->
      """SELECT n_nationkey,
                CAST(to_json({'key': n_nationkey, 'name': n_name}) AS VARCHAR) AS rec,
                n_name AS rec_name
         FROM nation ORDER BY n_nationkey""",
    "q84_any_all_array" ->
      """SELECT doc_id,
                len(list_filter(string_split(text, ' '), t -> length(t) > 6)) > 0 AS any_long,
                len(list_filter(string_split(text, ' '), t -> NOT length(t) < 15)) = 0 AS all_short,
                len(list_filter(string_split(text, ' '), t -> t = 'spark')) > 0 AS any_spark
         FROM documents WHERE doc_id < 100 ORDER BY doc_id"""
  )
}
