package graft.queries

import graft.Tables
import graft.functions.TimeFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8) and table functions (§2.9):
  * string / math / trig / bitwise / datetime / regex / array families, plus
  * explode-unnest, generate_series, VALUES and zip-unnest.
  *
  * Transcendentals (exp/ln/trig) are rounded to 6 decimals in both engines:
  * libm last-ulp differences are real, 1e-6 granularity is not affected.
  */
object QueriesFunctions {
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_string_funcs" -> ((s, dir) => {
      T(s, dir, "nation").select(
        col("n_name"),
        lower(col("n_name")).as("lo"),
        initcap(lower(col("n_name"))).as("cap"),
        length(col("n_name")).as("len"),
        substring(col("n_name"), 2, 3).as("sub"),
        concat(col("n_name"), lit("_"), col("n_nationkey")).as("cat"),
        regexp_replace(col("n_name"), "A", "@").as("repl"),
        lpad(col("n_name"), 12, "*").as("pad_l"),
        rpad(col("n_name"), 12, "*").as("pad_r"),
        reverse(col("n_name")).as("rev"),
        expr("repeat(n_name, 2)").as("rep"),
        ascii(col("n_name")).as("asc_code"),
        instr(col("n_name"), "A").as("pos_a"),
        expr("left(n_name, 3)").as("l3"),
        expr("right(n_name, 3)").as("r3"),
        split_part(col("n_name"), lit("A"), lit(1)).as("part1"),
        translate(col("n_name"), "AEI", "aei").as("trans"),
        md5(col("n_name")).as("hash"),
        trim(lpad(col("n_name"), 10, " ")).as("trimmed"),
        expr("startswith(n_name, 'A')").as("starts_a"))
        .orderBy(col("n_name"))
    }),

    "q45_math_funcs" -> ((s, dir) => {
      T(s, dir, "part").select(
        col("p_partkey"),
        abs(-col("p_size")).as("abs_v"),
        ceil(col("p_retailprice")).cast("double").as("ceil_v"),
        floor(col("p_retailprice")).cast("double").as("floor_v"),
        round(col("p_retailprice").cast("decimal(18,2)"), 1).cast("double").as("round_1"),
        round(sqrt(col("p_size")), 6).as("sqrt_v"),
        round(cbrt(col("p_size")), 6).as("cbrt_v"),
        round(exp(col("p_size") / lit(100.0)), 6).as("exp_v"),
        round(log(col("p_retailprice")), 6).as("ln_v"),
        round(log10(col("p_retailprice")), 6).as("log10_v"),
        pow(col("p_size"), 2).cast("long").as("pow2"),
        (col("p_size") % 7).as("mod7"),
        signum(col("p_size") - 25).cast("int").as("sign_v"),
        round(radians(col("p_size")), 6).as("rad"),
        round(degrees(col("p_size") / lit(10.0)), 6).as("deg"))
        .orderBy(col("p_partkey"))
    }),

    "q46_trig_funcs" -> ((s, dir) => {
      val x = col("p_size") / lit(60.0)
      T(s, dir, "part").select(
        col("p_partkey"),
        round(sin(x), 6).as("sin_v"),
        round(cos(x), 6).as("cos_v"),
        round(tan(x), 6).as("tan_v"),
        round(asin(x / 2), 6).as("asin_v"),
        round(atan(x), 6).as("atan_v"),
        round(atan2(x, lit(1.0)), 6).as("atan2_v"),
        round(sinh(x), 6).as("sinh_v"),
        round(cosh(x), 6).as("cosh_v"),
        round(tanh(x), 6).as("tanh_v"))
        .orderBy(col("p_partkey"))
    }),

    "q47_bitwise" -> ((s, dir) => {
      T(s, dir, "part").select(
        col("p_partkey"),
        (col("p_size").bitwiseAND(12)).as("b_and"),
        (col("p_size").bitwiseOR(5)).as("b_or"),
        (col("p_size").bitwiseXOR(21)).as("b_xor"),
        shiftleft(col("p_size"), 2).as("b_shl"),
        shiftright(col("p_size"), 1).as("b_shr"),
        bit_count(col("p_size")).as("b_cnt"))
        .orderBy(col("p_partkey"))
    }),

    "q48_datetime_funcs" -> ((s, dir) => {
      T(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus_30d"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"))
        .orderBy(col("o_orderkey"))
    }),

    "q49_date_bin" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(TimeFunctions.dateBin(15L * 60 * 1000 * 1000, col("ts")).as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,3)")).cast("double").as("sum_value"))
        .orderBy(col("bin"))
    }),

    "q50_regex" -> ((s, dir) => {
      T(s, dir, "part").select(
        col("p_partkey"),
        regexp_replace(col("p_type"), "STEEL|BRASS", "METAL").as("detype"),
        col("p_type").rlike("BRASS$").as("is_brass"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"))
        .orderBy(col("p_partkey"))
    }),

    "q51_array_funcs" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      T(s, dir, "documents").filter(col("doc_id") < 100).select(
        col("doc_id"),
        size(toks).as("n_toks"),
        element_at(toks, 1).as("first_tok"),
        array_contains(toks, "spark").as("has_spark"),
        // round 5: array_position carries the REFERENCE's semantics
        // (NULL when absent — ArrayPositionFunction.java, GraftFunctions
        // shim), which DuckDB's list_position shares natively
        array_position(toks, "spark").cast("long").as("pos_spark"),
        array_join(slice(toks, 1, 3), " ").as("head3"),
        size(array_distinct(toks)).as("n_uniq"),
        element_at(sort_array(toks), 1).as("min_tok"))
        .orderBy(col("doc_id"))
    }),

    "q52_explode" -> ((s, dir) => {
      T(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .orderBy(col("doc_id"), col("tok"))
    }),

    "q53_generate_series" -> ((s, dir) => {
      s.range(1, 1001).toDF("n")
        .select(col("n"), (col("n") * col("n")).as("n_sq"),
          (col("n") % 10).as("n_mod"))
        .orderBy(col("n"))
    }),

    "q54_values_relation" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
        .toDF("id", "name").orderBy(col("id"))
    }),

    "q55_unnest_zip" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      T(s, dir, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(toks).as(Seq("idx0", "tok")))
        .select(col("doc_id"), (col("idx0") + 1).cast("long").as("idx"), col("tok"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    "q56_case_conditional" -> ((s, dir) => {
      T(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low").otherwise("high").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("DEFAULT")).as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
        least(col("c_acctbal"), lit(1000.0)).as("capped_bal"),
        (col("c_acctbal") > 0).as("in_credit"))
        .orderBy(col("c_custkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q44_string_funcs" ->
      """SELECT n_name,
                lower(n_name) AS lo,
                array_to_string(list_transform(string_split(lower(n_name), ' '),
                    x -> upper(x[1]) || x[2:]), ' ') AS cap,
                length(n_name) AS len,
                substr(n_name, 2, 3) AS sub,
                concat(n_name, '_', n_nationkey) AS cat,
                regexp_replace(n_name, 'A', '@', 'g') AS repl,
                lpad(n_name, 12, '*') AS pad_l,
                rpad(n_name, 12, '*') AS pad_r,
                reverse(n_name) AS rev,
                repeat(n_name, 2) AS rep,
                ascii(n_name) AS asc_code,
                strpos(n_name, 'A') AS pos_a,
                left(n_name, 3) AS l3,
                right(n_name, 3) AS r3,
                split_part(n_name, 'A', 1) AS part1,
                translate(n_name, 'AEI', 'aei') AS trans,
                md5(n_name) AS hash,
                trim(lpad(n_name, 10, ' ')) AS trimmed,
                starts_with(n_name, 'A') AS starts_a
         FROM nation ORDER BY n_name""",
    "q45_math_funcs" ->
      """SELECT p_partkey,
                abs(-p_size) AS abs_v,
                CAST(ceil(p_retailprice) AS DOUBLE) AS ceil_v,
                CAST(floor(p_retailprice) AS DOUBLE) AS floor_v,
                CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS round_1,
                round(sqrt(p_size), 6) AS sqrt_v,
                round(cbrt(p_size), 6) AS cbrt_v,
                round(exp(p_size / 100.0), 6) AS exp_v,
                round(ln(p_retailprice), 6) AS ln_v,
                round(log10(p_retailprice), 6) AS log10_v,
                CAST(pow(p_size, 2) AS BIGINT) AS pow2,
                p_size % 7 AS mod7,
                CAST(sign(p_size - 25) AS INT) AS sign_v,
                round(radians(p_size), 6) AS rad,
                round(degrees(p_size / 10.0), 6) AS deg
         FROM part ORDER BY p_partkey""",
    "q46_trig_funcs" ->
      """SELECT p_partkey,
                round(sin(p_size / 60.0), 6) AS sin_v,
                round(cos(p_size / 60.0), 6) AS cos_v,
                round(tan(p_size / 60.0), 6) AS tan_v,
                round(asin(p_size / 120.0), 6) AS asin_v,
                round(atan(p_size / 60.0), 6) AS atan_v,
                round(atan2(p_size / 60.0, 1.0), 6) AS atan2_v,
                round((exp(p_size / 60.0) - exp(-(p_size / 60.0))) / 2, 6) AS sinh_v,
                round((exp(p_size / 60.0) + exp(-(p_size / 60.0))) / 2, 6) AS cosh_v,
                round((exp(p_size / 30.0) - 1) / (exp(p_size / 30.0) + 1), 6) AS tanh_v
         FROM part ORDER BY p_partkey""",
    "q47_bitwise" ->
      """SELECT p_partkey,
                p_size & 12 AS b_and,
                p_size | 5 AS b_or,
                xor(p_size, 21) AS b_xor,
                p_size << 2 AS b_shl,
                p_size >> 1 AS b_shr,
                CAST(bit_count(p_size) AS INT) AS b_cnt
         FROM part ORDER BY p_partkey""",
    "q48_datetime_funcs" ->
      """SELECT o_orderkey,
                CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
                CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
                CAST(extract(day FROM o_orderdate) AS BIGINT) AS dy,
                CAST(extract(dow FROM o_orderdate) AS BIGINT) AS dow,
                CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
                o_orderdate + INTERVAL 30 DAY AS plus_30d,
                CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
                epoch_ms(o_orderdate) AS epoch_ms,
                monthname(o_orderdate) AS month_name
         FROM orders ORDER BY o_orderkey""",
    "q49_date_bin" ->
      """SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS bin,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
         FROM events GROUP BY bin ORDER BY bin""",
    "q50_regex" ->
      """SELECT p_partkey,
                regexp_replace(p_type, 'STEEL|BRASS', 'METAL', 'g') AS detype,
                regexp_matches(p_type, 'BRASS$') AS is_brass,
                regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                regexp_extract(p_type, '^(\w+)', 1) AS type_head
         FROM part ORDER BY p_partkey""",
    "q51_array_funcs" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS n_toks,
                string_split(text, ' ')[1] AS first_tok,
                list_contains(string_split(text, ' '), 'spark') AS has_spark,
                CAST(nullif(list_position(string_split(text, ' '), 'spark'), 0) AS BIGINT) AS pos_spark,
                array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS head3,
                len(list_distinct(string_split(text, ' '))) AS n_uniq,
                list_sort(string_split(text, ' '))[1] AS min_tok
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "q52_explode" ->
      """SELECT * FROM (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents WHERE doc_id < 50)
         WHERE length(tok) > 0
         ORDER BY doc_id, tok""",
    "q53_generate_series" ->
      """SELECT n, n*n AS n_sq, n % 10 AS n_mod
         FROM (SELECT unnest(generate_series(1, 1000)) AS n) ORDER BY n""",
    "q54_values_relation" ->
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'alpha'), (2, 'beta'), (3, 'gamma')) t(id, name)
         ORDER BY id""",
    "q55_unnest_zip" ->
      """SELECT doc_id,
                CAST(unnest(generate_series(1, len(string_split(text, ' ')))) AS BIGINT) AS idx,
                unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE doc_id < 20
         ORDER BY doc_id, idx""",
    "q56_case_conditional" ->
      """SELECT c_custkey,
                CASE WHEN c_acctbal < 0 THEN 'neg'
                     WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band,
                coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg,
                greatest(c_acctbal, 0.0) AS pos_bal,
                least(c_acctbal, 1000.0) AS capped_bal,
                c_acctbal > 0 AS in_credit
         FROM customer ORDER BY c_custkey"""
  )
}
