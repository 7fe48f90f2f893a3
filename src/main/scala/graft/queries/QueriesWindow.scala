package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window functions (SURVEY.md §2.5), GROUPING SETS/ROLLUP/CUBE (free in
  * Spark; absent in the reference grammar — included as strict superset) and
  * statistic/ordered-set aggregates (§2.4).
  *
  * Window ORDER BY keys always include a unique tiebreaker so frames are
  * total orders — same discipline the reference's
  * `WindowFunctionBatchIterator` needs for deterministic output.
  */
object QueriesWindow {
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def decSum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_row_number" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q27_rank_dense" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rk"), dense_rank().over(w).as("drk"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    "q28_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q29_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q30_range_frame" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, o_totalprice,
               count(*) OVER (ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
        FROM orders ORDER BY o_orderkey""")
    }),

    "q31_first_last_nth" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"),
          ntile(4).over(
            Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey")))
            .as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q32_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
               count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS LAST, l_linestatus NULLS LAST""")
    }),

    "q33_rollup" -> ((s, dir) => {
      T(s, dir, "nation")
        .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("r_name").asc_nulls_last, col("n_name").asc_nulls_last)
    }),

    "q34_cube" -> ((s, dir) => {
      T(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_last, col("o_orderpriority").asc_nulls_last)
    }),

    "q35_window_partition_agg" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
      T(s, dir, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").as("flag_qty"),
          count(lit(1)).over(w).as("flag_cnt"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q36_stats_agg" -> ((s, dir) => {
      T(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(
          round(stddev_samp(col("c_acctbal")), 2).as("sd_samp"),
          round(stddev_pop(col("c_acctbal")), 2).as("sd_pop"),
          round(var_samp(col("c_acctbal")) / 1000.0, 1).as("var_samp_k"),
          round(var_pop(col("c_acctbal")) / 1000.0, 1).as("var_pop_k"))
        .orderBy(col("c_nationkey"))
    }),

    "q37_percentile" -> ((s, dir) => {
      T(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"))
        .orderBy(col("l_returnflag"))
    }),

    "q38_min_max_by" -> ((s, dir) => {
      T(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(expr("max_by(o_orderstatus, o_orderkey)").as("last_status"),
          expr("min_by(o_orderstatus, o_orderkey)").as("first_status"),
          max(col("o_orderkey")).as("max_order"))
        .orderBy(col("o_custkey"))
    }),

    "q39_any_value" -> ((s, dir) => {
      T(s, dir, "customer").groupBy(col("c_custkey"))
        .agg(expr("any_value(c_name)").as("name"), count(lit(1)).as("cnt"))
        .orderBy(col("c_custkey"))
    }),

    // Array-valued result serialized with to_json so the driver's pandas
    // comparator can sort/hash it (arrays are unhashable in the harness).
    "q40_array_string_agg" -> ((s, dir) => {
      T(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(
          to_json(sort_array(collect_list(col("n_name")))).as("nations"),
          concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations_csv"))
        .orderBy(col("n_regionkey"))
    }),

    "q41_collect_set" -> ((s, dir) => {
      T(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(to_json(sort_array(collect_set(col("l_linestatus")))).as("statuses"))
        .orderBy(col("l_returnflag"))
    }),

    "q42_conditional_agg" -> ((s, dir) => {
      T(s, dir, "orders").groupBy(col("o_orderpriority"))
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          decSum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0)))
            .as("spend_f"))
        .orderBy(col("o_orderpriority"))
    }),

    "q43_geometric_mean" -> ((s, dir) => {
      T(s, dir, "customer").filter(col("c_acctbal") > 0)
        .groupBy(col("c_nationkey"))
        .agg(round(exp(avg(log(col("c_acctbal")))), 4).as("geo_mean"))
        .orderBy(col("c_nationkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q26_row_number" ->
      """SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders ORDER BY o_custkey, rn""",
    "q27_rank_dense" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk,
                dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drk
         FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey""",
    "q28_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
                lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
                lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q29_running_sum" ->
      """SELECT o_custkey, o_orderkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q30_range_frame" ->
      """SELECT o_orderkey, o_totalprice,
                count(*) OVER (ORDER BY o_totalprice
                  RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
         FROM orders ORDER BY o_orderkey""",
    "q31_first_last_nth" ->
      """SELECT o_custkey, o_orderkey,
                first_value(o_orderkey) OVER w AS first_order,
                last_value(o_orderkey) OVER w AS last_order,
                nth_value(o_orderkey, 2) OVER w AS second_order,
                ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
    "q32_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
                grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
                count(*) AS cnt,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY g_flag, g_status, l_returnflag NULLS LAST, l_linestatus NULLS LAST""",
    "q33_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS LAST, n_name NULLS LAST""",
    "q34_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""",
    "q35_window_partition_agg" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS flag_qty,
                count(*) OVER (PARTITION BY l_returnflag) AS flag_cnt
         FROM lineitem WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber""",
    "q36_stats_agg" ->
      """SELECT c_nationkey,
                round(stddev_samp(c_acctbal), 2) AS sd_samp,
                round(stddev_pop(c_acctbal), 2) AS sd_pop,
                round(var_samp(c_acctbal) / 1000.0, 1) AS var_samp_k,
                round(var_pop(c_acctbal) / 1000.0, 1) AS var_pop_k
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q37_percentile" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.5), 4) AS p50,
                round(quantile_cont(l_quantity, 0.25), 4) AS p25,
                round(quantile_cont(l_quantity, 0.95), 4) AS p95
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q38_min_max_by" ->
      """SELECT o_custkey, max_by(o_orderstatus, o_orderkey) AS last_status,
                min_by(o_orderstatus, o_orderkey) AS first_status,
                max(o_orderkey) AS max_order
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "q39_any_value" ->
      """SELECT c_custkey, any_value(c_name) AS name, count(*) AS cnt
         FROM customer GROUP BY c_custkey ORDER BY c_custkey""",
    "q40_array_string_agg" ->
      """SELECT n_regionkey, CAST(to_json(list_sort(array_agg(n_name))) AS VARCHAR) AS nations,
                string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "q41_collect_set" ->
      """SELECT l_returnflag,
                CAST(to_json(list_sort(list_distinct(array_agg(l_linestatus)))) AS VARCHAR) AS statuses
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q42_conditional_agg" ->
      """SELECT o_orderpriority,
                count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
                count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
                CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
                     AS DECIMAL(18,2))) AS DOUBLE) AS spend_f
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q43_geometric_mean" ->
      """SELECT c_nationkey, round(exp(avg(ln(c_acctbal))), 4) AS geo_mean
         FROM customer WHERE c_acctbal > 0
         GROUP BY c_nationkey ORDER BY c_nationkey"""
  )
}
