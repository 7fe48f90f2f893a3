package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-core query surface (SURVEY.md §2.1/§2.3/§2.7): scan, filter,
  * projection, aggregation, sort/limit/offset, distinct, every join type,
  * set ops, subqueries (scalar/correlated/IN), CTEs.
  *
  * Float discipline for oracle comparability: multi-row sums/avgs go through
  * DECIMAL(18,2) (exact, order-independent) and come back as DOUBLE; scalar
  * per-row arithmetic stays double (deterministic). Every query ends in a
  * total ORDER BY with explicit NULLS placement (CrateDB/PG default = NULLS
  * LAST on ASC; Spark's default differs — `Order.java:52`).
  */
object QueriesRelational {
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def decSum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1999-01-01") && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q02_tpch_q1" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(22,6)"))
            .cast("double").as("sum_disc_price"),
          (decSum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q03_agg_global" -> ((s, dir) => {
      T(s, dir, "orders").agg(
        count(lit(1)).as("cnt"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        decSum(col("o_totalprice")).as("sum_price"))
    }),

    "q04_count_distinct" -> ((s, dir) => {
      T(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("cnt"))
    }),

    "q05_topn" -> ((s, dir) => {
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q06_limit_offset" -> ((s, dir) => {
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .offset(10).limit(20)
    }),

    "q07_distinct" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q08_limit_distinct" -> ((s, dir) => {
      T(s, dir, "orders").select(col("o_orderpriority")).distinct()
        .orderBy(col("o_orderpriority")).limit(3)
    }),

    "q09_join_inner" -> ((s, dir) => {
      T(s, dir, "orders")
        .join(broadcast(T(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    "q10_join_left_agg" -> ((s, dir) => {
      T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(decSum(col("o_totalprice")), lit(0.0)).as("spend"))
        .orderBy(col("c_custkey"))
    }),

    "q11_join_right" -> ((s, dir) => {
      T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_last)
    }),

    "q12_join_full" -> ((s, dir) => {
      val c = T(s, dir, "customer").filter(col("c_nationkey") < 20)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      val su = T(s, dir, "supplier").filter(col("s_nationkey") >= 10)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      c.join(su, col("c_nationkey") === col("s_nationkey"), "full")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          col("n_cust"), col("n_supp"))
        .orderBy(col("nationkey"))
    }),

    "q13_join_semi" -> ((s, dir) => {
      T(s, dir, "customer")
        .join(T(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q14_join_anti" -> ((s, dir) => {
      T(s, dir, "customer")
        .join(T(s, dir, "orders").filter(col("o_totalprice") > 350000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q15_join_cross" -> ((s, dir) => {
      T(s, dir, "region").crossJoin(T(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q16_join_theta" -> ((s, dir) => {
      val r1 = T(s, dir, "region").select(col("r_regionkey").as("k1"), col("r_name").as("name1"))
      val r2 = T(s, dir, "region").select(col("r_regionkey").as("k2"), col("r_name").as("name2"))
      r1.join(r2, col("k1") < col("k2"))
        .select(col("name1"), col("name2"))
        .orderBy(col("name1"), col("name2"))
    }),

    "q17_tpch_q5ish" -> ((s, dir) => {
      T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(T(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(T(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(T(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" && col("o_orderdate") >= lit("1996-01-01"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(22,6)"))
          .cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),

    "q18_scalar_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                     / count(*) * 1.5 FROM orders)
        ORDER BY o_orderkey""")
    }),

    "q19_correlated_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / count(*) * 1.5
                           FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")
    }),

    "q20_in_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderpriority, count(*) AS n FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    "q21_union_all" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(lit("c").as("src"), col("c_custkey").as("id"))
      val su = T(s, dir, "supplier").select(lit("s").as("src"), col("s_suppkey").as("id"))
      c.unionAll(su).orderBy(col("src"), col("id"))
    }),

    "q22_union_distinct" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = T(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(su).distinct().orderBy(col("nationkey"))
    }),

    "q23_intersect" -> ((s, dir) => {
      T(s, dir, "customer").select(col("c_custkey").as("id"))
        .intersect(T(s, dir, "supplier").select(col("s_suppkey").as("id")))
        .orderBy(col("id"))
    }),

    "q24_except" -> ((s, dir) => {
      T(s, dir, "supplier").select(col("s_suppkey").as("id"))
        .except(T(s, dir, "customer").filter(col("c_custkey") > 50).select(col("c_custkey").as("id")))
        .orderBy(col("id"))
    }),

    "q25_cte" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH nat_rev AS (
          SELECT c_nationkey AS nationkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM customer JOIN orders ON c_custkey = o_custkey
          GROUP BY c_nationkey)
        SELECT nationkey, revenue FROM nat_rev
        WHERE revenue > (SELECT CAST(sum(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
                                / count(*) FROM nat_rev)
        ORDER BY nationkey""")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice*(1-l_discount) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_quantity < 10
         ORDER BY l_orderkey, l_linenumber""",
    "q02_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q03_agg_global" ->
      """SELECT count(*) AS cnt, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders""",
    "q04_count_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps,
                count(*) AS cnt FROM lineitem""",
    "q05_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q06_limit_offset" ->
      """SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 10""",
    "q07_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q08_limit_distinct" ->
      """SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority LIMIT 3""",
    "q09_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice FROM orders
         JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""",
    "q10_join_left_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
                coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q11_join_right" ->
      """SELECT c_custkey, o_orderkey FROM orders
         RIGHT JOIN customer ON o_custkey = c_custkey
         ORDER BY c_custkey ASC, o_orderkey ASC NULLS LAST""",
    "q12_join_full" ->
      """SELECT coalesce(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp FROM
           (SELECT c_nationkey, count(*) AS n_cust FROM customer WHERE c_nationkey < 20 GROUP BY c_nationkey) c
         FULL JOIN
           (SELECT s_nationkey, count(*) AS n_supp FROM supplier WHERE s_nationkey >= 10 GROUP BY s_nationkey) s
         ON c_nationkey = s_nationkey ORDER BY nationkey""",
    "q13_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY c_custkey""",
    "q14_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 350000)
         ORDER BY c_custkey""",
    "q15_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""",
    "q16_join_theta" ->
      """SELECT r1.r_name AS name1, r2.r_name AS name2
         FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey
         ORDER BY name1, name2""",
    "q17_tpch_q5ish" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
         GROUP BY n_name ORDER BY n_name""",
    "q18_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                      / count(*) * 1.5 FROM orders)
         ORDER BY o_orderkey""",
    "q19_correlated_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer c
         WHERE c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                   / count(*) * 1.5
                            FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
         ORDER BY c_custkey""",
    "q20_in_subquery" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q21_union_all" ->
      """SELECT * FROM (
           SELECT 'c' AS src, c_custkey AS id FROM customer
           UNION ALL
           SELECT 's' AS src, s_suppkey AS id FROM supplier)
         ORDER BY src, id""",
    "q22_union_distinct" ->
      """SELECT * FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION
           SELECT s_nationkey FROM supplier)
         ORDER BY nationkey""",
    "q23_intersect" ->
      """SELECT c_custkey AS id FROM customer
         INTERSECT SELECT s_suppkey FROM supplier ORDER BY id""",
    "q24_except" ->
      """SELECT s_suppkey AS id FROM supplier
         EXCEPT SELECT c_custkey FROM customer WHERE c_custkey > 50 ORDER BY id""",
    "q25_cte" ->
      """WITH nat_rev AS (
           SELECT c_nationkey AS nationkey,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           FROM customer JOIN orders ON c_custkey = o_custkey
           GROUP BY c_nationkey)
         SELECT nationkey, revenue FROM nat_rev
         WHERE revenue > (SELECT CAST(sum(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
                                 / count(*) FROM nat_rev)
         ORDER BY nationkey"""
  )
}
