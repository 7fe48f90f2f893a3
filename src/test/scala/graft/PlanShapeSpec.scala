package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions: the physical plans we rely on at 100 TB actually
  * materialize (SURVEY.md §2.6, §4 — pushdown, top-k, broadcast). */
class PlanShapeSpec extends SparkTestBase {

  test("orderBy+limit compiles to TakeOrderedAndProject (bounded top-k)") {
    val plan = queries.QueriesRelational.queries("q05_topn")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("PK point lookup pushes the equality filter into the parquet scan") {
    val plan = queries.QueriesFunctions4.queries("q90_pk_lookup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1042)]"))
  }

  test("projection prunes the parquet read schema to selected columns") {
    val df = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("small dimension join broadcasts") {
    val plan = queries.QueriesRelational.queries("q17_tpch_q5ish")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("partial aggregation (map-side combine) precedes the shuffle") {
    val plan = queries.QueriesRelational.queries("q02_tpch_q1")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate(keys=[l_returnflag"))
    assert(plan.contains("partial_"))
  }
}
