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

  test("as-of join plans as window passes, not a range join") {
    val plan = queries.QueriesFunctions5.queries("q111_asof_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // no join operator at all — the union+window formulation
    assert(!plan.contains("Join"), "asof must not plan a join")
    assert(plan.contains("Window"), "asof must carry values via a window")
  }

  test("geo radius join is a broadcast/hash equi-join on the cell key") {
    val plan = queries.QueriesFunctions5.queries("q112_geo_radius_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "radius join must never fall back to a cross join")
    // the CANDIDATE join is a hash equi-join on the cell key; the only
    // nested-loop allowed is the 1-row grid_covers_all audit-fact
    // broadcast (r12 no-silent-caps telemetry — same shape as q101's
    // summary facts below)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("__cell"),
      "candidate join must be a hash equi-join on the grid cell")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1, s"only the 1-row audit broadcast may nested-loop, got $bnlj")
  }

  test("quantified ordering comparisons broadcast one 1-row summary each") {
    val plan = queries.QueriesFunctions5.queries("q101_quantified_any")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // two summary subqueries (sub + empty sub) → exactly 2 broadcast
    // nested-loop joins of IdentityBroadcastMode 1-row relations; the big
    // side is never shuffled for the comparison itself
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj == 2, s"expected 2 summary broadcasts, got $bnlj")
  }

  test("ANALYZE feeds CBO: catalog tables carry rowCount statistics") {
    Tables.registerAllWithStats(spark, sfDir)
    for (t <- Seq("nation", "region", "customer", "orders")) {
      val stats = spark.table(t).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined && stats.rowCount.get > 0,
        s"$t has no rowCount after ANALYZE — cbo.joinReorder would be inert")
    }
    // with stats present, a dim-last join still plans the small sides as
    // broadcast builds (CBO + AQE see real sizes, not defaults)
    val joined = spark.sql(
      """SELECT r_name, count(*) AS c
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
