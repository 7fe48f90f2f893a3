package graft

/** Plan-shape assertions for the round-3 TPC-H shapes: the properties that
  * must survive a 100 TB scale-up (dimension broadcasts, map-side partial
  * aggregation, decorrelation into aggregate joins — never a cartesian). */
class PlanShapeSpec2 extends SparkTestBase {

  private def plan(q: String): String =
    queries.QueriesRound3.queries(q)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("Q7 shape: nation dims broadcast, aggregation is partial->final") {
    val p = plan("q130_tpch_q7ish")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "both nation sides must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_"), "map-side combine missing")
  }

  test("Q2 shape: correlated min decorrelates to an aggregate join, no cartesian") {
    val p = plan("q131_tpch_q2ish")
    assert(!p.contains("CartesianProduct"))
    assert(p.toLowerCase.contains("min("), "decorrelated min aggregate missing")
  }

  test("Q22 shape: NOT EXISTS plans as an anti join") {
    val p = plan("q132_tpch_q22ish")
    assert(p.contains("LeftAnti"), "anti join missing")
    assert(!p.contains("CartesianProduct"))
  }

  test("Q11 shape: global threshold is a scalar subquery, group agg partial->final") {
    val p = plan("q133_tpch_q11ish")
    assert(p.contains("Subquery") || p.contains("subquery"))
    assert(p.contains("partial_"))
  }

  test("redaction query plans shuffle-free up to the final sort") {
    val p = plan("q134_redact_pii")
    // one Exchange for the global orderBy; no join/aggregate shuffles
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("Q8 shape: all six dims broadcast around the lineitem probe, no cartesian") {
    val p = plan("q146_tpch_q8ish")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "dimension tables must broadcast against the fact scan")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_"), "map-side combine missing")
  }

  test("Q10 shape: returnflag filter pushed to the lineitem scan, top-k bounded") {
    val p = plan("q147_tpch_q10ish")
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"),
      "returnflag must reach the parquet scan")
    assert(p.contains("TakeOrderedAndProject"), "LIMIT must not global-sort")
  }

  test("Q18 shape: IN over grouped HAVING plans as a semi join, no cartesian") {
    val p = plan("q149_tpch_q18ish")
    assert(p.contains("LeftSemi"), "IN subquery must become a semi join")
    assert(!p.contains("CartesianProduct"))
  }

  test("Q19 shape: disjunctive ranges keep the partkey equi-join") {
    val p = plan("q150_tpch_q19ish")
    assert(p.contains("HashJoin"), "equi-join must survive the OR residual")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "OR predicate must not degrade the join to a loop")
  }

  test("Q17 shape: correlated avg decorrelates to aggregate + equi-join") {
    val p = plan("q161_tpch_q17ish")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "per-part avg must join on l_partkey, not loop")
    assert(p.contains("partial_avg") || p.contains("avg("), "decorrelated aggregate missing")
  }

  test("Q21 shape: EXISTS + NOT EXISTS double correlation plans as semi/anti hash joins") {
    val p = plan("q163_tpch_q21ish")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"double correlation must become semi+anti joins:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
