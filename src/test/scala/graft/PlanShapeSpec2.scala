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
}
