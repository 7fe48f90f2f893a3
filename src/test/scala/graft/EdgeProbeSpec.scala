package graft

/** Edge probes for the round-13 expression surface: bare-NULL children
  * (NullType reaches doGenCode), overflow positions, zero-arg concat —
  * everything must either answer like the reference or fail LOUDLY,
  * never crash codegen. */
class EdgeProbeSpec extends SparkTestBase {
  private def tryQ(sql: String): Either[String, String] =
    try Right(Engine.sql(spark, sql).collect()(0).toString)
    catch { case e: Throwable =>
      Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }

  test("round-13 expressions: bare nulls, overflow, zero-arg") {
    graft.functions.GraftFunctions.registerAll(spark)
    val results = Seq(
      "SELECT substr(NULL, 1) AS x",
      "SELECT substr(NULL, 'o.b') AS x",
      "SELECT graft_interval_order(NULL) AS x",
      "SELECT '+5'::timestamp AS x",
      "SELECT concat() AS x",
      "SELECT round(CAST(NULL AS DOUBLE)) AS x",
      "SELECT log(CAST(NULL AS DOUBLE), 10.0) AS x",
      "SELECT substr('hello', 2147483648) AS x",
      "SELECT 'abc'::date AS x",
      "SELECT graft_interval_mul(graft_interval('1 day'), NULL) AS x"
    ).map(q => q -> tryQ(q))
    results.foreach { case (q, r) => info(s"$q => $r") }
    // nothing may die with a codegen/compile crash
    results.foreach { case (q, r) =>
      r.left.foreach { msg =>
        assert(!msg.contains("CompileException") &&
          !msg.contains("GeneratedClass"), s"$q codegen crash: $msg")
      }
    }
  }
}
