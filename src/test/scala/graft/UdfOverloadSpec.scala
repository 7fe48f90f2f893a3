package graft

/** UDF signature overloading (reference user-defined-functions.rst
  * "Overloading" / Functions.java resolution): one name, several
  * argument signatures, per-call-site resolution — exact types first,
  * then the unique up-cast candidate; ambiguity and misses fail loudly
  * listing the known signatures. */
class UdfOverloadSpec extends SparkTestBase {

  private def newRouter(): StatementRouter = {
    val root = graft.ArtifactStore.scratchDir("graft_ovl")
      .toFile.getAbsolutePath
    new StatementRouter(spark, root)
  }

  test("arity overloading: same name, different argument counts") {
    val r = newRouter()
    graft.functions.UdfOverloads.clear("area")
    r.execute("CREATE OR REPLACE FUNCTION area(double) RETURNS double " +
      "LANGUAGE JAVASCRIPT AS 'function area(r) { return 3.141592653589793 * r * r; }'")
    r.execute("CREATE FUNCTION area(double, double) RETURNS double " +
      "LANGUAGE JAVASCRIPT AS 'function area(w, h) { return w * h; }'")
    val row = spark.sql("SELECT area(2.0d) AS circle, area(3.0d, 4.0d) AS rect")
      .collect()(0)
    assert(math.abs(row.getDouble(0) - math.Pi * 4) < 1e-12)
    assert(row.getDouble(1) == 12.0)
  }

  test("type overloading: exact match wins; unique up-cast engages") {
    val r = newRouter()
    graft.functions.UdfOverloads.clear("tag")
    r.execute("CREATE OR REPLACE FUNCTION tag(bigint) RETURNS text " +
      "LANGUAGE JAVASCRIPT AS 'function tag(n) { return \"num:\" + n; }'")
    r.execute("CREATE FUNCTION tag(text) RETURNS text " +
      "LANGUAGE JAVASCRIPT AS 'function tag(s) { return \"str:\" + s; }'")
    val row = spark.sql(
      "SELECT tag(CAST(7 AS BIGINT)) AS a, tag('x') AS b, tag(7) AS c")
      .collect()(0)
    assert(row.getString(0) == "num:7")
    assert(row.getString(1) == "str:x")
    // INT argument: no exact match; INT up-casts losslessly to BIGINT
    // but NOT to TEXT — the unique candidate wins
    assert(row.getString(2) == "num:7")
  }

  test("no candidate / replace semantics / information_schema hygiene") {
    val r = newRouter()
    graft.functions.UdfOverloads.clear("pick")
    r.execute("CREATE OR REPLACE FUNCTION pick(bigint) RETURNS bigint " +
      "LANGUAGE JAVASCRIPT AS 'function pick(n) { return n + 1; }'")
    // same signature again without OR REPLACE → loud
    val e = intercept[Exception](
      r.execute("CREATE FUNCTION pick(bigint) RETURNS bigint " +
        "LANGUAGE JAVASCRIPT AS 'function pick(n) { return n; }'"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // OR REPLACE swaps the implementation in place
    r.execute("CREATE OR REPLACE FUNCTION pick(bigint) RETURNS bigint " +
      "LANGUAGE JAVASCRIPT AS 'function pick(n) { return n * 10; }'")
    assert(spark.sql("SELECT pick(4)").collect()(0).getLong(0) == 40L)
    // a different arity needs no OR REPLACE
    r.execute("CREATE FUNCTION pick(bigint, bigint) RETURNS bigint " +
      "LANGUAGE JAVASCRIPT AS 'function pick(a, b) { return a > b ? a : b; }'")
    assert(spark.sql("SELECT pick(3, 9)").collect()(0).getLong(0) == 9L)
    // wrong arity fails listing the signatures
    val e2 = intercept[Exception](
      spark.sql("SELECT pick(1, 2, 3)").collect())
    assert(e2.getMessage.contains("pick"), e2.getMessage)
    // the mangled slots stay out of information_schema.routines
    graft.sources.InformationSchema.register(spark)
    val names = r.execute(
      "SELECT routine_name FROM information_schema.routines " +
        "WHERE routine_name LIKE '%pick%'")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("pick"), names.toString)
  }

  test("DROP FUNCTION by signature; bare drop requires a unique overload") {
    val r = newRouter()
    graft.functions.UdfOverloads.clear("gone")
    r.execute("CREATE OR REPLACE FUNCTION gone(bigint) RETURNS bigint " +
      "LANGUAGE JAVASCRIPT AS 'function gone(n) { return n; }'")
    r.execute("CREATE FUNCTION gone(text) RETURNS text " +
      "LANGUAGE JAVASCRIPT AS 'function gone(s) { return s; }'")
    val e = intercept[Exception](r.execute("DROP FUNCTION gone"))
    assert(e.getMessage.contains("overloaded"), e.getMessage)
    r.execute("DROP FUNCTION gone(text)")
    // the remaining overload still answers
    assert(spark.sql("SELECT gone(5)").collect()(0).getLong(0) == 5L)
    // one overload left: the bare drop now works, and the name is gone
    r.execute("DROP FUNCTION gone")
    val e2 = intercept[Exception](spark.sql("SELECT gone(1)").collect())
    assert(e2.getMessage.toLowerCase.contains("gone"), e2.getMessage)
    // IF EXISTS on a missing signature is a quiet no-op
    r.execute("DROP FUNCTION IF EXISTS gone(bigint)")
  }

  test("a failed CREATE leaves no phantom overload behind (ADVICE r12)") {
    val r = newRouter()
    graft.functions.UdfOverloads.clear("ph")
    // arity mismatch between the JS body and the declaration: the
    // implementation registration fails AFTER the overload slot was
    // claimed — the slot must be rolled back
    intercept[Exception](r.execute(
      "CREATE OR REPLACE FUNCTION ph(bigint, bigint) RETURNS bigint " +
        "LANGUAGE JAVASCRIPT AS 'function ph(n) { return n; }'"))
    assert(graft.functions.UdfOverloads.overloads("ph").isEmpty,
      "phantom overload survived a failed CREATE")
    // and the name is fully usable afterwards
    r.execute("CREATE OR REPLACE FUNCTION ph(bigint) RETURNS bigint " +
      "LANGUAGE JAVASCRIPT AS 'function ph(n) { return n + 1; }'")
    assert(spark.sql("SELECT ph(41) AS v").collect()(0).getLong(0) == 42L)
    // OR REPLACE over an existing signature that then fails keeps the
    // OLD implementation and declared return type serving
    intercept[Exception](r.execute(
      "CREATE OR REPLACE FUNCTION ph(bigint) RETURNS bigint " +
        "LANGUAGE JAVASCRIPT AS 'function ph(a, b) { return a + b; }'"))
    val ovl = graft.functions.UdfOverloads.overloads("ph")
    assert(ovl.length == 1 && ovl.head.retDdl.toUpperCase == "BIGINT")
    assert(spark.sql("SELECT ph(41) AS v").collect()(0).getLong(0) == 42L)
  }

  test("both implementation paths overload: translated and interpreted") {
    val r = newRouter()
    graft.functions.UdfOverloads.clear("mix")
    // arithmetic body → codegen'd translation
    r.execute("CREATE OR REPLACE FUNCTION mix(bigint) RETURNS bigint " +
      "LANGUAGE JAVASCRIPT AS 'function mix(n) { return n * 2; }'")
    // loop body → interpreter
    r.execute("CREATE FUNCTION mix(bigint, bigint) RETURNS bigint " +
      "LANGUAGE JAVASCRIPT AS 'function mix(a, b) { " +
      "var s = 0; for (let i = a; i <= b; i++) { s += i; } return s; }'")
    val row = spark.sql("SELECT mix(21) AS t, mix(1, 10) AS i").collect()(0)
    assert(row.getLong(0) == 42L && row.getLong(1) == 55L)
  }
}
