package graft

/** `CREATE FUNCTION` through the router: the reference's JAVASCRIPT UDF
  * bodies (docs/general/user-defined-functions.rst examples verbatim)
  * translated onto Spark SQL scalar UDFs via [[graft.functions.JsUdf]].
  */
class JsUdfSpec extends SparkTestBase {
  import graft.functions.JsUdf

  private lazy val router = {
    val root = graft.ArtifactStore.scratchDir("graft_jsudf").toFile.getAbsolutePath
    new StatementRouter(spark, root)
  }

  private def one(sql: String): String = {
    val r = Engine.sql(spark, sql).collect()(0).get(0)
    if (r == null) "null" else r.toString
  }

  test("translator: docs' my_subtract_function") {
    val t = JsUdf.translate(
      "function my_subtract_function(a, b) { return a - b; }")
    assert(t.name == "my_subtract_function")
    assert(t.params == Seq("a", "b"))
    assert(t.sql == "a - b")
  }

  test("translator: var bindings, Math, array literals (docs' rotate_point)") {
    val t = JsUdf.translate(
      """function rotate_point(point, angle) {
        |  var cos = Math.cos(angle);
        |  var sin = Math.sin(angle);
        |  var x = cos * point[0] - sin * point[1];
        |  var y = sin * point[0] + cos * point[1];
        |  return [x, y];
        |}""".stripMargin)
    assert(t.params == Seq("point", "angle"))
    assert(t.sql.contains("cos(angle)"))
    assert(t.sql.contains("element_at(point, (0) + 1)"))
  }

  test("translator: object literal return (docs' line function)") {
    val t = JsUdf.translate(
      """function line(start, end) {
        |  return { "type": "LineString", "coordinates": [start, end] };
        |}""".stripMargin)
    assert(t.sql ==
      "named_struct('type', 'LineString', 'coordinates', array(start, end))")
  }

  test("translator: rejects loops with a clear error") {
    val e = intercept[UnsupportedOperationException](JsUdf.translate(
      "function f(a) { for (var i = 0; i < a; i++) {} return a; }"))
    assert(e.getMessage.contains("outside the translatable subset"))
  }

  test("routed CREATE FUNCTION end-to-end, scalar arithmetic") {
    router.execute(
      """CREATE FUNCTION my_subtract_function(integer, integer)
        |RETURNS integer
        |LANGUAGE JAVASCRIPT
        |AS 'function my_subtract_function(a, b) { return a - b; }'""".stripMargin)
    assert(one("SELECT my_subtract_function(3, 1)") == "2")
    // duplicate without OR REPLACE errors, like the reference
    val e = intercept[Exception](router.execute(
      """CREATE FUNCTION my_subtract_function(integer, integer)
        |RETURNS integer LANGUAGE JAVASCRIPT
        |AS 'function my_subtract_function(a, b) { return a - b; }'""".stripMargin))
    assert(e.getMessage.contains("already exists"))
    // OR REPLACE swaps the body
    router.execute(
      """CREATE OR REPLACE FUNCTION my_subtract_function(integer, integer)
        |RETURNS integer LANGUAGE JAVASCRIPT
        |AS 'function my_subtract_function(a, b) { return b - a; }'""".stripMargin)
    assert(one("SELECT my_subtract_function(3, 1)") == "-2")
    router.execute("DROP FUNCTION my_subtract_function(integer, integer)")
    intercept[Exception](Engine.sql(spark, "SELECT my_subtract_function(3, 1)").collect())
    router.execute("DROP FUNCTION IF EXISTS doc.my_subtract_function(integer, integer)")
  }

  test("routed CREATE FUNCTION: geo_point body with vars and Math") {
    router.execute(
      """CREATE OR REPLACE FUNCTION rotate_point(point geo_point, angle real)
        |RETURNS geo_point
        |LANGUAGE JAVASCRIPT
        |AS 'function rotate_point(point, angle) {
        |      var cos = Math.cos(angle);
        |      var sin = Math.sin(angle);
        |      var x = cos * point[0] - sin * point[1];
        |      var y = sin * point[0] + cos * point[1];
        |      return [x, y];
        |   }'""".stripMargin)
    val r = Engine.sql(spark,
      "SELECT rotate_point(CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>), CAST(pi() AS FLOAT))")
      .collect()(0).getSeq[Double](0)
    assert(math.abs(r(0) - (-1.0)) < 1e-6)
    assert(math.abs(r(1)) < 1e-6)
  }

  test("routed CREATE FUNCTION: ternary, string concat, conditions") {
    router.execute(
      """CREATE OR REPLACE FUNCTION grade(score double precision)
        |RETURNS text
        |LANGUAGE JAVASCRIPT
        |AS 'function grade(s) { return s >= 90 ? "A" : (s >= 50 ? "pass-" + s : "fail"); }'""".stripMargin)
    assert(one("SELECT grade(95.0)") == "A")
    assert(one("SELECT grade(60.0)") == "pass-60.0")
    assert(one("SELECT grade(10.0)") == "fail")
  }

  test("string methods: substring/indexOf/charAt/startsWith/includes") {
    router.execute(
      """CREATE OR REPLACE FUNCTION host_label(url text)
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function host_label(u) {
        |      var h = u.toLowerCase();
        |      return h.startsWith("https") ? h.substring(8, 8 + h.indexOf("/")) : h.charAt(0);
        |   }'""".stripMargin)
    // JS semantics exactly: indexOf('/') on the lowered url is 6 (the
    // first slash of '://'), so substring(8, 14) keeps the trailing slash
    assert(one("SELECT host_label('HTTPS://x.org/a')") == "x.org/")
    assert(one("SELECT host_label('ftp://x.org/a')") == "f")
    // JS indexOf -1 convention when absent
    router.execute(
      """CREATE OR REPLACE FUNCTION find_at(s text)
        |RETURNS integer LANGUAGE JAVASCRIPT
        |AS 'function find_at(s) { return s.indexOf("@"); }'""".stripMargin)
    assert(one("SELECT find_at('a@b')") == "1")
    assert(one("SELECT find_at('ab')") == "-1")
    // .replace is outside the TRANSLATABLE subset (SQL replace hits all
    // occurrences, JS only the first) — since round 5 it no longer
    // rejects: the body falls back to the step-bounded interpreter
    // (JsInterp), which implements the JS first-occurrence semantics
    router.execute(
      """CREATE OR REPLACE FUNCTION first_rep(s text)
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function first_rep(s) { return s.replace("a", "b"); }'""".stripMargin)
    assert(one("SELECT first_rep('banana')") == "bbnana")
  }

  test("information_schema.routines lists the created function") {
    router.execute(
      """CREATE OR REPLACE FUNCTION routine_probe(bigint)
        |RETURNS bigint LANGUAGE JAVASCRIPT
        |AS 'function routine_probe(x) { return x * 2; }'""".stripMargin)
    val rows = graft.sources.InformationSchema.routines(spark)
      .filter("routine_name = 'routine_probe'").count()
    assert(rows == 1)
  }
}

/** Round-4 breadth: guard-style control flow, the `**` operator,
  * Date.now(), and the string-method tail. */
class JsUdfBreadthSpec extends SparkTestBase {
  import graft.functions.JsUdf

  private lazy val router = {
    val root = graft.ArtifactStore.scratchDir("graft_jsudf2").toFile.getAbsolutePath
    new StatementRouter(spark, root)
  }

  private def one(sql: String): String = {
    val r = Engine.sql(spark, sql).collect()(0).get(0)
    if (r == null) "null" else r.toString
  }

  test("guard clauses: if/return chains fold into CASE") {
    router.execute(
      """CREATE OR REPLACE FUNCTION qty_band(q double precision)
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function qty_band(q) {
        |  if (q >= 40) return "high";
        |  if (q >= 20) { return "mid"; }
        |  return "low";
        |}'""".stripMargin)
    assert(one("SELECT qty_band(45.0)") == "high")
    assert(one("SELECT qty_band(25.0)") == "mid")
    assert(one("SELECT qty_band(5.0)") == "low")

    // if/else if/else with vars before and between
    router.execute(
      """CREATE OR REPLACE FUNCTION clamp01(x double precision)
        |RETURNS double precision LANGUAGE JAVASCRIPT
        |AS 'function clamp01(x) {
        |  var lo = 0.0; var hi = 1.0;
        |  if (x < lo) return lo;
        |  else if (x > hi) return hi;
        |  else return x;
        |}'""".stripMargin)
    assert(one("SELECT clamp01(-3.0)") == "0.0")
    assert(one("SELECT clamp01(0.25)") == "0.25")
    assert(one("SELECT clamp01(9.0)") == "1.0")

    // a body that can fall off the end is OUTSIDE the translatable
    // subset (the translator still rejects it) — since round 5 it runs
    // through the interpreter fallback with JS semantics: the uncovered
    // path returns undefined → SQL NULL
    intercept[UnsupportedOperationException](graft.functions.JsUdf.translate(
      "function no_ret(x) { if (x > 0) return x; }"))
    router.execute(
      """CREATE OR REPLACE FUNCTION no_ret(x bigint)
        |RETURNS bigint LANGUAGE JAVASCRIPT
        |AS 'function no_ret(x) { if (x > 0) return x; }'""".stripMargin)
    assert(one("SELECT no_ret(5)") == "5")
    assert(router.execute("SELECT no_ret(-5) AS r").head().isNullAt(0))
  }

  test("** operator: precedence and right associativity") {
    // 2**3**1 is right-associative (2**(3**1) = 8); ** binds over * and +
    val t = JsUdf.translate("function f(x, y) { return x ** 2 + 2 ** 3 ** 1 * y; }")
    assert(one("SELECT " + t.sql.replace("x", "3.0").replace("y", "1.0")) == "17.0")
  }

  test("string method tail: pads, repeat, replaceAll, split, charCodeAt") {
    router.execute(
      """CREATE OR REPLACE FUNCTION fmt_code(s text)
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function fmt_code(s) {
        |  return s.trimStart().padStart(6, "0").repeat(2);
        |}'""".stripMargin)
    // JS: "  ab".trimStart()="ab" → padStart(6,'0')="0000ab" → x2
    assert(one("SELECT fmt_code('  ab')") == "0000ab0000ab")
    // padStart never truncates (JS semantics, unlike bare lpad)
    router.execute(
      """CREATE OR REPLACE FUNCTION pad3(s text)
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function pad3(s) { return s.padStart(3); }'""".stripMargin)
    assert(one("SELECT pad3('hello')") == "hello")
    assert(one("SELECT pad3('x')") == "  x")

    router.execute(
      """CREATE OR REPLACE FUNCTION de_dash(s text)
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function de_dash(s) { return s.replaceAll("-", "_"); }'""".stripMargin)
    assert(one("SELECT de_dash('a-b-c')") == "a_b_c")

    // split on a literal separator: regex metachars are quoted
    router.execute(
      """CREATE OR REPLACE FUNCTION first_seg(s text)
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function first_seg(s) { return s.split(".")[0]; }'""".stripMargin)
    assert(one("SELECT first_seg('a.b.c')") == "a")

    router.execute(
      """CREATE OR REPLACE FUNCTION code_of(s text)
        |RETURNS integer LANGUAGE JAVASCRIPT
        |AS 'function code_of(s) { return s.charCodeAt(1); }'""".stripMargin)
    assert(one("SELECT code_of('AB')") == "66")
    assert(one("SELECT code_of('A')") == "null")

    router.execute(
      """CREATE OR REPLACE FUNCTION label_of(n bigint)
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function label_of(n) { return "id-".concat(n.toString()); }'""".stripMargin)
    assert(one("SELECT label_of(7)") == "id-7")
  }

  test("Date.now() lands on epoch millis") {
    val t = JsUdf.translate("function age_ms(t) { return Date.now() - t; }")
    assert(t.sql.contains("unix_millis(now())"))
    val v = one("SELECT unix_millis(now())").toLong
    assert(v > 1700000000000L)
  }
}

/** Reassignment + bounded for-loop unrolling. */
class JsUdfLoopSpec extends SparkTestBase {
  import graft.functions.JsUdf

  private lazy val router = {
    val root = graft.ArtifactStore.scratchDir("graft_jsudf3").toFile.getAbsolutePath
    new StatementRouter(spark, root)
  }

  private def one(sql: String): String = {
    val r = Engine.sql(spark, sql).collect()(0).get(0)
    if (r == null) "null" else r.toString
  }

  test("reassignment rebinds SSA-style") {
    router.execute(
      """CREATE OR REPLACE FUNCTION acc2(a double precision, b double precision)
        |RETURNS double precision LANGUAGE JAVASCRIPT
        |AS 'function acc2(a, b) {
        |  var s = a;
        |  s += b;
        |  s *= 2;
        |  return s;
        |}'""".stripMargin)
    assert(one("SELECT acc2(3.0, 4.0)") == "14.0")
    // param reassignment shadows the parameter
    router.execute(
      """CREATE OR REPLACE FUNCTION clampz(x double precision)
        |RETURNS double precision LANGUAGE JAVASCRIPT
        |AS 'function clampz(x) { x = x < 0.0 ? 0.0 : x; return x; }'""".stripMargin)
    assert(one("SELECT clampz(-5.0)") == "0.0")
    assert(one("SELECT clampz(2.5)") == "2.5")
  }

  test("integer-bounded for loops unroll (array fold shape)") {
    router.execute(
      """CREATE OR REPLACE FUNCTION sum4(a array(double precision))
        |RETURNS double precision LANGUAGE JAVASCRIPT
        |AS 'function sum4(a) {
        |  var s = 0.0;
        |  for (var i = 0; i < 4; i++) { s += a[i]; }
        |  return s;
        |}'""".stripMargin)
    assert(one("SELECT sum4(array(1.0, 2.0, 3.0, 4.0))") == "10.0")
    // the loop variable leaks its final value, like JS var
    val t = JsUdf.translate(
      "function f() { for (var i = 0; i < 3; i += 2) { } return i; }")
    assert(one("SELECT " + t.sql) == "4")
    // unroll cap is enforced loudly
    val e = intercept[Exception](JsUdf.translate(
      "function g(x) { var s = 0; for (var i = 0; i < 1000; i++) { s += x; } return s; }"))
    assert(e.getMessage.contains("64"))
  }

  test("descending for loops: i-- and i -= k with > / >= bounds") {
    router.execute(
      """CREATE OR REPLACE FUNCTION revcat(a array(text))
        |RETURNS text LANGUAGE JAVASCRIPT
        |AS 'function revcat(a) {
        |  var s = "";
        |  for (var i = 3; i >= 0; i--) { s = s.concat(a[i]); }
        |  return s;
        |}'""".stripMargin)
    assert(one("SELECT revcat(array('a', 'b', 'c', 'd'))") == "dcba")
    val t = JsUdf.translate(
      "function f() { var s = 0; for (var i = 10; i > 0; i -= 3) { s += i; } return s; }")
    assert(one("SELECT " + t.sql) == "22") // 10 + 7 + 4 + 1
    // a direction/condition mismatch is an infinite loop -> loud error
    val e2 = intercept[Exception](JsUdf.translate(
      "function g() { var s = 0; for (var i = 0; i < 5; i--) { s += i; } return s; }"))
    assert(e2.getMessage.toLowerCase.contains("direction"))
  }
}
