package graft

import graft.functions.JsInterp

/** The step-bounded JS interpreter — the CREATE FUNCTION fallback for
  * bodies outside [[graft.functions.JsUdf]]'s translatable subset
  * (reference `extensions/lang-js/JavaScriptLanguage.java:28`). */
class JsInterpSpec extends SparkTestBase {

  private def ev(src: String, args: Any*): Any =
    JsInterp.compile(src).eval(args)

  test("while loop with data-dependent exit (popcount)") {
    val src =
      """function popcount(n) {
        |  var c = 0;
        |  while (n > 0) { c += n % 2; n = Math.floor(n / 2); }
        |  return c;
        |}""".stripMargin
    assert(ev(src, 0L) == 0.0)
    assert(ev(src, 255L) == 8.0)
    assert(ev(src, 1024L) == 1.0)
  }

  test("for loop with a non-literal bound (the translator rejects this)") {
    intercept[UnsupportedOperationException](graft.functions.JsUdf.translate(
      "function sumto(n) { var s = 0; for (var i = 1; i <= n; i++) { s += i; } return s; }"))
    val src =
      "function sumto(n) { var s = 0; for (var i = 1; i <= n; i++) { s += i; } return s; }"
    assert(ev(src, 100L) == 5050.0)
  }

  test("for...of iterates arrays and strings; break/continue apply") {
    assert(ev(
      """function f() {
        |  var s = 0;
        |  for (var x of [1, 2, 3, 4]) { if (x == 3) { continue; } s += x; }
        |  return s;
        |}""".stripMargin) == 7.0)
    assert(ev(
      """function f() {
        |  var out = '';
        |  for (c of 'abc') { if (c == 'c') { break; } out += c; }
        |  return out;
        |}""".stripMargin) == "ab")
    // the loop variable shadows/overwrites like JS var semantics
    assert(ev(
      """function f(n) {
        |  var total = 0;
        |  var arr = [];
        |  for (var i = 0; i < n; i++) { arr.push(i * 2); }
        |  for (var v of arr) { total += v; }
        |  return total;
        |}""".stripMargin, 4L) == 12.0)
  }

  test("break/continue unwind to the innermost loop only") {
    val src =
      """function f() {
        |  var hits = 0;
        |  for (var i = 0; i < 5; i++) {
        |    for (var j = 0; j < 5; j++) {
        |      if (j > i) { break; }
        |      if (j % 2 == 1) { continue; }
        |      hits++;
        |    }
        |  }
        |  return hits;
        |}""".stripMargin
    // per i: j in 0..i with even j only → 1,1,2,2,3 hits
    assert(ev(src) == 9.0)
  }

  test("JS-faithful string .replace (first occurrence) and .split") {
    val src =
      """function f(s) {
        |  var parts = s.split('-');
        |  return parts.length + ':' + s.replace('-', '_');
        |}""".stripMargin
    assert(ev(src, "a-b-c") == "3:a_b-c")
  }

  test("array mutation via push inside a loop") {
    val src =
      """function evens(n) {
        |  var out = [];
        |  for (var i = 0; i < n; i++) { if (i % 2 == 0) { out.push(i); } }
        |  return out.join(',');
        |}""".stripMargin
    assert(ev(src, 7L) == "0,2,4,6")
  }

  test("object literals: member/index access, mutation, JSON toStr") {
    val src =
      """function f(n) {
        |  var acc = { evens: 0, odds: 0, label: 'counts' };
        |  for (var i = 1; i <= n; i++) {
        |    if (i % 2 == 0) { acc['evens'] = acc['evens'] + 1; }
        |    else { acc['odds'] = acc['odds'] + 1; }
        |  }
        |  return acc.label + ':' + acc.evens + '/' + acc.odds;
        |}""".stripMargin
    assert(ev(src, 5L) == "counts:2/3")
    // whole-object return serializes as JSON for a TEXT-declared UDF
    val obj = "function g() { return { a: 1, b: 'x' }; }"
    assert(JsInterp.compile(obj).eval(Nil).toString.nonEmpty)
  }

  test("runaway loops die loudly at the step budget") {
    val e = intercept[IllegalStateException](
      ev("function f() { while (true) { } return 1; }"))
    assert(e.getMessage.contains("step budget"))
  }

  test("Math.random and Date rejected at parse time") {
    intercept[UnsupportedOperationException](
      JsInterp.compile("function f() { return Math.random(); }"))
    intercept[UnsupportedOperationException](
      JsInterp.compile("function f() { return Date.now(); }"))
  }

  test("routed CREATE FUNCTION falls back to the interpreter end-to-end") {
    val root = java.nio.file.Files.createTempDirectory("graft_jsinterp")
      .toFile.getAbsolutePath
    val r = new StatementRouter(spark, root)
    r.execute(
      """CREATE FUNCTION js_popcount(bigint) RETURNS integer
        |LANGUAGE JAVASCRIPT AS 'function js_popcount(n) {
        |  var c = 0;
        |  while (n > 0) { c += n % 2; n = Math.floor(n / 2); }
        |  return c;
        |}'""".stripMargin)
    val rows = r.execute(
      "SELECT js_popcount(7) AS a, js_popcount(1023) AS b, js_popcount(0) AS c")
      .head()
    assert(rows.getInt(0) == 3 && rows.getInt(1) == 10 && rows.getInt(2) == 0)
    // declared return types are honored (string result from a loop body)
    r.execute(
      """CREATE FUNCTION js_revwords(text) RETURNS text
        |LANGUAGE JAVASCRIPT AS 'function js_revwords(s) {
        |  var parts = s.split(" ");
        |  var out = [];
        |  for (var i = parts.length - 1; i >= 0; i--) { out.push(parts[i]); }
        |  return out.join(" ");
        |}'""".stripMargin)
    assert(r.execute("SELECT js_revwords('the quick fox') AS t")
      .head().getString(0) == "fox quick the")
    // translatable bodies still take the codegen path (no regression)
    r.execute(
      """CREATE FUNCTION js_twice(double) RETURNS double
        |LANGUAGE JAVASCRIPT AS 'function js_twice(x) { return 2 * x; }'"""
        .stripMargin)
    assert(r.execute("SELECT js_twice(21.0) AS t").head().getDouble(0) == 42.0)
  }

  test("strict vs loose equality follow the JS algorithms") {
    // === requires matching runtime types — no coercion
    assert(ev("function f(a) { return a === '1'; }", 1L) == false)
    assert(ev("function f(a) { return a !== '1'; }", 1L) == true)
    assert(ev("function f(a) { return a === 1; }", 1L) == true)
    assert(ev("function f() { return 'x' === 'x'; }") == true)
    assert(ev("function f() { return true === 1; }") == false)
    // == coerces through ToNumber when one side is numeric or boolean
    assert(ev("function f(a) { return a == '1'; }", 1L) == true)
    assert(ev("function f() { return '' == 0; }") == true)
    assert(ev("function f() { return '  ' == 0; }") == true)
    assert(ev("function f() { return true == 1; }") == true)
    assert(ev("function f() { return false == ''; }") == true)
    assert(ev("function f() { return 'a' == 0; }") == false)
    assert(ev("function f(a) { return a != '2'; }", 1L) == true)
    // objects/arrays compare by reference identity under ===
    assert(ev("function f() { return [1, 2] === [1, 2]; }") == false)
    assert(ev("function f() { var a = [1, 2]; var b = a; return a === b; }") == true)
    assert(ev("function f() { var a = [1, 2]; return a !== [1, 2]; }") == true)
  }
}
