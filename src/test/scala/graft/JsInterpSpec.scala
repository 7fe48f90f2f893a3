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
    val root = graft.ArtifactStore.scratchDir("graft_jsinterp")
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

  test("nested function declarations and recursion") {
    val fib =
      """function fib(n) {
        |  function f(k) { return k < 2 ? k : f(k - 1) + f(k - 2); }
        |  return f(n);
        |}""".stripMargin
    assert(ev(fib, 0L) == 0.0)
    assert(ev(fib, 10L) == 55.0)
    assert(ev(fib, 15L) == 610.0)
    // naive fib(25) needs ~1M steps: the budget catches it as a runaway
    intercept[IllegalStateException](ev(fib, 25L))
    // mutual recursion through the shared enclosing scope
    assert(ev(
      """function par(n) {
        |  function isEven(k) { return k == 0 ? true : isOdd(k - 1); }
        |  function isOdd(k)  { return k == 0 ? false : isEven(k - 1); }
        |  return isEven(n) ? 'even' : 'odd';
        |}""".stripMargin, 7L) == "odd")
  }

  test("closures capture and MUTATE the defining scope") {
    assert(ev(
      """function f(n) {
        |  function mkCounter() {
        |    var t = 0;
        |    return function() { t += 1; return t; };
        |  }
        |  var c = mkCounter();
        |  var last = 0;
        |  for (var i = 0; i < n; i++) { last = c(); }
        |  var c2 = mkCounter();
        |  return last * 100 + c2();
        |}""".stripMargin, 5L) == 501.0) // two counters: independent state
    // closure over a parameter (adder factory)
    assert(ev(
      """function f(x) {
        |  var add = function(a) { return function(b) { return a + b; }; };
        |  return add(x)(10);
        |}""".stripMargin, 32L) == 42.0)
  }

  test("arrow functions, IIFEs, named function expressions") {
    assert(ev("function f(n) { var sq = x => x * x; return sq(n); }", 9L) == 81.0)
    assert(ev("function f(a, b) { var g = (x, y) => { return x * y + 1; }; return g(a, b); }",
      6L, 7L) == 43.0)
    assert(ev("function f() { return (function() { return 7; })(); }") == 7.0)
    // named function EXPRESSION recurses via its own name
    assert(ev(
      "function f(n) { var fact = function go(k) { return k <= 1 ? 1 : k * go(k - 1); }; return fact(n); }",
      6L) == 720.0)
  }

  test("higher-order array methods with closure callbacks") {
    assert(ev(
      """function f() {
        |  var a = [1, 2, 3, 4, 5];
        |  return a.map(x => x * x).filter(x => x % 2 == 1)
        |          .reduce(function(p, x) { return p + x; }, 0);
        |}""".stripMargin) == 35.0) // 1 + 9 + 25
    assert(ev(
      """function f() {
        |  var hits = 0;
        |  ['a', 'bb', 'ccc'].forEach(function(s) { hits += s.length; });
        |  return hits;
        |}""".stripMargin) == 6.0)
    assert(ev("function f() { return [3, 8, 2].some(x => x > 5); }") == true)
    assert(ev("function f() { return [3, 8, 2].every(x => x > 5); }") == false)
    assert(ev("function f() { return [3, 8, 2].find(x => x > 5); }") == 8.0)
    assert(ev("function f() { return [3, 8, 2].findIndex(x => x > 5); }") == 1.0)
    assert(ev("function f() { return [2, 5].reduce(function(p, x) { return p * x; }); }") == 10.0)
  }

  test("var loop capture shares ONE binding (JS var semantics)") {
    assert(ev(
      """function f() {
        |  var fs = [];
        |  for (var i = 0; i < 3; i++) { fs.push(function() { return i; }); }
        |  return fs.map(function(g) { return g(); }).join(',');
        |}""".stripMargin) == "3,3,3")
  }

  test("per-iteration let capture is modeled exactly (since round 11)") {
    // the shape earlier rounds rejected at parse now returns the ES
    // answer: each closure sees its own iteration's binding
    assert(ev(
      """function f() {
        |  var fs = [];
        |  for (let i = 0; i < 3; i++) { fs.push(function() { return i; }); }
        |  return fs[0]() + ',' + fs[1]() + ',' + fs[2]();
        |}""".stripMargin) == "0,1,2")
    // let WITHOUT a closure in the body: same sums as var
    assert(ev(
      "function f(n) { var s = 0; for (let i = 0; i < n; i++) { s += i; } return s; }",
      5L) == 10.0)
  }

  test("runaway recursion trips the depth cap, not the JVM stack") {
    val e = intercept[IllegalStateException](ev(
      "function f(n) { function go(k) { return go(k + 1); } return go(0); }", 1L))
    assert(e.getMessage.contains("call depth"), e.getMessage)
    // deep-but-bounded recursion under the cap still works
    assert(ev(
      "function f(n) { function go(k) { return k <= 0 ? 0 : 1 + go(k - 1); } return go(n); }",
      100L) == 100.0)
  }

  test("template literals desugar to JS string concatenation") {
    assert(ev("function f(n) { return `id-${n}`; }", 7L) == "id-7")
    assert(ev("function f(a, b) { return `${a} + ${b} = ${a + b}`; }",
      2L, 3L) == "2 + 3 = 5")
    assert(ev("function f() { return `no interp`; }") == "no interp")
    assert(ev("function f(s) { return `[${s.toUpperCase()}]`; }", "ab") == "[AB]")
    assert(ev("function f(n) { return `${n}`; }", 5L) == "5") // string, not num
    assert(ev("function f(n) { return `${n > 3 ? 'big' : 'small'}x`; }", 1L)
      == "smallx") // full expressions inside the interpolation
    val e = intercept[UnsupportedOperationException](JsInterp.compile(
      "function f(n) { return `${`inner ${n}`}`; }"))
    assert(e.getMessage.contains("nested template"), e.getMessage)
  }

  test("regex literals: test/match/replace/split/search, flags, division") {
    assert(ev("function f(s) { return /^[a-z]+$/.test(s); }", "abc") == true)
    assert(ev("function f(s) { return /^[a-z]+$/.test(s); }", "a1c") == false)
    assert(ev("function f(s) { return /ABC/i.test(s); }", "xabcx") == true)
    // replace: non-global hits first occurrence, /g hits all, $1/$& refs
    assert(ev("function f(s) { return s.replace(/o/, '0'); }", "foo") == "f0o")
    assert(ev("function f(s) { return s.replace(/o/g, '0'); }", "foo") == "f00")
    assert(ev("function f(s) { return s.replace(/(\\d+)/, '[$1]'); }",
      "id 42 here") == "id [42] here")
    assert(ev("function f(s) { return s.replace(/\\d+/g, '<$&>'); }",
      "a1b22") == "a<1>b<22>")
    // match: /g returns all full matches; non-g returns [full, groups]
    assert(ev("function f(s) { return s.match(/\\d+/g).join(','); }",
      "a1b22c333") == "1,22,333")
    assert(ev("function f(s) { return s.match(/(\\w+)@(\\w+)/)[2]; }",
      "mail me x@y now") == "y")
    assert(ev("function f(s) { return s.match(/zzz/) === null; }", "abc") == true)
    // split on a regex keeps empties (JS semantics); search finds index
    assert(ev("function f(s) { return s.split(/[,;]/).length; }", "a,b;;c") == 4.0)
    assert(ev("function f(s) { return s.search(/b+/); }", "aabba") == 2.0)
    assert(ev("function f(s) { return s.search(/zz/); }", "aabba") == -1.0)
    // '/' after a value is still division, after return it's a regex
    assert(ev("function f(a, b) { return a / b; }", 10L, 4L) == 2.5)
    assert(ev("function f(x) { var r = x / 2 / 2; return r; }", 12L) == 3.0)
    // unsupported flag fails loudly at evaluation of the literal
    intercept[UnsupportedOperationException](ev(
      "function f(s) { return /a/y.test(s); }", "a"))
  }

  test("try/catch/throw/finally: user values, engine guards uncatchable") {
    assert(ev(
      """function f(n) {
        |  try { if (n % 3 == 0) { throw 'fizz'; } return 'ok' + n; }
        |  catch (e) { return 'caught ' + e; }
        |}""".stripMargin, 9L) == "caught fizz")
    assert(ev(
      """function f(n) {
        |  try { if (n % 3 == 0) { throw 'fizz'; } return 'ok' + n; }
        |  catch (e) { return 'caught ' + e; }
        |}""".stripMargin, 7L) == "ok7")
    // thrown objects carry structure; finally always runs
    assert(ev(
      """function f() {
        |  var log = [];
        |  try { log.push('t'); throw { code: 42 }; }
        |  catch (e) { log.push('c' + e.code); }
        |  finally { log.push('f'); }
        |  return log.join(',');
        |}""".stripMargin) == "t,c42,f")
    // a throw crosses function boundaries to the caller's catch
    assert(ev(
      """function f() {
        |  function boom() { throw 'inner'; }
        |  try { boom(); return 'no'; } catch (e) { return 'got ' + e; }
        |}""".stripMargin) == "got inner")
    // try/finally without catch reruns finally then rethrows
    assert(ev(
      """function f() {
        |  var fin = 0;
        |  try {
        |    try { throw 'x'; } finally { fin = 1; }
        |  } catch (e) { return e + fin; }
        |}""".stripMargin) == "x1")
    // an uncaught user throw fails loudly with the value named
    val e1 = intercept[RuntimeException](ev(
      "function f() { throw 'kaboom'; }"))
    assert(e1.getMessage.contains("kaboom"), e1.getMessage)
    // engine guards stay UNCATCHABLE: the step budget fires through try
    val e2 = intercept[IllegalStateException](ev(
      """function f() {
        |  try { while (true) { var x = 1; } } catch (e) { return 'swallowed'; }
        |}""".stripMargin))
    assert(e2.getMessage.contains("step budget"), e2.getMessage)
  }

  test("calling a non-function and returning a function fail loudly") {
    val e1 = intercept[IllegalStateException](ev(
      "function f() { var x = 3; return x(1); }"))
    assert(e1.getMessage.contains("non-function"), e1.getMessage)
    val e2 = intercept[IllegalStateException](ev(
      "function f() { return function() { return 1; }; }"))
    assert(e2.getMessage.contains("returned a function"), e2.getMessage)
  }
}
