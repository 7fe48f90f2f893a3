package graft

import graft.functions.JsInterp

/** ES-completeness wave 2 for the JS interpreter: switch, do…while,
  * for…in, typeof/instanceof/in, nullish coalescing and optional
  * chaining, object-literal shorthand/computed keys/method shorthand,
  * spread in array literals and calls, declaration destructuring,
  * default and rest parameters, and the Object.* statics. */
class JsEs2Spec extends SparkTestBase {

  private def ev(src: String, args: Any*): Any =
    JsInterp.compile(src).eval(args)

  test("switch: match, fallthrough, default, break") {
    val src =
      """function f(n) {
        |  var out = '';
        |  switch (n) {
        |    case 1: out += 'one '; // falls through
        |    case 2: out += 'two'; break;
        |    case 3: out += 'three'; break;
        |    default: out += 'many';
        |  }
        |  return out;
        |}""".stripMargin
    assert(ev(src, 1L) == "one two")
    assert(ev(src, 2L) == "two")
    assert(ev(src, 3L) == "three")
    assert(ev(src, 9L) == "many")
  }

  test("switch uses strict equality and one block scope") {
    // '1' does not match case 1 (===); let declared in one case is
    // visible to later cases (one block), shadowing the outer binding
    assert(ev(
      """function f(s) {
        |  switch (s) { case 1: return 'num'; case '1': return 'str'; }
        |  return 'none';
        |}""".stripMargin, "1") == "str")
    assert(ev(
      """function f() {
        |  let t = 'outer';
        |  switch (1) { case 1: let t = 'inner'; break; }
        |  return t;
        |}""".stripMargin) == "outer") // switch-scoped let dies with the switch
  }

  test("do…while runs at least once; break/continue work") {
    assert(ev(
      "function f(n) { var c = 0; do { c++; } while (c < n); return c; }",
      0L) == 1.0)
    assert(ev(
      """function f() {
        |  var s = 0, i = 0;
        |  do { i++; if (i % 2 == 0) { continue; } if (i > 7) { break; }
        |       s += i; } while (true);
        |  return s;
        |}""".stripMargin) == 16.0) // 1+3+5+7
  }

  test("for…in iterates object keys (insertion order) and array indices") {
    assert(ev(
      """function f() {
        |  var o = {b: 1, a: 2, c: 3};
        |  var ks = '';
        |  for (var k in o) { ks += k; }
        |  return ks;
        |}""".stripMargin) == "bac")
    assert(ev(
      """function f() {
        |  var total = 0;
        |  var a = [10, 20, 30];
        |  for (const i in a) { total += i * a[i]; }
        |  return total;
        |}""".stripMargin) == 80.0) // 0*10 + 1*20 + 2*30
  }

  test("typeof, including the undeclared-name guard") {
    val src =
      """function f(x) {
        |  return typeof x + '/' + typeof 'a' + '/' + typeof true
        |    + '/' + typeof undeclared_name + '/' + typeof f;
        |}""".stripMargin
    assert(ev(src, 1L) == "number/string/boolean/undefined/function")
    assert(ev("function f() { return typeof {a: 1}; }") == "object")
    assert(ev("function f() { return typeof null; }") == "object")
  }

  test("instanceof: user classes, Array, Date") {
    val src =
      """function f() {
        |  class A { constructor() { this.x = 1; } }
        |  class B { constructor() { this.x = 2; } }
        |  var a = new A();
        |  return (a instanceof A) + ':' + (a instanceof B)
        |    + ':' + ([1] instanceof Array) + ':' + (new Date(0) instanceof Date);
        |}""".stripMargin
    assert(ev(src) == "true:false:true:true")
  }

  test("`in` operator: object keys and array indices") {
    assert(ev(
      """function f() {
        |  var o = {a: 1};
        |  var arr = [7, 8];
        |  return ('a' in o) + ':' + ('b' in o) + ':' + (1 in arr)
        |    + ':' + (5 in arr);
        |}""".stripMargin) == "true:false:true:false")
  }

  test("nullish coalescing ?? keeps falsy-but-present values") {
    val src = "function f(x) { return x ?? 'dflt'; }"
    assert(ev(src, null) == "dflt")
    assert(ev(src, 0L) == 0.0)       // || would lose this
    assert(ev(src, "") == "")
    // ternary with a leading fraction still parses (?. lookahead guard)
    assert(ev("function f(c) { return c ? .5 : 1; }", true) == 0.5)
  }

  test("optional chaining ?. on members and method calls") {
    val src =
      """function f(o) {
        |  return (o?.name ?? 'anon') + ':' + (o?.tag?.toUpperCase() ?? '-');
        |}""".stripMargin
    assert(ev(src, null) == "anon:-")
    // an object input arrives as a map: build one in-body instead
    assert(ev(
      """function f() {
        |  var o = {name: 'x'};
        |  return (o?.name ?? 'anon') + ':' + (o?.tag?.length ?? '-');
        |}""".stripMargin) == "x:-")
  }

  test("object literals: shorthand, computed keys, method shorthand, numbers") {
    assert(ev(
      """function f(a) {
        |  var b = 'bee';
        |  var k = 'dyn';
        |  var o = {a, b, [k + '1']: 9, 2: 'two',
        |           twice(x) { return x * 2 + this.a; }};
        |  return o.a + '|' + o.b + '|' + o.dyn1 + '|' + o['2']
        |    + '|' + o.twice(10);
        |}""".stripMargin, 5L) == "5|bee|9|two|25")
  }

  test("spread: array literals, call arguments, Math.max") {
    assert(ev(
      """function f() {
        |  var a = [2, 3];
        |  var b = [1, ...a, 4];
        |  function add3(x, y, z) { return x * 100 + y * 10 + z; }
        |  return b.join('') + ':' + add3(...a, 9) + ':' + Math.max(...b);
        |}""".stripMargin) == "1234:239:4")
    // spreading a generator and a string
    assert(ev(
      """function f() {
        |  function* g() { yield 7; yield 8; }
        |  return [...g(), ...'ab'].join('-');
        |}""".stripMargin) == "7-8-a-b")
  }

  test("destructuring declarations: arrays, objects, renames, const") {
    assert(ev(
      """function f() {
        |  var [a, b, c] = [1, 2];
        |  const {x, y: z} = {x: 'ex', y: 'why'};
        |  return a + ':' + b + ':' + (c ?? 'none') + ':' + x + ':' + z;
        |}""".stripMargin) == "1:2:none:ex:why")
    val ex = intercept[IllegalStateException](ev(
      "function f() { const [a] = [1]; a = 2; return a; }"))
    assert(ex.getMessage.contains("constant"))
  }

  test("default and rest parameters on nested functions") {
    assert(ev(
      """function f() {
        |  function greet(name, greeting = 'hi', ...rest) {
        |    return greeting + ' ' + name + ' +' + rest.length;
        |  }
        |  return greet('a') + '/' + greet('b', 'yo') + '/' + greet('c', 'oi', 1, 2, 3);
        |}""".stripMargin) == "hi a +0/yo b +0/oi c +3")
    // defaults are expressions evaluated against earlier params
    assert(ev(
      """function f() {
        |  function area(w, h = w * 2) { return w * h; }
        |  return area(3) + ':' + area(3, 4);
        |}""".stripMargin) == "18:12")
    // top-level params stay fixed-arity (the SQL signature rules)
    val ex = intercept[UnsupportedOperationException](JsInterp.compile(
      "function f(a, b = 1) { return a + b; }"))
    assert(ex.getMessage.contains("CREATE FUNCTION"))
  }

  test("Object.keys/values/entries/assign/fromEntries") {
    assert(ev(
      """function f() {
        |  var o = {a: 1, b: 2};
        |  var flipped = Object.fromEntries(Object.entries(o).map(p => [p[1], p[0]]));
        |  var merged = Object.assign({}, o, {c: 3});
        |  return Object.keys(o).join('') + ':' + Object.values(o).join('')
        |    + ':' + flipped['1'] + ':' + Object.keys(merged).join('');
        |}""".stripMargin) == "ab:12:a:abc")
  }

  test("top-level UDFs can recurse on their own name directly") {
    // no nested-helper wrapper needed (the function name is in scope)
    assert(ev(
      "function fact(n) { return n < 2 ? 1 : n * fact(n - 1); }", 6L) == 720.0)
    // a same-named parameter shadows the self-binding, like JS
    assert(ev("function f(f) { return f + 1; }", 4L) == 5.0)
  }

  test("async/await fails loudly with the construct named") {
    val e1 = intercept[UnsupportedOperationException](JsInterp.compile(
      "function f() { async function g() { return 1; } return 1; }"))
    assert(e1.getMessage.contains("async"))
    val e2 = intercept[UnsupportedOperationException](JsInterp.compile(
      "function f(p) { return await p; }"))
    assert(e2.getMessage.contains("async/await"))
  }

  test("TDZ: reading a let before its declaration throws (unshadowed)") {
    val e = intercept[IllegalStateException](ev(
      "function f() { var y = x + 1; let x = 2; return y; }"))
    assert(e.getMessage.contains("before initialization"))
    assert(e.getMessage.contains("'x'"))
  }

  test("TDZ: a shadowing let does NOT resolve to the outer binding") {
    // GraalVM/ES: ReferenceError. Pre-r12 this silently returned 1
    // (the outer x) — the divergence VERDICT r11 flagged.
    val e = intercept[IllegalStateException](ev(
      """function f() {
        |  let x = 1;
        |  { var y = x; let x = 2; return y; }
        |}""".stripMargin))
    assert(e.getMessage.contains("before initialization"))
  }

  test("TDZ: write, compound assignment, and typeof all throw") {
    val e1 = intercept[IllegalStateException](ev(
      "function f() { x = 5; let x; return x; }"))
    assert(e1.getMessage.contains("before initialization"))
    val e2 = intercept[IllegalStateException](ev(
      "function f() { var a = 0; { a += 1; x += 1; let x = 0; } return a; }"))
    assert(e2.getMessage.contains("before initialization"))
    // typeof on a TDZ name throws (ES), while typeof on an UNDECLARED
    // name still answers 'undefined'
    val e3 = intercept[IllegalStateException](ev(
      "function f() { var t = typeof x; let x = 1; return t; }"))
    assert(e3.getMessage.contains("before initialization"))
    assert(ev("function f() { return typeof nope; }") == "undefined")
  }

  test("TDZ: let x = x self-reference throws; class names are TDZ'd") {
    val e1 = intercept[IllegalStateException](ev(
      "function f() { let x = x + 1; return x; }"))
    assert(e1.getMessage.contains("before initialization"))
    val e2 = intercept[IllegalStateException](ev(
      "function f() { var o = new C(); class C {} return 1; }"))
    assert(e2.getMessage.contains("before initialization"))
  }

  test("TDZ: normal post-declaration reads and loop headers unaffected") {
    assert(ev(
      """function f(n) {
        |  let s = 0;
        |  for (let i = 0; i < n; i++) { s += i; }
        |  { let s2 = s * 2; s = s2; }
        |  return s;
        |}""".stripMargin, 5L) == 20.0)
    // switch: a case's let read AFTER declaration from a later case is fine
    assert(ev(
      """function f() {
        |  switch (1) { case 1: let t = 7; case 2: return t + 1; }
        |}""".stripMargin) == 8.0)
    // catch-block let
    assert(ev(
      """function f() {
        |  try { throw 1; } catch (e) { let m = e + 1; return m; }
        |}""".stripMargin) == 2.0)
  }

  test("TDZ surfaces through CREATE FUNCTION with the name in the error") {
    val root = graft.ArtifactStore.scratchDir("jstdz")
      .toFile.getAbsolutePath
    val r = new graft.StatementRouter(spark, root)
    r.execute(
      """CREATE OR REPLACE FUNCTION js_tdz(bigint) RETURNS bigint
        |LANGUAGE JAVASCRIPT AS 'function js_tdz(n) {
        |  let a = 1;
        |  { var b = a + n; let a = 2; }
        |  return b;
        |}'""".stripMargin)
    val e = intercept[Exception](
      spark.sql("SELECT js_tdz(1) AS v").collect())
    assert(e.getMessage.contains("before initialization") ||
      Option(e.getCause).exists(_.getMessage.contains("before initialization")))
  }

  test("a switch+destructuring+spread body runs through CREATE FUNCTION") {
    val root = graft.ArtifactStore.scratchDir("jses2")
      .toFile.getAbsolutePath
    val r = new graft.StatementRouter(spark, root)
    r.execute(
      """CREATE OR REPLACE FUNCTION js_grade(bigint) RETURNS text
        |LANGUAGE JAVASCRIPT AS 'function js_grade(n) {
        |  const [lo, hi] = [60, 90];
        |  switch (true) {
        |    case n >= hi: return `A:${n}`;
        |    case n >= lo: return `B:${n}`;
        |    default: return `C:${n}`;
        |  }
        |}'""".stripMargin)
    val out = spark.sql(
      "SELECT js_grade(95) || '/' || js_grade(70) || '/' || js_grade(10) AS g")
      .collect()(0).getString(0)
    assert(out == "A:95/B:70/C:10")
  }
}
