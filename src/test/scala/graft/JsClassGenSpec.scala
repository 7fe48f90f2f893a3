package graft

import graft.functions.JsInterp

/** Round-11 tail of the JS interpreter: the constructs earlier rounds
  * rejected — ES classes, generators, per-iteration `let` capture, and
  * the deterministic Date subset (reference
  * `extensions/lang-js/JavaScriptLanguage.java:28` gets all of these
  * from GraalVM). */
class JsClassGenSpec extends SparkTestBase {

  private def ev(src: String, args: Any*): Any =
    JsInterp.compile(src).eval(args)

  // ------------------------------------------------------------------
  // per-iteration `let` capture
  // ------------------------------------------------------------------

  test("for (let i …): each closure captures its own iteration's binding") {
    val src =
      """function f(n) {
        |  var fs = [];
        |  for (let i = 0; i < n; i++) { fs.push(() => i); }
        |  return fs.map(g => g()).reduce((a, b) => a + b, 0);
        |}""".stripMargin
    // let: 0+1+2+3+4 = 10 — the ES answer
    assert(ev(src, 5L) == 10.0)
    // var: one shared binding, all closures see the final value 5 → 25
    val varSrc = src.replace("let i", "var i")
    assert(ev(varSrc, 5L) == 25.0)
  }

  test("for (let …) update runs in the NEXT iteration's environment") {
    // the closure pushed in iteration k must NOT observe the i++ that
    // starts iteration k+1 (ES CreatePerIterationEnvironment ordering)
    val src =
      """function f() {
        |  var fs = [];
        |  for (let i = 0; i < 3; i++) { fs.push(function() { return i; }) }
        |  return fs[0]() * 100 + fs[1]() * 10 + fs[2]();
        |}""".stripMargin
    assert(ev(src) == 12.0) // 0,1,2 → 012
  }

  test("for (let x of …) binds per element; var keeps one binding") {
    val src =
      """function f() {
        |  var fs = [];
        |  for (let x of [7, 8, 9]) { fs.push(() => x); }
        |  return fs.map(g => g()).join('-');
        |}""".stripMargin
    assert(ev(src) == "7-8-9")
    assert(ev(src.replace("let x", "var x")) == "9-9-9")
  }

  test("body `var` declarations hoist past per-iteration scopes") {
    // `var t` inside a let-loop body is function-scoped: the last write
    // wins for all closures (JS hoisting), while `i` stays per-iteration
    val src =
      """function f() {
        |  var fs = [];
        |  for (let i = 0; i < 3; i++) { var t = i * 10; fs.push(() => i + t); }
        |  return fs.map(g => g()).join(',');
        |}""".stripMargin
    assert(ev(src) == "20,21,22")
  }

  // ------------------------------------------------------------------
  // block scoping / const
  // ------------------------------------------------------------------

  test("inner let shadows the outer binding and dies at the block end") {
    val src =
      """function f(c) {
        |  let x = 1;
        |  if (c) { let x = 2; x = x + 10; }
        |  return x;
        |}""".stripMargin
    assert(ev(src, true) == 1.0)  // inner writes never reach the outer x
    assert(ev(src, false) == 1.0)
    // without an inner declaration, assignment reaches the outer binding
    assert(ev("function f(c) { let x = 1; if (c) { x = 2; } return x; }",
      true) == 2.0)
    // var hoists through blocks regardless
    assert(ev("function f(c) { var x = 1; if (c) { var x = 2; } return x; }",
      true) == 2.0)
  }

  test("const assignment fails loudly; const in loop headers too") {
    val ex = intercept[IllegalStateException](ev(
      "function f() { const k = 1; k = 2; return k; }"))
    assert(ex.getMessage.contains("constant"), ex.getMessage)
    val ex2 = intercept[IllegalStateException](ev(
      "function f() { for (const i = 0; i < 3; i++) { } return 1; }"))
    assert(ex2.getMessage.contains("constant"), ex2.getMessage)
    // const for-of never reassigns the binding: fine
    assert(ev(
      "function f() { var s = 0; for (const x of [1,2,3]) { s += x; } return s; }")
      == 6.0)
    // const object fields stay mutable (JS: the BINDING is constant)
    assert(ev(
      "function f() { const o = {n: 1}; o.n = 5; return o.n; }") == 5.0)
  }

  test("catch binding is scoped to the catch block") {
    val src =
      """function f() {
        |  var e = 'outer';
        |  try { throw 'boom'; } catch (e) { var seen = e; }
        |  return e + ':' + seen;
        |}""".stripMargin
    assert(ev(src) == "outer:boom")
  }

  // ------------------------------------------------------------------
  // classes
  // ------------------------------------------------------------------

  test("class with constructor, methods, and this-mutation (Welford)") {
    val src =
      """function wmean(n) {
        |  class Welford {
        |    constructor() { this.n = 0; this.mean = 0; }
        |    add(x) { this.n += 1; this.mean += (x - this.mean) / this.n; }
        |    result() { return this.mean; }
        |  }
        |  var w = new Welford();
        |  for (var i = 1; i <= n; i++) { w.add(i); }
        |  return w.result();
        |}""".stripMargin
    assert(ev(src, 9L) == 5.0) // mean of 1..9
  }

  test("static methods and method shadowing by own property") {
    val src =
      """function f() {
        |  class C {
        |    constructor(v) { this.v = v; }
        |    get2() { return this.v * 2; }
        |    static mk(v) { return new C(v); }
        |  }
        |  var c = C.mk(21);
        |  var base = c.get2();
        |  c.get2 = function() { return -1; };
        |  return base + '/' + c.get2();
        |}""".stripMargin
    assert(ev(src) == "42/-1")
  }

  test("old-style constructor functions via new") {
    val src =
      """function f(a, b) {
        |  function Point(x, y) {
        |    this.x = x; this.y = y;
        |    this.norm = function() { return Math.sqrt(this.x * this.x + this.y * this.y); };
        |  }
        |  var p = new Point(a, b);
        |  p.x += 0;
        |  return p.norm();
        |}""".stripMargin
    assert(ev(src, 3L, 4L) == 5.0)
  }

  test("instances JSON-render like plain objects") {
    val src =
      """function f() {
        |  class P { constructor(x) { this.x = x; this.tag = 'p'; } }
        |  return String(new P(7));
        |}""".stripMargin
    assert(ev(src) == """{"x":7,"tag":"p"}""")
  }

  test("member/index lvalues: this.x, obj.a +=, arr[i] on fields") {
    val src =
      """function f() {
        |  class Bag {
        |    constructor() { this.total = 0; this.items = []; }
        |    put(x) { this.total += x; this.items[this.items.length] = x; }
        |  }
        |  var b = new Bag();
        |  b.put(2); b.put(3);
        |  b.items[0] = 10;
        |  return b.total + ':' + b.items.join('+');
        |}""".stripMargin
    assert(ev(src) == "5:10+3")
  }

  test("class fields: instance and static, lexical capture, this-bound") {
    val src =
      """function f(base) {
        |  class Counter {
        |    start = base * 10;
        |    static kind = 'counter';
        |    n = this.start + 1;
        |    bump() { this.n += 1; return this.n; }
        |  }
        |  var c = new Counter();
        |  c.bump();
        |  return Counter.kind + ':' + c.start + ':' + c.n;
        |}""".stripMargin
    assert(ev(src, 4L) == "counter:40:42")
  }

  test("extends: inherited methods, super(…), super.m(…), instanceof chain") {
    val src =
      """function f(x) {
        |  class Animal {
        |    constructor(name) { this.name = name; }
        |    speak() { return this.name + ' makes a sound'; }
        |    kind() { return 'animal'; }
        |  }
        |  class Dog extends Animal {
        |    constructor(name, breed) { super(name); this.breed = breed; }
        |    speak() { return super.speak() + ' (woof)'; }
        |  }
        |  var d = new Dog(x, 'lab');
        |  return d.speak() + '|' + d.kind() + '|' + (d instanceof Animal)
        |    + '|' + (d instanceof Dog) + '|' + (new Animal('a') instanceof Dog);
        |}""".stripMargin
    assert(ev(src, "rex") == "rex makes a sound (woof)|animal|true|true|false")
  }

  test("extends without an own constructor forwards the arguments") {
    val src =
      """function f() {
        |  class A { constructor(v) { this.v = v * 2; } tag() { return 'A' + this.v; } }
        |  class B extends A { tag() { return 'B' + this.v; } }
        |  return new B(21).tag();
        |}""".stripMargin
    assert(ev(src) == "B42")
  }

  test("getters and setters, including compound assignment through both") {
    val src =
      """function f() {
        |  class Temp {
        |    constructor() { this.c = 0; }
        |    get fahrenheit() { return this.c * 9 / 5 + 32; }
        |    set fahrenheit(v) { this.c = (v - 32) * 5 / 9; }
        |  }
        |  var t = new Temp();
        |  t.fahrenheit = 212;
        |  var boiled = t.c;
        |  t.fahrenheit += 10; // read via getter, write via setter
        |  return boiled + ':' + Math.round(t.fahrenheit);
        |}""".stripMargin
    assert(ev(src) == "100:222")
  }

  test("generator methods, incl. static ones") {
    val src =
      """function f(n) {
        |  class Seq {
        |    constructor(k) { this.k = k; }
        |    *upto() { for (let i = 1; i <= this.k; i++) { yield i; } }
        |    static *evens(m) { for (let i = 0; i <= m; i += 2) { yield i; } }
        |  }
        |  var s = 0;
        |  for (var v of new Seq(n).upto()) { s += v; }
        |  return s + ':' + Array.from(Seq.evens(6)).join('');
        |}""".stripMargin
    assert(ev(src, 4L) == "10:0246")
  }

  test("the remaining class rejections stay loud and named") {
    val ex1 = intercept[UnsupportedOperationException](JsInterp.compile(
      "function f() { class A { static get x() { return 1; } } return 1; }"))
    assert(ex1.getMessage.contains("static accessors"))
    val ex2 = intercept[IllegalStateException](ev(
      "function f() { class A extends missing_parent {} return 1; }"))
    assert(ex2.getMessage.contains("undefined variable"))
  }

  // ------------------------------------------------------------------
  // generators
  // ------------------------------------------------------------------

  test("function* with yield, consumed by for...of") {
    val src =
      """function f(n) {
        |  function* evens(k) {
        |    for (let i = 0; i <= k; i += 2) { yield i; }
        |  }
        |  var s = 0;
        |  for (var v of evens(n)) { s += v; }
        |  return s;
        |}""".stripMargin
    assert(ev(src, 10L) == 30.0) // 0+2+4+6+8+10
  }

  test("generator .next() follows the {value, done} protocol") {
    val src =
      """function f() {
        |  function* g() { yield 'a'; yield 'b'; }
        |  var it = g();
        |  var r1 = it.next(); var r2 = it.next(); var r3 = it.next();
        |  return r1.value + r2.value + ':' + r1.done + ':' + r3.done;
        |}""".stripMargin
    assert(ev(src) == "ab:false:true")
  }

  test("Array.from drains a generator; generators iterate once") {
    val src =
      """function f() {
        |  function* g() { yield 1; yield 2; yield 3; }
        |  var it = g();
        |  var first = Array.from(it).length;
        |  var second = Array.from(it).length;
        |  return first * 10 + second;
        |}""".stripMargin
    assert(ev(src) == 30.0)
  }

  test("generator state machines compose with closures") {
    val src =
      """function collatzLen(n) {
        |  function* path(k) {
        |    while (k != 1) { yield k; k = k % 2 == 0 ? k / 2 : 3 * k + 1; }
        |    yield 1;
        |  }
        |  return Array.from(path(n)).length;
        |}""".stripMargin
    assert(ev(src, 6L) == 9.0) // 6 3 10 5 16 8 4 2 1
  }

  test("infinite generators fail loudly on the step budget") {
    val ex = intercept[IllegalStateException](ev(
      "function f() { function* g() { var i = 0; while (true) { yield i; i++; } } return g().next().value; }"))
    assert(ex.getMessage.contains("step budget"))
  }

  test("yield outside a generator fails loudly") {
    val ex = intercept[IllegalStateException](ev(
      "function f() { function g() { yield 1; } return g(); }"))
    assert(ex.getMessage.contains("generator"))
  }

  test("a top-level generator UDF returns its yields as an array") {
    assert(ev("function* f(n) { for (let i = 1; i <= n; i++) { yield i * i; } }",
      4L) == Seq(1.0, 4.0, 9.0, 16.0))
  }

  // ------------------------------------------------------------------
  // deterministic Date subset
  // ------------------------------------------------------------------

  test("new Date(ms) exposes UTC accessors and toISOString") {
    val src =
      """function f(ms) {
        |  var d = new Date(ms);
        |  return d.getUTCFullYear() * 10000 + (d.getUTCMonth() + 1) * 100
        |    + d.getUTCDate() + ':' + d.toISOString();
        |}""".stripMargin
    // 2024-02-29T12:30:05.250Z
    assert(ev(src, 1709209805250L) == "20240229:2024-02-29T12:30:05.250Z")
  }

  test("Date.UTC and part-wise construction normalize overflow like JS") {
    // month 12 rolls the year (JS Date.UTC(2024, 12, 1) = 2025-01-01)
    assert(ev("function f() { return new Date(Date.UTC(2024, 12, 1)).toISOString(); }")
      == "2025-01-01T00:00:00.000Z")
    // day 32 rolls the month; 2-digit years map to 1900+y
    assert(ev("function f() { return new Date(98, 0, 32).getUTCMonth(); }") == 1.0)
    assert(ev("function f() { return new Date(98, 0, 1).getUTCFullYear(); }") == 1998.0)
  }

  test("ISO string parse; date arithmetic through getTime") {
    val src =
      """function daysBetween(a, b) {
        |  return Math.round((new Date(b).getTime() - new Date(a).getTime()) / 86400000);
        |}""".stripMargin
    assert(ev(src, "2024-01-01", "2024-03-01") == 60.0)
  }

  test("timestamp column inputs arrive as Date values") {
    val src = "function f(ts) { return new Date(ts.getTime()).getUTCFullYear(); }"
    assert(ev(src, java.sql.Timestamp.valueOf("2023-06-15 10:00:00")) == 2023.0)
  }

  test("non-deterministic Date forms stay rejected with the fix named") {
    val ex1 = intercept[IllegalStateException](ev("function f() { return new Date().getTime(); }"))
    assert(ex1.getMessage.contains("non-deterministic"))
    val ex2 = intercept[UnsupportedOperationException](JsInterp.compile(
      "function f() { return Date.now(); }"))
    assert(ex2.getMessage.contains("Date.now"))
    val ex3 = intercept[IllegalStateException](ev(
      "function f() { return new Date(0).getFullYear(); }"))
    assert(ex3.getMessage.contains("getUTCFullYear"))
  }

  // ------------------------------------------------------------------
  // end-to-end through CREATE FUNCTION
  // ------------------------------------------------------------------

  test("a class+generator+let-capture body runs through the router") {
    val root = graft.ArtifactStore.scratchDir("jsclass").toFile.getAbsolutePath
    val r = new graft.StatementRouter(spark, root)
    r.execute(
      """CREATE OR REPLACE FUNCTION js_stats(bigint) RETURNS text
        |LANGUAGE JAVASCRIPT AS 'function js_stats(n) {
        |  class Acc {
        |    constructor() { this.sum = 0; this.cnt = 0; }
        |    add(x) { this.sum += x; this.cnt++; }
        |  }
        |  function* upto(k) { for (let i = 1; i <= k; i++) { yield i; } }
        |  var a = new Acc();
        |  for (var v of upto(n)) { a.add(v); }
        |  return `${a.cnt}:${a.sum}`;
        |}'""".stripMargin)
    val out = spark.sql("SELECT js_stats(10) AS s").collect()(0).getString(0)
    assert(out == "10:55")
  }
}
