package graft.functions

/** Step-bounded JavaScript interpreter — the FALLBACK executor for
  * `CREATE FUNCTION … LANGUAGE JAVASCRIPT` bodies outside
  * [[JsUdf]]'s codegen-translatable subset (reference
  * `extensions/lang-js/JavaScriptLanguage.java:28` runs arbitrary JS on
  * GraalVM; graft interprets a practical subset instead of shipping an
  * engine). The router tries [[JsUdf.translate]] FIRST — translatable
  * bodies stay codegen'd SQL expressions — and reaches for this
  * interpreter only when translation throws, so the row path pays
  * interpretation only for bodies that genuinely need control flow.
  *
  * Supported beyond the translator: `while` loops, `for` loops with
  * arbitrary (data-dependent) bounds, `break`/`continue`, reassignment in
  * any statement position, array mutation via `.push`, JS-faithful
  * `.replace` (first occurrence — the translator rejects it because SQL
  * `replace` hits all), and FULL function values: nested `function`
  * declarations, function expressions (named ones can self-recurse),
  * arrow functions, closures over the lexical scope chain, recursion and
  * mutual recursion (depth-capped at [[MaxCallDepth]] so a runaway
  * recursion fails loudly instead of blowing the JVM stack), IIFEs, and
  * the array higher-order methods
  * map/filter/reduce/forEach/some/every/find/findIndex with closure
  * callbacks. Template literals desugar at lex time to string
  * concatenation. Regex literals compile to java.util.regex (once per
  * AST node) with g/i/m/s/u flags, usable via `re.test(s)` and the
  * string methods match/replace/replaceAll/split/search — `$&` maps
  * to java's `$0`; JS's stateful `lastIndex` under /g is deliberately
  * NOT modeled (`.test` is stateless here). Numbers are doubles (JS
  * semantics); `+` string-concatenates when either side is a string;
  * truthiness follows JS (false/0/''/null → false).
  *
  * Round-11 tail — the constructs earlier rounds rejected, now modeled:
  *
  *  - **ES classes**: `class Name [extends Parent] { … }` with
  *    constructors, methods, generator methods, statics, instance and
  *    static fields (`x = e`, initializers closed over the declaration
  *    scope with `this` bound), `get`/`set` accessors (compound
  *    assignment reads through the getter and writes through the
  *    setter), single inheritance with `super(…)`/`super.m(…)` (method
  *    lookup walks the extends chain and records the owning class, so
  *    super resolves from the right level), chain-aware `instanceof`,
  *    `new Name(…)`, `this`-bound dispatch, property assignment through
  *    any member/index lvalue, and old-style constructor functions.
  *    One documented ordering simplification: ALL field initializers
  *    run parent-first before the constructor bodies (exact whenever
  *    constructors follow the ES-legal pattern of not touching `this`
  *    before `super()`).
  *  - **Generators**: `function*` declarations/expressions with `yield`,
  *    consumed by `for…of`, `Array.from`, or `.next()` (JS's
  *    `{value, done}` protocol). Generators run EAGERLY at call time
  *    under the step budget — exact for every terminating generator;
  *    an infinite generator fails loudly on the budget even when the
  *    consumer would have stopped early (documented cut).
  *  - **Per-iteration `let` capture**: `for (let i …)` creates a fresh
  *    binding per iteration exactly like ES (closures made in iteration
  *    k keep seeing k; the update expression runs in the NEXT
  *    iteration's copy), and `for (let x of …)` binds per element.
  *    `var` keeps its one shared function-scoped binding — both JS
  *    behaviors are now modeled, not just the `var` one.
  *  - **Block scoping**: a block that declares `let`/`const` at its top
  *    level gets its own scope — inner `let x` SHADOWS an outer `x`
  *    and dies at the block's end; `var` hoists through to the function
  *    scope; the `catch (e)` binding is scoped to the catch block; and
  *    assignment to a `const` fails loudly ("assignment to constant
  *    variable"). The temporal dead zone IS modeled (round 12): a
  *    block's top-level `let`/`const`/`class` names are pre-bound to a
  *    TDZ sentinel at scope entry, and any read, write, `typeof`, or
  *    compound assignment that reaches the sentinel before the
  *    declaration executes throws "cannot access 'x' before
  *    initialization" — ES's ReferenceError, never the enclosing
  *    binding.
  *  - **Deterministic Date subset**: `new Date(ms)`, `new Date(y,m,d,…)`
  *    (UTC-pinned — see [[JsDate]]), `Date.UTC(…)`, ISO-string parse,
  *    `getTime`/`getUTC*`/`toISOString`. Timestamp/date COLUMN inputs
  *    arrive as Date values.
  *
  * ES wave 2 (same round): `switch` (strict-equality dispatch,
  * fallthrough, one block scope per ES), `do…while`, `for…in` (object
  * keys in insertion order; array/string indices), `typeof` (incl. the
  * undeclared-name guard), `instanceof` (user classes + Array/Date/
  * Object/Function), the `in` operator, nullish coalescing `??` and
  * optional chaining `?.` (with JS's not-before-a-digit lexer guard so
  * `c ? .5 : 1` stays a ternary), object-literal shorthand `{a, b}`,
  * computed keys `[k]: v`, method shorthand `m() {…}` and numeric keys,
  * spread in array literals and every call-argument position,
  * destructuring declarations (`let [a, b] = …`, `const {x, y: z} = …`),
  * default + rest parameters on nested functions (top-level UDF
  * parameters stay fixed-arity — the CREATE FUNCTION signature rules),
  * `Object.keys/values/entries/assign/fromEntries`, and direct
  * self-recursion of the top-level function name.
  *
  * Every statement step and every loop-back-edge counts against a hard
  * step budget (default 100 000); exceeding it throws — a runaway
  * `while (true)` fails loudly instead of hanging an executor core.
  * The only remaining rejections are the NON-DETERMINISM guards —
  * `Math.random()`, `Date.now()`, argless `new Date()`, local-timezone
  * Date accessors — because a retried Spark task must reproduce its rows
  * bit-for-bit (the engine-level invariant; the reference leaves this to
  * the user and inherits the irreproducibility) — plus async/await
  * (UDFs are synchronous) and static accessors, each named in the
  * error. The let/const temporal dead zone now THROWS on
  * pre-declaration access (it is enforced, not rejected — see the
  * block-scoping bullet above); the remaining deliberate divergences
  * from GraalVM all fail loudly.
  */
object JsInterp {

  final case class Compiled(name: String, params: Seq[String], body: Vector[St],
                            isGen: Boolean = false) {
    def eval(args: Seq[Any]): Any = JsInterp.run(this, args)
  }

  // ---------- tokens ----------

  private sealed trait T
  private case class Num(v: Double) extends T
  private case class Str(s: String) extends T
  private case class Id(s: String) extends T
  private case class Op(s: String) extends T
  private case class Re(pattern: String, flags: String) extends T

  /** May a regex literal start here? JS's own heuristic: yes at
    * expression positions (start, after an operator or '('), no where
    * '/' must be division (after a value: identifier, literal, ')',
    * ']'). Keywords that END a statement position still allow one. */
  private val regexKeywords = Set("return", "typeof", "case", "of", "in",
    "do", "else", "void", "delete", "instanceof", "new", "throw")
  private def regexAllowed(last: Option[T]): Boolean = last match {
    case None                       => true
    case Some(Op(")")) | Some(Op("]")) => false
    case Some(Op(_))                => true
    case Some(Id(kw))               => regexKeywords(kw)
    case _                          => false // Num / Str / Re
  }

  private def lex(src: String): Vector[T] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[T]
    var i = 0
    val n = src.length
    val ops3 = Seq("===", "!==", "...")
    val ops2 = Seq("==", "!=", "<=", ">=", "&&", "||", "**", "+=", "-=",
      "*=", "/=", "%=", "++", "--", "=>", "??")
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
        i += 2
      } else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val j = i
        while (i < n && (src.charAt(i).isDigit || src.charAt(i) == '.' ||
          src.charAt(i) == 'e' || src.charAt(i) == 'E' ||
          ((src.charAt(i) == '+' || src.charAt(i) == '-') && i > j &&
            (src.charAt(i - 1) == 'e' || src.charAt(i - 1) == 'E')))) i += 1
        out += Num(src.substring(j, i).toDouble)
      } else if (c == '\'' || c == '"') {
        val q = c; val sb = new StringBuilder; i += 1
        while (i < n && src.charAt(i) != q) {
          if (src.charAt(i) == '\\' && i + 1 < n) {
            sb.append(src.charAt(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
            i += 2
          } else { sb.append(src.charAt(i)); i += 1 }
        }
        require(i < n, "unterminated string in JS body")
        i += 1
        out += Str(sb.toString)
      } else if (c == '`') {
        // template literal: desugars AT LEX TIME to a parenthesized
        // string concatenation — `a${x}b` → ( "a" + ( x ) + "b" ) —
        // which plus() string-coerces exactly like JS ToString. The
        // leading "" forces string semantics when the template is a
        // bare `${n}`. Interpolation bodies are lexed recursively;
        // nested template literals inside ${} are rejected loudly.
        i += 1
        out += Op("("); out += Str(""); out += Op("+")
        val sb = new StringBuilder
        def flushPart(): Unit = { out += Str(sb.toString); sb.clear() }
        var closed = false
        while (!closed) {
          require(i < n, "unterminated template literal in JS body")
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            sb.append(src.charAt(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
            i += 2
          } else if (ch == '`') { flushPart(); closed = true; i += 1 }
          else if (ch == '$' && i + 1 < n && src.charAt(i + 1) == '{') {
            flushPart(); out += Op("+")
            i += 2
            val start = i
            var depth = 1
            while (i < n && depth > 0) {
              src.charAt(i) match {
                case '{' => depth += 1
                case '}' => depth -= 1
                case '`' => throw new UnsupportedOperationException(
                  "JS parse: nested template literal inside ${} is not " +
                    "supported — assign it to a variable first")
                case _   => ()
              }
              i += 1
            }
            require(depth == 0, "unterminated ${} in template literal")
            out += Op("(")
            lex(src.substring(start, i - 1)).foreach(out += _)
            out += Op(")"); out += Op("+")
          } else { sb.append(ch); i += 1 }
        }
        out += Op(")")
      } else if (c == '/' && regexAllowed(out.lastOption)) {
        // regex literal: scan to the unescaped closing '/', honoring
        // character classes (an unescaped '/' inside [...] is literal)
        var k = i + 1
        var inClass = false
        var found = false
        while (k < n && !found) {
          src.charAt(k) match {
            case '\\'               => k += 2
            case '['                => inClass = true; k += 1
            case ']'                => inClass = false; k += 1
            case '/' if !inClass    => found = true
            case '\n'               => k = n // regex cannot span lines
            case _                  => k += 1
          }
        }
        require(found, "unterminated regex literal in JS body")
        val pat = src.substring(i + 1, k)
        k += 1
        val fj = k
        while (k < n && src.charAt(k).isLetter) k += 1
        out += Re(pat, src.substring(fj, k))
        i = k
      } else if (c.isLetter || c == '_' || c == '$') {
        val j = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_' ||
          src.charAt(i) == '$')) i += 1
        out += Id(src.substring(j, i))
      } else if (c == '?' && i + 1 < n && src.charAt(i + 1) == '.' &&
          !(i + 2 < n && src.charAt(i + 2).isDigit)) {
        // optional chaining — JS's own lookahead: `?.` unless followed by
        // a digit (so `c ? .5 : 1` still lexes as a ternary)
        out += Op("?."); i += 2
      } else {
        val rem = src.substring(i)
        ops3.find(rem.startsWith) match {
          case Some(o) => out += Op(o); i += 3
          case None => ops2.find(rem.startsWith) match {
            case Some(o) => out += Op(o); i += 2
            case None    => out += Op(c.toString); i += 1
          }
        }
      }
    }
    out.toVector
  }

  // ---------- AST ----------

  sealed trait Ex
  private case class LNum(v: Double) extends Ex
  private case class LStr(s: String) extends Ex
  private case class LBool(b: Boolean) extends Ex
  private case object LNull extends Ex
  private case class Ref(name: String) extends Ex
  private case class Un(op: String, e: Ex) extends Ex
  private case class Bin(op: String, l: Ex, r: Ex) extends Ex
  private case class Tern(c: Ex, t: Ex, f: Ex) extends Ex
  /** array literal; `spread` flags `...e` elements (flattened at eval). */
  private case class ArrL(items: List[(Ex, Boolean)]) extends Ex
  /** object literal; keys are expressions (LStr for static keys,
    * arbitrary for `[computed]: v`). */
  private case class ObjL(fields: List[(Ex, Ex)]) extends Ex
  private case class IndexE(target: Ex, idx: Ex) extends Ex
  /** `opt` = `?.` — a null target yields null instead of an error. */
  private case class Member(target: Ex, name: String,
                            opt: Boolean = false) extends Ex
  private case class MethodCall(target: Ex, name: String,
                                args: List[(Ex, Boolean)],
                                opt: Boolean = false) extends Ex
  private case class MathCall(name: String, args: List[(Ex, Boolean)]) extends Ex
  private case class GlobalCall(name: String, args: List[(Ex, Boolean)]) extends Ex
  /** regex literal — compiled once per AST node (loops don't pay a
    * recompile per iteration). */
  private case class LRe(pattern: String, flags: String) extends Ex {
    lazy val compiled: JsRegexVal = JsRegexVal.compile(pattern, flags)
  }
  /** a declared parameter: optional default expression (applied when
    * the argument is missing or null) and rest marker (`...args`
    * collects the remaining arguments into an array). */
  private case class P1(name: String, default: Option[Ex] = None,
                        rest: Boolean = false)
  /** function expression / arrow function; a name makes the closure
    * self-referable (named function expressions can recurse). `isGen`
    * marks a `function*` generator expression. */
  private case class FuncLit(name: Option[String], params: Seq[P1],
                             body: Vector[St],
                             isGen: Boolean = false) extends Ex
  /** call of an arbitrary callee — user-defined functions, closures
    * returned from other functions, IIFEs. Args carry a spread flag. */
  private case class CallE(target: Ex, args: List[(Ex, Boolean)]) extends Ex
  /** `new Name(args)` — a user class, a constructor function, or the
    * deterministic `Date` subset. */
  private case class NewE(name: String, args: List[(Ex, Boolean)]) extends Ex
  /** `yield [expr]` — only legal dynamically inside a generator frame. */
  private case class YieldEx(e: Option[Ex]) extends Ex

  sealed trait St
  private case class VarDecl(vars: List[(String, Option[Ex])],
                             kind: String = "var") extends St
  /** nested `function name(…) {…}` declaration — binds a closure.
    * `isGen` marks a `function*` generator declaration. */
  private case class FuncDecl(name: String, params: Seq[P1],
                              body: Vector[St],
                              isGen: Boolean = false) extends St
  /** `class Name [extends Parent] { x = e; static y = e;
    * constructor(…){…} m(…){…} *g(…){…} static s(…){…}
    * get p(){…} set p(v){…} }` — binds a [[JsClass]] value.
    * Method tuples are (name, params, body, isGenerator). */
  private case class ClassDecl(name: String,
      parent: Option[String],
      ctor: Option[(Seq[P1], Vector[St])],
      fields: List[(String, Ex)],
      staticFields: List[(String, Ex)],
      methods: List[(String, Seq[P1], Vector[St], Boolean)],
      statics: List[(String, Seq[P1], Vector[St], Boolean)],
      getters: List[(String, Vector[St])],
      setters: List[(String, String, Vector[St])]) extends St
  /** `super(args)` — the nearest ancestor constructor, bound to `this`. */
  private case class SuperCallE(args: List[(Ex, Boolean)]) extends Ex
  /** `super.m(args)` — method lookup starting ABOVE the class that owns
    * the currently-executing method. */
  private case class SuperMethodE(name: String,
                                  args: List[(Ex, Boolean)]) extends Ex
  /** destructuring declaration — `let [a, b] = arr` / `const {x, y: z}
    * = obj`. */
  private case class DestrDecl(kind: String, pat: Pat, init: Ex) extends St
  private sealed trait Pat
  private case class PArr(names: List[String]) extends Pat
  /** (source key, bound name) — `{x}` binds x, `{x: y}` binds y. */
  private case class PObj(fields: List[(String, String)]) extends Pat
  /** `switch (subject) { case e: … default: … }` — cases in source
    * order, `None` test = default; execution falls through from the
    * matching case. */
  private case class SwitchS(subject: Ex,
      cases: List[(Option[Ex], Vector[St])]) extends St
  private case class DoWhileS(body: Vector[St], cond: Ex) extends St
  /** `for (k in obj)` — object keys in insertion order; array/string
    * indices as numbers. */
  private case class ForInS(v: String, iter: Ex, body: Vector[St],
                            perIter: Boolean = false,
                            constVar: Boolean = false) extends St
  private case class Assign(name: String, op: String, e: Ex) extends St
  /** assignment through a member/index lvalue — `this.x = e`,
    * `obj.a += e`, `arr[i] = e`, `m['k'] = e`. */
  private case class LvalAssign(lhs: Ex, op: String, rhs: Ex) extends St
  private case class IncDec(name: String, op: String) extends St
  private case class IfS(c: Ex, t: Vector[St], e: Vector[St]) extends St
  private case class WhileS(c: Ex, body: Vector[St]) extends St
  /** `letVars` non-empty = the init declared `let`/`const` vars that get
    * a FRESH binding per iteration (ES CreatePerIterationEnvironment):
    * closures created in iteration k capture iteration k's binding.
    * `letConst` = the declaration was `const` (the update throws). */
  private case class ForS(init: Option[St], cond: Option[Ex],
                          update: Option[St], body: Vector[St],
                          letVars: List[String] = Nil,
                          letConst: Boolean = false) extends St
  /** `perIter` = the loop variable was declared `let`/`const`, so each
    * element binds a fresh per-iteration variable. */
  private case class ForOfS(v: String, iter: Ex, body: Vector[St],
                            perIter: Boolean = false,
                            constVar: Boolean = false) extends St
  private case class ReturnS(e: Option[Ex]) extends St
  /** `throw expr` — raises a user value caught by the nearest TryS. */
  private case class ThrowS(e: Ex) extends St
  /** `try {…} catch (e) {…} [finally {…}]` — catches ONLY user throws
    * (engine guards — step budget, depth cap, type errors — stay
    * uncatchable by design: a UDF must not swallow its own runaway
    * protection). */
  private case class TryS(body: Vector[St], param: Option[String],
                          catchBody: Vector[St],
                          finallyBody: Vector[St]) extends St
  private case object BreakS extends St
  private case object ContinueS extends St
  private case class ExprS(e: Ex) extends St

  // ---------- parser (recursive descent) ----------

  private class P(ts: Vector[T]) {
    var i = 0
    def peek: Option[T] = ts.lift(i)
    def la(k: Int): Option[T] = ts.lift(i + k)
    def eatOp(s: String): Unit = peek match {
      case Some(Op(o)) if o == s => i += 1
      case other => fail(s"expected '$s', found $other")
    }
    def isOp(s: String): Boolean = peek.contains(Op(s))
    def eatId(): String = peek match {
      case Some(Id(s)) => i += 1; s
      case other       => fail(s"expected identifier, found $other")
    }
    def fail(msg: String): Nothing =
      throw new UnsupportedOperationException(s"JS parse: $msg")

    def parseFunction(): Compiled = {
      // accepted top-level forms (reference lang-js accepts both — its
      // testValidateCatchesAssertionError pins `var f = (a) => a * a;`
      // as VALID on modern runtimes):
      //   function name(a, b) { … }            (declaration)
      //   var|let|const name = (a, b) => …     (arrow binding)
      //   var|let|const name = function (…) {} (function-expression binding)
      val (name, params, body, isGen) = peek match {
        case Some(Id("function")) =>
          i += 1
          val g = isOp("*")
          if (g) i += 1
          val n = eatId()
          (n, parseParams(), parseBlock(), g)
        case Some(Id("var" | "let" | "const")) =>
          i += 1
          val n = eatId()
          eatOp("=")
          peek match {
            case Some(Id("function")) =>
              i += 1
              val g = isOp("*")
              if (g) i += 1
              // optional inner name of the function expression (ignored:
              // the binding name is the UDF name)
              if (!isOp("(")) eatId()
              (n, parseParams(), parseBlock(), g)
            case Some(Op("(")) =>
              val ps = parseParams()
              eatOp("=>")
              (n, ps, arrowBody(), false)
            case Some(Id(_)) =>
              val p = eatId()
              eatOp("=>")
              (n, Seq(P1(p)), arrowBody(), false)
            case other => fail(
              s"expected a function expression or arrow after '=', found $other")
          }
        case _ => fail("body must start with `function` or " +
          "`var name = (…) => …`")
      }
      if (isOp(";")) i += 1
      if (params.exists(p => p.rest || p.default.isDefined))
        fail("top-level UDF parameters are fixed by the CREATE FUNCTION " +
          "signature — defaults/rest belong on nested functions")
      require(i == ts.length,
        "JS parse: trailing tokens after the function body")
      Compiled(name, params.map(_.name), body, isGen)
    }

    def parseParams(): Seq[P1] = {
      eatOp("(")
      val params = scala.collection.mutable.ArrayBuffer.empty[P1]
      while (!isOp(")")) {
        val rest = isOp("...")
        if (rest) i += 1
        val n = eatId()
        val default = if (isOp("=")) { i += 1; Some(parseExpr()) } else None
        if (rest && default.isDefined)
          fail("a rest parameter cannot have a default")
        params += P1(n, default, rest)
        if (isOp(",")) i += 1
      }
      eatOp(")")
      if (params.dropRight(1).exists(_.rest))
        fail("the rest parameter must be last")
      params.toSeq
    }

    /** call-site argument list with spread flags: `f(a, ...rest, b)`. */
    def parseArgs(): List[(Ex, Boolean)] = {
      val args = scala.collection.mutable.ListBuffer.empty[(Ex, Boolean)]
      while (!isOp(")")) {
        val spread = isOp("...")
        if (spread) i += 1
        args += ((parseExpr(), spread))
        if (isOp(",")) i += 1
      }
      eatOp(")")
      args.toList
    }

    def parseBlock(): Vector[St] = {
      eatOp("{")
      val out = Vector.newBuilder[St]
      while (!isOp("}")) out += parseStatement()
      eatOp("}")
      out.result()
    }

    def blockOrSingle(): Vector[St] =
      if (isOp("{")) parseBlock() else Vector(parseStatement())

    /** `[a, b]` or `{x, y: z}` after var/let/const. */
    def parsePattern(): Pat = peek match {
      case Some(Op("[")) =>
        i += 1
        val names = scala.collection.mutable.ListBuffer.empty[String]
        while (!isOp("]")) { names += eatId(); if (isOp(",")) i += 1 }
        eatOp("]")
        PArr(names.toList)
      case Some(Op("{")) =>
        i += 1
        val fields = scala.collection.mutable.ListBuffer.empty[(String, String)]
        while (!isOp("}")) {
          val k = eatId()
          val bind = if (isOp(":")) { i += 1; eatId() } else k
          fields += ((k, bind))
          if (isOp(",")) i += 1
        }
        eatOp("}")
        PObj(fields.toList)
      case other => fail(s"expected a destructuring pattern, found $other")
    }

    def parseStatement(): St = {
      val st = peek match {
        case Some(Id(kw @ ("var" | "let" | "const")))
            if la(1).contains(Op("[")) || la(1).contains(Op("{")) =>
          // destructuring declaration: one pattern per statement
          i += 1
          val pat = parsePattern()
          eatOp("=")
          DestrDecl(kw, pat, parseExpr())
        case Some(Id(kw @ ("var" | "let" | "const"))) =>
          i += 1
          val vars = scala.collection.mutable.ArrayBuffer.empty[(String, Option[Ex])]
          var more = true
          while (more) {
            val n = eatId()
            val init = if (isOp("=")) { i += 1; Some(parseExpr()) } else None
            vars += ((n, init))
            if (isOp(",")) i += 1 else more = false
          }
          VarDecl(vars.toList, kw)
        case Some(Id("function")) =>
          // nested function declaration — a closure over the enclosing
          // scope, callable (and self-recursive) by name; `function*`
          // declares a generator
          i += 1
          val isGen = isOp("*")
          if (isGen) i += 1
          val name = eatId()
          val params = parseParams()
          FuncDecl(name, params, parseBlock(), isGen)
        case Some(Id("class")) => parseClass()
        case Some(Op("{")) =>
          // STANDALONE block statement (ES): its own lexical scope —
          // runBlock gives it let/const scoping + TDZ seeding. Desugared
          // to the always-true branch (no dedicated AST node needed).
          IfS(LBool(true), parseBlock(), Vector.empty)
        case Some(Id("return")) =>
          i += 1
          if (isOp(";") || isOp("}")) ReturnS(None) else ReturnS(Some(parseExpr()))
        case Some(Id("throw")) =>
          i += 1; ThrowS(parseExpr())
        case Some(Id("try")) =>
          i += 1
          val body = parseBlock()
          var hasCatch = false
          val (param, catchBody) =
            if (peek.contains(Id("catch"))) {
              hasCatch = true
              i += 1
              val p = if (isOp("(")) { i += 1; val n = eatId(); eatOp(")"); Some(n) }
                      else None // ES2019 optional catch binding
              (p, parseBlock())
            } else (None, Vector.empty[St])
          val fin =
            if (peek.contains(Id("finally"))) { i += 1; parseBlock() }
            else Vector.empty[St]
          if (!hasCatch && fin.isEmpty)
            fail("try requires a catch or finally clause")
          // no catch clause: rethrow after finally — model as a catch
          // that rethrows via the sentinel param name
          if (hasCatch) TryS(body, param, catchBody, fin)
          else TryS(body, Some("__rethrow"),
            Vector(ThrowS(Ref("__rethrow"))), fin)
        case Some(Id("break"))    => i += 1; BreakS
        case Some(Id("continue")) => i += 1; ContinueS
        case Some(Id("if")) =>
          i += 1; eatOp("("); val c = parseExpr(); eatOp(")")
          val t = blockOrSingle()
          val e = if (peek.contains(Id("else"))) { i += 1; blockOrSingle() }
                  else Vector.empty[St]
          IfS(c, t, e)
        case Some(Id("while")) =>
          i += 1; eatOp("("); val c = parseExpr(); eatOp(")")
          WhileS(c, blockOrSingle())
        case Some(Id("do")) =>
          i += 1
          val body = blockOrSingle()
          peek match {
            case Some(Id("while")) => i += 1
            case other => fail(s"do-while needs `while`, found $other")
          }
          eatOp("("); val c = parseExpr(); eatOp(")")
          DoWhileS(body, c)
        case Some(Id("switch")) =>
          i += 1; eatOp("("); val subj = parseExpr(); eatOp(")"); eatOp("{")
          def caseBody(): Vector[St] = {
            val out = Vector.newBuilder[St]
            while (!isOp("}") && !peek.contains(Id("case")) &&
                !peek.contains(Id("default")))
              out += parseStatement()
            out.result()
          }
          val cases =
            scala.collection.mutable.ListBuffer.empty[(Option[Ex], Vector[St])]
          while (!isOp("}")) peek match {
            case Some(Id("case")) =>
              i += 1; val ce = parseExpr(); eatOp(":")
              cases += ((Some(ce), caseBody()))
            case Some(Id("default")) =>
              i += 1; eatOp(":")
              cases += ((None, caseBody()))
            case other => fail(s"expected case/default in switch, found $other")
          }
          eatOp("}")
          SwitchS(subj, cases.toList)
        case Some(Id("async")) =>
          fail("async/await is not supported — UDFs are synchronous " +
            "(remove the async wrapper)")
        case Some(Id("for")) =>
          i += 1; eatOp("(")
          // for (var x of e) / for (x of e) — arrays, strings, generators
          val save = i
          var loopKind = "var"
          peek match {
            case Some(Id(k @ ("var" | "let" | "const"))) =>
              loopKind = k; i += 1
            case _ => ()
          }
          val forOf: Option[St] = (peek, la(1)) match {
            case (Some(Id(n)), Some(Id(w @ ("of" | "in")))) =>
              i += 2
              val it = parseExpr(); eatOp(")")
              val body = blockOrSingle()
              Some(
                if (w == "of")
                  ForOfS(n, it, body, perIter = loopKind != "var",
                    constVar = loopKind == "const")
                else
                  ForInS(n, it, body, perIter = loopKind != "var",
                    constVar = loopKind == "const"))
            case _ => i = save; None
          }
          forOf.getOrElse {
            val init = if (isOp(";")) None else Some(parseSimpleStatement())
            // a `var` init delegates to parseStatement, which already ate
            // its trailing ';' — tolerate either state
            if (isOp(";")) i += 1
            val cond = if (isOp(";")) None else Some(parseExpr())
            eatOp(";")
            val upd = if (isOp(")")) None else Some(parseSimpleStatement())
            eatOp(")")
            val body = blockOrSingle()
            // a let/const init gets ES per-iteration bindings: each
            // iteration (and the closures it creates) sees its own copy
            val (letVars, letConst) = init match {
              case Some(VarDecl(vs, k)) if k != "var" =>
                (vs.map(_._1), k == "const")
              case _ => (Nil, false)
            }
            ForS(init, cond, upd, body, letVars, letConst)
          }
        case _ => parseSimpleStatement()
      }
      if (isOp(";")) i += 1
      st
    }

    /** `class Name [extends Parent] { … }` — constructor, methods,
      * generator methods (`*g(){…}`), statics, instance/static fields
      * (`x = e`), and `get`/`set` accessors. */
    def parseClass(): St = {
      i += 1 // 'class'
      val name = eatId()
      val parent =
        if (peek.contains(Id("extends"))) { i += 1; Some(eatId()) }
        else None
      eatOp("{")
      var ctor: Option[(Seq[P1], Vector[St])] = None
      val fields =
        scala.collection.mutable.ListBuffer.empty[(String, Ex)]
      val staticFields =
        scala.collection.mutable.ListBuffer.empty[(String, Ex)]
      val methods = scala.collection.mutable
        .ListBuffer.empty[(String, Seq[P1], Vector[St], Boolean)]
      val statics = scala.collection.mutable
        .ListBuffer.empty[(String, Seq[P1], Vector[St], Boolean)]
      val getters =
        scala.collection.mutable.ListBuffer.empty[(String, Vector[St])]
      val setters =
        scala.collection.mutable.ListBuffer.empty[(String, String, Vector[St])]
      while (!isOp("}")) {
        if (isOp(";")) i += 1
        else {
          val isStatic = peek.contains(Id("static")) &&
            (la(1) match {
              case Some(Id(_)) | Some(Op("*")) => true; case _ => false
            })
          if (isStatic) i += 1
          val isGenM = isOp("*")
          if (isGenM) i += 1
          val mname = eatId()
          if ((mname == "get" || mname == "set") && !isOp("(") && !isOp("=")) {
            // accessor: get p() {…} / set p(v) {…}
            if (isGenM) fail("generator accessors are not a thing")
            val accName = eatId()
            val params = parseParams()
            val body = parseBlock()
            if (mname == "get") {
              if (params.nonEmpty) fail(s"getter $accName takes no parameters")
              if (isStatic) fail("static accessors are not modeled — use a " +
                "static method")
              getters += ((accName, body))
            } else {
              if (params.length != 1 || params.head.rest)
                fail(s"setter $accName takes exactly one parameter")
              if (isStatic) fail("static accessors are not modeled — use a " +
                "static method")
              setters += ((accName, params.head.name, body))
            }
          } else if (isOp("=")) {
            // class field: x = e (instance) / static x = e
            if (isGenM) fail("a class field cannot be a generator")
            i += 1
            val e = parseExpr()
            if (isStatic) staticFields += ((mname, e))
            else fields += ((mname, e))
          } else {
            val params = parseParams()
            val body = parseBlock()
            if (mname == "constructor" && !isStatic) {
              if (isGenM) fail("a constructor cannot be a generator")
              ctor = Some((params, body))
            }
            else if (isStatic) statics += ((mname, params, body, isGenM))
            else methods += ((mname, params, body, isGenM))
          }
        }
      }
      eatOp("}")
      ClassDecl(name, parent, ctor, fields.toList, staticFields.toList,
        methods.toList, statics.toList, getters.toList, setters.toList)
    }

    /** assignment / inc-dec / expression statement (no keywords). An
      * expression that turns out to be a member/index lvalue followed by
      * an assignment operator becomes [[LvalAssign]] — `this.x = e`,
      * `obj.a += e`, `arr[i] = e`. */
    def parseSimpleStatement(): St = (peek, la(1)) match {
      case (Some(Id("var")), _) | (Some(Id("let")), _) | (Some(Id("const")), _) =>
        parseStatement()
      case (Some(Id(n)), Some(Op(op)))
          if Seq("=", "+=", "-=", "*=", "/=", "%=").contains(op) =>
        i += 2; Assign(n, op, parseExpr())
      case (Some(Id(n)), Some(Op(op))) if op == "++" || op == "--" =>
        i += 2; IncDec(n, op)
      case _ =>
        val e = parseExpr()
        peek match {
          case Some(Op(op))
              if Seq("=", "+=", "-=", "*=", "/=", "%=").contains(op) =>
            i += 1
            e match {
              case Member(_, _, _) | IndexE(_, _) =>
                LvalAssign(e, op, parseExpr())
              case _ => fail("invalid assignment target")
            }
          case Some(Op(op)) if op == "++" || op == "--" =>
            // statement-position postfix inc/dec on a member/index lvalue
            // (`this.cnt++`) — sugar for `+= 1`
            i += 1
            e match {
              case Member(_, _, _) | IndexE(_, _) =>
                LvalAssign(e, if (op == "++") "+=" else "-=", LNum(1))
              case _ => fail("invalid increment target")
            }
          case _ => ExprS(e)
        }
    }

    def parseExpr(): Ex = peek match {
      case Some(Id("yield")) =>
        // yield binds looser than any operator: `yield a + b` yields a+b
        i += 1
        if (isOp(";") || isOp("}") || isOp(")")) YieldEx(None)
        else YieldEx(Some(parseExpr()))
      case _ => parseTernary()
    }

    def parseTernary(): Ex = {
      val c = parseNullish()
      if (isOp("?")) {
        i += 1; val t = parseExpr(); eatOp(":"); val f = parseExpr()
        Tern(c, t, f)
      } else c
    }
    def parseNullish(): Ex = {
      var l = parseOr()
      while (isOp("??")) { i += 1; l = Bin("??", l, parseOr()) }
      l
    }
    def parseOr(): Ex = {
      var l = parseAnd()
      while (isOp("||")) { i += 1; l = Bin("||", l, parseAnd()) }
      l
    }
    def parseAnd(): Ex = {
      var l = parseCmp()
      while (isOp("&&")) { i += 1; l = Bin("&&", l, parseCmp()) }
      l
    }
    def parseCmp(): Ex = {
      var l = parseAdd()
      var more = true
      while (more) peek match {
        case Some(Op(o)) if Seq("==", "===", "!=", "!==", "<", "<=", ">", ">=").contains(o) =>
          i += 1; l = Bin(o, l, parseAdd())
        case Some(Id(kw @ ("instanceof" | "in"))) =>
          i += 1; l = Bin(kw, l, parseAdd())
        case _ => more = false
      }
      l
    }
    def parseAdd(): Ex = {
      var l = parseMul()
      var more = true
      while (more) peek match {
        case Some(Op(o)) if o == "+" || o == "-" => i += 1; l = Bin(o, l, parseMul())
        case _ => more = false
      }
      l
    }
    def parseMul(): Ex = {
      var l = parsePow()
      var more = true
      while (more) peek match {
        case Some(Op(o)) if o == "*" || o == "/" || o == "%" =>
          i += 1; l = Bin(o, l, parsePow())
        case _ => more = false
      }
      l
    }
    def parsePow(): Ex = {
      val l = parseUnary()
      if (isOp("**")) { i += 1; Bin("**", l, parsePow()) } else l
    }
    def parseUnary(): Ex = peek match {
      case Some(Op("-")) => i += 1; Un("-", parseUnary())
      case Some(Op("+")) => i += 1; parseUnary()
      case Some(Op("!")) => i += 1; Un("!", parseUnary())
      case Some(Id("typeof")) => i += 1; Un("typeof", parseUnary())
      case Some(Id("await")) =>
        fail("async/await is not supported — UDFs are synchronous")
      case _             => parsePostfix()
    }

    def parsePostfix(): Ex = {
      var e = parseAtom()
      var more = true
      while (more) peek match {
        case Some(Op("(")) =>
          // call of whatever `e` evaluates to: a declared function, a
          // closure-valued variable, an IIFE, a just-returned closure
          i += 1
          e = CallE(e, parseArgs())
        case Some(Op("[")) =>
          i += 1; val idx = parseExpr(); eatOp("]"); e = IndexE(e, idx)
        case Some(Op(o @ ("." | "?."))) =>
          val opt = o == "?."
          i += 1
          val m = eatId()
          if (isOp("(")) {
            i += 1
            val args = parseArgs()
            e match {
              case Ref("Math") =>
                if (m == "random")
                  fail("Math.random is non-deterministic — not allowed in UDFs")
                e = MathCall(m, args)
              case Ref("Date") =>
                // the DETERMINISTIC Date subset: Date.UTC(…) computes an
                // epoch from explicit parts. Date.now() reads the clock —
                // still rejected (a retried Spark task must reproduce its
                // rows bit-for-bit; translatable bodies get a
                // query-constant now() via the JsUdf codegen path).
                if (m == "UTC") e = GlobalCall("Date.UTC", args)
                else fail(s"Date.$m is non-deterministic — use new Date(ms)/" +
                  "Date.UTC(y,m,…) (deterministic) or the codegen path's " +
                  "Date.now()")
              case Ref("Array") if m == "from" =>
                e = GlobalCall("Array.from", args)
              case Ref("Array") if m == "isArray" =>
                e = GlobalCall("Array.isArray", args)
              case Ref("Object") if Seq("keys", "values", "entries",
                  "assign", "fromEntries").contains(m) =>
                e = GlobalCall(s"Object.$m", args)
              case Ref("JSON") =>
                if (m != "parse" && m != "stringify")
                  fail(s"JSON.$m is not supported (parse/stringify only)")
                e = GlobalCall(s"JSON.$m", args)
              case MathCall(fn, Nil) if m == "apply" =>
                // `Math.max.apply(null, xs)` (the reference's arr_max
                // integration body) ≡ `Math.fn(...xs)`: the second
                // argument spreads, the thisArg is ignored like JS does
                // for Math statics
                if (args.length != 2)
                  fail(s"Math.$fn.apply expects (thisArg, argsArray)")
                e = MathCall(fn, List((args(1)._1, true)))
              case _ => e = MethodCall(e, m, args, opt)
            }
          } else e match {
            case Ref("Math") => e = MathCall(m, Nil) // Math.PI / Math.E
            case _           => e = Member(e, m, opt)
          }
        case _ => more = false
      }
      e
    }

    /** Arrow-function body: a block, or a single expression that
      * becomes an implicit return. */
    def arrowBody(): Vector[St] =
      if (isOp("{")) parseBlock() else Vector(ReturnS(Some(parseExpr())))

    /** True iff the '(' at the current position closes into '=>' — the
      * parenthesized-arrow-params lookahead. */
    def arrowAhead(): Boolean = {
      var k = i; var depth = 0
      var ok = peek.contains(Op("("))
      while (ok && k < ts.length) {
        ts(k) match {
          case Op("(") => depth += 1; k += 1
          case Op(")") =>
            depth -= 1; k += 1
            if (depth == 0) return ts.lift(k).contains(Op("=>"))
          case _ => k += 1
        }
      }
      false
    }

    def parseAtom(): Ex = peek match {
      case Some(Num(v))         => i += 1; LNum(v)
      case Some(Str(s))         => i += 1; LStr(s)
      case Some(Re(p, f))       => i += 1; LRe(p, f)
      case Some(Id("true"))     => i += 1; LBool(true)
      case Some(Id("false"))    => i += 1; LBool(false)
      case Some(Id("null")) | Some(Id("undefined")) => i += 1; LNull
      case Some(Id("function")) =>
        // function expression: anonymous or named (the name is only in
        // scope inside the body — named-expression recursion); `function*`
        // is a generator expression
        i += 1
        val isGen = isOp("*")
        if (isGen) i += 1
        val name = peek match {
          case Some(Id(n)) => i += 1; Some(n)
          case _           => None
        }
        FuncLit(name, parseParams(), parseBlock(), isGen)
      case Some(Id("new")) =>
        // new Name(args) — a user class, a constructor function, or the
        // deterministic Date subset
        i += 1
        val name = eatId()
        eatOp("(")
        NewE(name, parseArgs())
      case Some(Id("super")) =>
        // super(args) in a constructor; super.m(args) in a method
        i += 1
        if (isOp("(")) { i += 1; SuperCallE(parseArgs()) }
        else if (isOp(".")) {
          i += 1
          val m = eatId()
          if (!isOp("(")) fail("super properties are call-only — " +
            s"use super.$m(…)")
          i += 1
          SuperMethodE(m, parseArgs())
        } else fail("`super` is usable as super(args) or super.m(args)")
      case Some(Id(n)) if la(1).contains(Op("=>")) =>
        // bare-parameter arrow: x => …
        i += 2
        FuncLit(None, Seq(P1(n)), arrowBody())
      case Some(Id(n)) if la(1).contains(Op("(")) &&
          Seq("Number", "String", "Boolean", "parseInt", "parseFloat",
            "isNaN", "isFinite").contains(n) =>
        i += 2
        GlobalCall(n, parseArgs())
      case Some(Id(n)) => i += 1; Ref(n)
      case Some(Op("(")) if arrowAhead() =>
        // parenthesized arrow params: (a, b) => …
        val params = parseParams()
        eatOp("=>")
        FuncLit(None, params, arrowBody())
      case Some(Op("(")) =>
        i += 1; val e = parseExpr(); eatOp(")"); e
      case Some(Op("[")) =>
        i += 1
        val items = scala.collection.mutable.ListBuffer.empty[(Ex, Boolean)]
        while (!isOp("]")) {
          val spread = isOp("...")
          if (spread) i += 1
          items += ((parseExpr(), spread))
          if (isOp(",")) i += 1
        }
        eatOp("]")
        ArrL(items.toList)
      case Some(Op("{")) =>
        // object literal: static keys (identifier / 'string' / number),
        // shorthand {a, b}, computed [expr]: v, method shorthand m(){…}
        i += 1
        val fields = scala.collection.mutable.ListBuffer.empty[(Ex, Ex)]
        while (!isOp("}")) {
          peek match {
            case Some(Op("[")) =>
              i += 1; val k = parseExpr(); eatOp("]"); eatOp(":")
              fields += ((k, parseExpr()))
            case Some(Id(k)) if la(1).contains(Op(":")) =>
              i += 2; fields += ((LStr(k), parseExpr()))
            case Some(Id(k)) if la(1).contains(Op("(")) =>
              // method shorthand — a closure field, `this`-bound on call
              i += 1
              fields += ((LStr(k), FuncLit(None, parseParams(), parseBlock())))
            case Some(Id(k)) =>
              i += 1; fields += ((LStr(k), Ref(k))) // shorthand {a, b}
            case Some(Str(k)) =>
              i += 1; eatOp(":"); fields += ((LStr(k), parseExpr()))
            case Some(Num(v)) =>
              i += 1; eatOp(":")
              val key = if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString
                        else v.toString
              fields += ((LStr(key), parseExpr()))
            case other => fail(s"expected object key, found $other")
          }
          if (isOp(",")) i += 1
        }
        eatOp("}")
        ObjL(fields.toList)
      case other => fail(s"unexpected token $other")
    }
  }

  def compile(src: String): Compiled = new P(lex(src)).parseFunction()

  // ---------- evaluator ----------

  val DefaultStepBudget = 100000

  private case class ReturnEx(v: Any) extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  /** a user `throw` in flight — the ONLY exception try/catch catches. */
  private case class JsThrow(v: Any) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
    override def getMessage: String = "uncaught JS throw: " + toStr(v)
  }
  private case object BreakEx extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  private case object ContinueEx extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  private def truthy(v: Any): Boolean = v match {
    case null         => false
    case b: Boolean   => b
    case d: Double    => d != 0.0 && !d.isNaN
    case s: String    => s.nonEmpty
    case _            => true
  }
  private def toNum(v: Any): Double = v match {
    case null       => 0.0
    case d: Double  => d
    case b: Boolean => if (b) 1.0 else 0.0
    case s: String  => // JS ToNumber: empty/whitespace string is 0
      val t = s.trim
      if (t.isEmpty) 0.0
      else try t.toDouble catch { case _: Exception => Double.NaN }
    case d: JsDate  => d.ms // JS Number(date) = epoch millis
    case _          => Double.NaN
  }
  private def toStr(v: Any): String = v match {
    case null      => "null"
    case d: Double => if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case b: Boolean => b.toString
    case s: String => s
    case a: scala.collection.mutable.ArrayBuffer[_] => a.map(toStr).mkString(",")
    case m: scala.collection.mutable.LinkedHashMap[_, _] =>
      // JSON shape (not JS's "[object Object]") — the useful serialization
      // for a UDF whose declared return type is TEXT
      m.map { case (k, v) =>
        val jv = v match {
          case s: String => "\"" + s.replace("\"", "\\\"") + "\""
          case other     => toStr(other)
        }
        "\"" + k + "\":" + jv
      }.mkString("{", ",", "}")
    case other     => other.toString
  }

  /** `JSON.stringify` — real JSON (unlike [[toStr]]'s Array.prototype
    * .toString comma form): arrays bracketed, strings quoted+escaped,
    * numbers in JS rendering, functions/classes/undefined → null. */
  private def jsonStringify(v: Any): String = v match {
    case null       => "null"
    case b: Boolean => b.toString
    // JSON has no NaN/Infinity: JSON.stringify renders them null (ES)
    case d: Double if d.isNaN || d.isInfinite => "null"
    case d: Double  => toStr(d)
    case s: String  => jsonQuote(s)
    case a: scala.collection.mutable.ArrayBuffer[_] =>
      a.map(jsonStringify).mkString("[", ",", "]")
    case m: scala.collection.mutable.LinkedHashMap[_, _] =>
      m.map { case (k, x) => jsonQuote(k.toString) + ":" + jsonStringify(x) }
        .mkString("{", ",", "}")
    case d: JsDate => jsonQuote(d.toString)
    case _         => "null" // closures/classes serialize like JS undefined
  }

  private def jsonQuote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** `JSON.parse` — strict recursive descent into interpreter values
    * (objects → LinkedHashMap, arrays → ArrayBuffer, numbers → Double). */
  private def jsonParse(s: String): Any = {
    var i = 0
    def fail(msg: String): Nothing = throw new IllegalStateException(
      s"JSON.parse: $msg at offset $i")
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("dangling escape")
          s.charAt(i) match {
            case '"'  => b.append('"')
            case '\\' => b.append('\\')
            case '/'  => b.append('/')
            case 'b'  => b.append('\b')
            case 'f'  => b.append('\f')
            case 'n'  => b.append('\n')
            case 'r'  => b.append('\r')
            case 't'  => b.append('\t')
            case 'u'  =>
              if (i + 4 >= s.length) fail("short \\u escape")
              b.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case e => fail(s"bad escape '\\$e'")
          }
        } else b.append(c)
        i += 1
      }
      expect('"')
      b.toString
    }
    def value(): Any = {
      ws()
      if (i >= s.length) fail("unexpected end")
      s.charAt(i) match {
        case '"' => str()
        case '{' =>
          i += 1; ws()
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
          if (i < s.length && s.charAt(i) == '}') { i += 1; return m }
          var more = true
          while (more) {
            ws(); val k = str(); ws(); expect(':')
            m(k) = value(); ws()
            if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
          }
          ws(); expect('}'); m
        case '[' =>
          i += 1; ws()
          val a = scala.collection.mutable.ArrayBuffer.empty[Any]
          if (i < s.length && s.charAt(i) == ']') { i += 1; return a }
          var more = true
          while (more) {
            a += value(); ws()
            if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
          }
          ws(); expect(']'); a
        case 't' =>
          if (!s.startsWith("true", i)) fail("bad literal"); i += 4; true
        case 'f' =>
          if (!s.startsWith("false", i)) fail("bad literal"); i += 5; false
        case 'n' =>
          if (!s.startsWith("null", i)) fail("bad literal"); i += 4; null
        case c if c == '-' || c.isDigit =>
          val st = i
          i += 1
          while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
          try s.substring(st, i).toDouble
          catch { case _: Exception => fail(s"bad number '${s.substring(st, i)}'") }
        case c => fail(s"unexpected '$c'")
      }
    }
    val v = value()
    ws()
    if (i != s.length) fail("trailing content")
    v
  }

  /** Temporal-dead-zone sentinel: a block's top-level `let`/`const`/
    * `class` names are pre-bound to this at scope entry, and any read or
    * write that reaches the sentinel before the declaration statement
    * executes throws loudly — ES's ReferenceError, the one divergence
    * the r11 verdict flagged as silent (a pre-declaration read used to
    * yield the ENCLOSING binding). */
  private object Tdz { override def toString: String = "<tdz>" }

  private def tdzFail(n: String): Nothing =
    throw new IllegalStateException(
      s"cannot access '$n' before initialization in JS UDF " +
        "(let/const temporal dead zone)")

  /** A lexical scope: reads walk the parent chain, assignment writes to
    * the defining scope (or declares locally when none defines it).
    * `isFunc` marks invocation scopes — `var` declarations hoist to the
    * nearest one; per-iteration loop scopes (`let`/`const` in a for
    * header) are non-function scopes layered on top. */
  private final class Scope(val parent: Scope, val isFunc: Boolean = true) {
    val vars = new java.util.HashMap[String, Any]
    /** names declared `const` IN THIS scope — [[set]] refuses them
      * (JS "Assignment to constant variable"). */
    var consts: scala.collection.mutable.HashSet[String] = null
    def markConst(n: String): Unit = {
      if (consts == null) consts = scala.collection.mutable.HashSet.empty
      consts += n
    }
    def lookup(n: String): Option[Any] = {
      var s: Scope = this
      while (s != null) {
        val v = s.vars.get(n)
        if (v != null || s.vars.containsKey(n)) {
          if (v.asInstanceOf[AnyRef] eq Tdz) tdzFail(n)
          return Some(v)
        }
        s = s.parent
      }
      None
    }
    /** allocation-free read on the hot path (no Option per variable
      * reference — [[Scope.Missing]] is the not-found sentinel). */
    def get(n: String): Any = {
      var s: Scope = this
      while (s != null) {
        val v = s.vars.get(n)
        if (v != null) {
          if (v.asInstanceOf[AnyRef] eq Tdz) tdzFail(n)
          return v
        }
        if (s.vars.containsKey(n)) return null
        s = s.parent
      }
      throw new IllegalStateException(s"undefined variable '$n' in JS UDF")
    }
    def set(n: String, v: Any): Unit = {
      var s: Scope = this
      while (s != null) {
        if (s.vars.containsKey(n)) {
          if (s.vars.get(n).asInstanceOf[AnyRef] eq Tdz) tdzFail(n)
          if (s.consts != null && s.consts.contains(n))
            throw new IllegalStateException(
              s"assignment to constant variable '$n' in JS UDF")
          s.vars.put(n, v); return
        }
        s = s.parent
      }
      vars.put(n, v)
    }
  }

  /** A JS regex value: the java.util.regex compilation plus the `g`
    * flag (java has no global mode — replace/match branch on it).
    * JS semantics notes: `.test` is STATELESS here (JS's lastIndex
    * statefulness under /g is a wart, not modeled); `$&` in
    * replacements translates to java's `$0`. */
  private[functions] final case class JsRegexVal(
      p: java.util.regex.Pattern, global: Boolean) {
    override def toString: String = s"/${p.pattern}/"
  }
  private[functions] object JsRegexVal {
    def compile(pattern: String, flags: String): JsRegexVal = {
      var f = 0
      var g = false
      flags.foreach {
        case 'g' => g = true
        case 'i' => f |= java.util.regex.Pattern.CASE_INSENSITIVE |
                         java.util.regex.Pattern.UNICODE_CASE
        case 'm' => f |= java.util.regex.Pattern.MULTILINE
        case 's' => f |= java.util.regex.Pattern.DOTALL
        case 'u' => () // codepoint escapes: java regex handles \u natively
        case other => throw new UnsupportedOperationException(
          s"JS parse: unsupported regex flag '$other' (g/i/m/s/u only)")
      }
      JsRegexVal(java.util.regex.Pattern.compile(pattern, f), g)
    }
  }

  /** A function value: parameters, body, and the DEFINING scope (the
    * closure's captured environment); `selfName` lets named function
    * expressions recurse; `isGen` marks generators (calling one runs the
    * body EAGERLY under the step budget and returns a [[JsGenerator]]). */
  private final case class Closure(params: Seq[P1], body: Vector[St],
                                   defScope: Scope, selfName: Option[String],
                                   isGen: Boolean = false) {
    override def toString: String = "function"
  }

  /** A user class value: parent link, constructor, field initializers,
    * instance/static method tables, and accessors (closures over the
    * scope the class was declared in). `staticVals` carries evaluated
    * `static x = e` fields. Lookups walk the `extends` chain. */
  private final case class JsClass(name: String, parent: Option[JsClass],
      ctor: Option[Closure],
      fields: List[(String, Closure)],
      methods: Map[String, Closure], statics: Map[String, Closure],
      getters: Map[String, Closure], setters: Map[String, Closure],
      staticVals: scala.collection.mutable.LinkedHashMap[String, Any]) {
    override def toString: String = s"class $name"
    def findMethod(n: String): Option[(Closure, JsClass)] =
      methods.get(n).map((_, this))
        .orElse(parent.flatMap(_.findMethod(n)))
    def findStatic(n: String): Option[(Closure, JsClass)] =
      statics.get(n).map((_, this))
        .orElse(parent.flatMap(_.findStatic(n)))
    def findGetter(n: String): Option[(Closure, JsClass)] =
      getters.get(n).map((_, this))
        .orElse(parent.flatMap(_.findGetter(n)))
    def findSetter(n: String): Option[(Closure, JsClass)] =
      setters.get(n).map((_, this))
        .orElse(parent.flatMap(_.findSetter(n)))
    def findStaticVal(n: String): Option[Any] =
      staticVals.get(n).orElse(parent.flatMap(_.findStaticVal(n)))
    /** nearest declared constructor at-or-above this class. */
    def findCtor: Option[(Closure, JsClass)] =
      ctor.map((_, this)).orElse(parent.flatMap(_.findCtor))
    def isAncestorOrSelf(of: JsClass): Boolean =
      (this eq of) || parent.exists(_.isAncestorOrSelf(of))
  }

  /** An object created by `new`: a plain JS object (the LinkedHashMap
    * parent carries the fields, so every map code path — property
    * access, JSON rendering, index assign — applies) plus the class
    * whose methods dispatch with `this` bound. `cls` is null for
    * constructor-function instances (`new F()` where F is a plain
    * function that assigns `this.…`). */
  private final class JsInstance(val cls: JsClass)
      extends scala.collection.mutable.LinkedHashMap[String, Any]

  /** A generator's yielded sequence. Generators run EAGERLY at call time
    * (the step budget bounds runaway/infinite generators — the one
    * unsupported shape is an infinite generator consumed with an early
    * `break`, which fails loudly on the budget instead of completing).
    * `for…of` drains it; `.next()` steps a cursor with JS's
    * `{value, done}` protocol. */
  private final class JsGenerator(val items: scala.collection.mutable.ArrayBuffer[Any]) {
    var cursor: Int = 0
    /** remaining items, consuming them (a generator iterates once). */
    def drain(): Seq[Any] = {
      val out = items.slice(cursor, items.length).toSeq
      cursor = items.length
      out
    }
    override def toString: String = "[object Generator]"
  }

  /** The deterministic Date subset: an epoch-millis instant. Constructed
    * from EXPLICIT parts only (`new Date(ms)`, `new Date(y,m,d,…)`,
    * `Date.UTC(…)`, ISO strings); part-wise constructors and accessors
    * are pinned to UTC — JS's local-timezone Date semantics would make a
    * UDF's output depend on which executor ran the row, the exact
    * irreproducibility the Math.random/Date.now rejection exists to
    * prevent. Local-time accessors (getFullYear, getMonth, …) are
    * rejected with the UTC alternative named. */
  private final case class JsDate(ms: Double) {
    override def toString: String = JsInterp.isoString(ms)
  }

  /** ISO date/datetime string → epoch millis, UTC-pinned for zoneless
    * forms (JS date-only semantics; the reference's GraalVM string→
    * TIMESTAMP coercion behaves the same for its test vectors). */
  private[functions] def parseIsoMs(s: String): Long = {
    try java.time.Instant.parse(s).toEpochMilli
    catch { case _: Exception =>
      try java.time.LocalDateTime.parse(s)
        .atZone(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
      catch { case _: Exception =>
        try java.time.LocalDate.parse(s)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        catch { case _: Exception =>
          throw new IllegalStateException(
            s"unparseable Date string '$s' (ISO instant, " +
              "yyyy-MM-dd'T'HH:mm:ss, or yyyy-MM-dd only)")
        }
      }
    }
  }

  private[functions] def isoString(ms: Double): String = {
    val inst = java.time.Instant.ofEpochMilli(ms.toLong)
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(inst)
  }

  /** Date.UTC / new Date(parts) epoch computation with JS's overflow
    * normalization (month 12 rolls the year, day 32 rolls the month, …)
    * via java.time plus-arithmetic, and JS's historical 0–99 → 1900+y
    * year mapping. Month is 0-based like JS. */
  private def epochFromParts(parts: Seq[Double]): Double = {
    val y0 = parts.head
    val y = if (y0 >= 0 && y0 <= 99) 1900 + y0.toInt else y0.toInt
    val mo = parts.lift(1).map(_.toLong).getOrElse(0L)
    val d  = parts.lift(2).map(_.toLong).getOrElse(1L)
    val h  = parts.lift(3).map(_.toLong).getOrElse(0L)
    val mi = parts.lift(4).map(_.toLong).getOrElse(0L)
    val s  = parts.lift(5).map(_.toLong).getOrElse(0L)
    val msp = parts.lift(6).map(_.toLong).getOrElse(0L)
    val base = java.time.LocalDateTime.of(y, 1, 1, 0, 0, 0)
      .plusMonths(mo).plusDays(d - 1).plusHours(h).plusMinutes(mi)
      .plusSeconds(s)
    base.toInstant(java.time.ZoneOffset.UTC).toEpochMilli.toDouble + msp
  }

  /** Recursion depth cap: the shared step budget alone would let ~100k
    * nested calls blow the JVM stack long before the budget trips, so
    * runaway recursion fails loudly at a depth no legitimate UDF needs.
    * 128 keeps ~2× JVM-stack headroom on a default-Xss executor thread
    * (each JS frame costs a few dozen Scala evaluator frames); [[run]]
    * additionally converts a residual StackOverflowError — e.g. from a
    * pathologically deep ARGUMENT EXPRESSION rather than call nesting —
    * into a loud exception instead of letting it unwind the task. */
  val MaxCallDepth = 128

  private def run(c: Compiled, args: Seq[Any]): Any = {
    val global = new Scope(null)
    // the function's own name is in scope (JS): `typeof f` answers
    // 'function' and the body can recurse on itself directly, without a
    // nested helper. Bound BEFORE the params so a same-named parameter
    // shadows it, like JS.
    global.vars.put(c.name,
      Closure(c.params.map(P1(_)), c.body, global, Some(c.name), c.isGen))
    c.params.zipWithIndex.foreach { case (p, ix) =>
      global.vars.put(p, normalize(args.lift(ix).orNull))
    }
    var steps = 0
    var depth = 0
    def tick(): Unit = {
      steps += 1
      if (steps > DefaultStepBudget)
        throw new IllegalStateException(
          s"JS UDF '${c.name}' exceeded the $DefaultStepBudget-step budget " +
            "(runaway loop?)")
    }
    // the CURRENT frame's yield sink: non-null only while a generator
    // body runs. Saved/restored around every call, so `yield` inside a
    // nested non-generator closure fails loudly instead of leaking into
    // the enclosing generator (JS rejects that shape at parse time).
    var curSink: scala.collection.mutable.ArrayBuffer[Any] = null

    // block-lexical-declaration scan results (the top-level let/const/
    // class names — used both for block-scope creation and TDZ seeding),
    // memoized by AST-node identity so a hot loop pays the scan once,
    // not per iteration
    val lexCache = new java.util.IdentityHashMap[Vector[St], Array[String]]

    // the class that OWNS the currently-executing method/constructor —
    // `super` resolution starts ABOVE it (saved/restored per call like
    // curSink, so nested calls keep their own home)
    var curHome: JsClass = null

    def callClosure(cl: Closure, argVals: Seq[Any], thisVal: Any = null,
                    home: JsClass = null): Any = {
      tick()
      depth += 1
      if (depth > MaxCallDepth)
        throw new IllegalStateException(
          s"JS UDF '${c.name}' exceeded the $MaxCallDepth-frame call depth " +
            "(runaway recursion?)")
      val prevSink = curSink
      val prevHome = curHome
      curHome = home
      curSink = if (cl.isGen) scala.collection.mutable.ArrayBuffer.empty[Any]
                else null
      try {
        val sc = new Scope(cl.defScope)
        if (thisVal != null) sc.vars.put("this", thisVal)
        cl.selfName.foreach(n => sc.vars.put(n, cl))
        // cursor walk — no Option/tuple boxing per parameter per call
        var rest = argVals
        cl.params.foreach { p =>
          if (p.rest)
            sc.vars.put(p.name,
              scala.collection.mutable.ArrayBuffer[Any](rest: _*))
          else {
            val v = if (rest.nonEmpty) { val h = rest.head; rest = rest.tail; h }
                    else null
            // a default applies on a missing OR null argument (graft has
            // one null; JS separates undefined — documented)
            sc.vars.put(p.name,
              if (v == null) p.default.map(eval(_, sc)).orNull else v)
          }
        }
        // the body's top-level let/const/class names enter their TDZ now
        // (after params — a let that shadows a param throws on
        // pre-declaration read, which ES rejects at parse time anyway)
        seedTdz(lexNames(cl.body), sc)
        val ret =
          try { cl.body.foreach(evalSt(_, sc)); null }
          catch {
            case ReturnEx(v) => v
            case BreakEx | ContinueEx => throw new IllegalStateException(
              "break/continue crossed a function boundary in JS UDF")
          }
        if (cl.isGen) new JsGenerator(curSink) else ret
      } finally { depth -= 1; curSink = prevSink; curHome = prevHome }
    }

    /** `new` on a user class: field initializers run parent-first with
      * `this` bound (a small ordering simplification of ES field-timing:
      * ALL fields initialize before the constructor body — exact when
      * constructors don't read subclass fields before super(), which is
      * the ES-legal pattern anyway), then the nearest declared
      * constructor runs; `super(args)` inside it continues the chain. */
    def constructInstance(cls: JsClass, args: Seq[Any]): JsInstance = {
      val inst = new JsInstance(cls)
      def initFields(c: JsClass): Unit = {
        c.parent.foreach(initFields)
        c.fields.foreach { case (n, fcl) =>
          inst(n) = callClosure(fcl, Nil, thisVal = inst)
        }
      }
      initFields(cls)
      cls.findCtor.foreach { case (ct, owner) =>
        callClosure(ct, args, thisVal = inst, home = owner)
      }
      inst
    }

    /** The lexical (block-scoped) names a block declares at its top
      * level — `let`/`const` (plain and destructuring) and `class`.
      * Memoized in [[lexCache]]. Used twice: non-empty ⇒ the block gets
      * its own scope, and every name is pre-bound to the [[Tdz]]
      * sentinel so a read/write before the declaration statement throws
      * (ES ReferenceError) instead of silently resolving to an
      * enclosing binding. */
    def lexNames(body: Vector[St]): Array[String] = {
      val cached = lexCache.get(body)
      if (cached != null) cached
      else {
        val v = body.flatMap {
          case VarDecl(vs, k) if k != "var"      => vs.map(_._1)
          case DestrDecl(k, pat, _) if k != "var" => pat match {
            case PArr(names)  => names
            case PObj(fields) => fields.map(_._2)
          }
          case ClassDecl(n, _, _, _, _, _, _, _, _) => Seq(n)
          case _ => Nil
        }.toArray
        lexCache.put(body, v)
        v
      }
    }

    /** Seeds a scope's TDZ sentinels for a block's lexical names. */
    def seedTdz(names: Array[String], sc: Scope): Unit = {
      var i = 0
      while (i < names.length) { sc.vars.put(names(i), Tdz); i += 1 }
    }

    /** Executes a block body with ES block scoping: a block that
      * DECLARES `let`/`const` (or a class) at its top level gets a child
      * scope, so inner `let x` SHADOWS an outer `x` instead of
      * overwriting it and dies at the block's end. Blocks without
      * lexical declarations run in the enclosing scope — no allocation
      * on the hot path. (`var` is unaffected either way: it hoists to
      * the nearest function scope.) */
    def runBlock(body: Vector[St], sc: Scope): Unit = {
      val names = lexNames(body)
      val bsc =
        if (names.length > 0) {
          val s2 = new Scope(sc, isFunc = false)
          seedTdz(names, s2)
          s2
        } else sc
      body.foreach(evalSt(_, bsc))
    }

    /** Spread-aware argument evaluation: `...e` flattens arrays,
      * generators, and strings in place. The no-spread case (every call
      * in a recursion-heavy body) takes an allocation-light map — the
      * flatMap path would box a List cell per argument per call. */
    def evalArgs(args: List[(Ex, Boolean)], sc: Scope): List[Any] = {
      var it = args
      var spread = false
      while (!spread && it.nonEmpty) { spread = it.head._2; it = it.tail }
      if (!spread) args.map(t => eval(t._1, sc))
      else args.flatMap {
        case (e, false) => List(eval(e, sc))
        case (e, true) => eval(e, sc) match {
          case a: scala.collection.mutable.ArrayBuffer[Any] @unchecked =>
            a.toList
          case g: JsGenerator => g.drain().toList
          case s: String      => s.map(_.toString).toList
          case other => throw new IllegalStateException(
            "spread needs an array, generator, or string, got " +
              Option(other).map(_.getClass.getSimpleName).getOrElse("null"))
        }
      }
    }

    def evalSt(s: St, sc: Scope): Unit = { tick(); s match {
      case VarDecl(vs, kind) =>
        // `var` hoists to the nearest FUNCTION scope (per-iteration loop
        // scopes are transparent to it); let/const declare locally
        val target =
          if (kind == "var") {
            var t = sc; while (!t.isFunc) t = t.parent; t
          } else sc
        vs.foreach { case (n, e) =>
          target.vars.put(n, e.map(eval(_, sc)).orNull)
          if (kind == "const") target.markConst(n)
        }
      case FuncDecl(n, ps, body, isGen) =>
        sc.vars.put(n, Closure(ps, body, sc, Some(n), isGen))
      case DestrDecl(kind, pat, init) =>
        val v = eval(init, sc)
        val target =
          if (kind == "var") {
            var t = sc; while (!t.isFunc) t = t.parent; t
          } else sc
        def bind(n: String, bv: Any): Unit = {
          target.vars.put(n, bv)
          if (kind == "const") target.markConst(n)
        }
        pat match {
          case PArr(names) =>
            val items: Seq[Any] = v match {
              case a: scala.collection.mutable.ArrayBuffer[Any] @unchecked =>
                a.toSeq
              case g: JsGenerator => g.drain()
              case s: String      => s.map(_.toString)
              case other => throw new IllegalStateException(
                "array destructuring needs an array, generator, or " +
                  "string, got " + Option(other)
                  .map(_.getClass.getSimpleName).getOrElse("null"))
            }
            names.zipWithIndex.foreach { case (n, ix) =>
              bind(n, items.lift(ix).orNull)
            }
          case PObj(fields) => v match {
            case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
              fields.foreach { case (k, n) => bind(n, m.getOrElse(k, null)) }
            case other => throw new IllegalStateException(
              "object destructuring needs an object, got " + Option(other)
                .map(_.getClass.getSimpleName).getOrElse("null"))
          }
        }
      case SwitchS(subj, cases) =>
        // ES: the whole switch body is ONE block scope; every case's
        // lexical names are TDZ-seeded in it up front
        val bsc =
          if (cases.exists(c => lexNames(c._2).length > 0)) {
            val s2 = new Scope(sc, isFunc = false)
            cases.foreach(c => seedTdz(lexNames(c._2), s2))
            s2
          } else sc
        val v = eval(subj, bsc)
        // case tests evaluate in order until the first === match; default
        // is chosen only after all tests fail; execution FALLS THROUGH
        // from the selected case until break (or the end)
        var idx = cases.indexWhere {
          case (Some(ce), _) => jsStrictEq(v, eval(ce, bsc))
          case _             => false
        }
        if (idx < 0) idx = cases.indexWhere(_._1.isEmpty)
        if (idx >= 0) {
          try cases.drop(idx).foreach(_._2.foreach(evalSt(_, bsc)))
          catch { case BreakEx => () }
        }
      case DoWhileS(body, cd) =>
        try {
          var go = true
          while (go) {
            tick()
            try runBlock(body, sc) catch { case ContinueEx => () }
            go = truthy(eval(cd, sc))
          }
        } catch { case BreakEx => () }
      case ForInS(n, iter, body, perIter, constVar) =>
        val keys: Seq[Any] = eval(iter, sc) match {
          case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
            m.keys.toSeq
          case a: scala.collection.mutable.ArrayBuffer[_] =>
            a.indices.map(_.toDouble)
          case s: String => (0 until s.length).map(_.toDouble)
          case null => Seq.empty
          case other => throw new IllegalStateException(
            "for...in needs an object, array, or string, got " +
              other.getClass.getSimpleName)
        }
        try keys.foreach { k =>
          tick()
          if (perIter) {
            val it = new Scope(sc, isFunc = false)
            it.vars.put(n, k)
            if (constVar) it.markConst(n)
            try runBlock(body, it) catch { case ContinueEx => () }
          } else {
            sc.set(n, k)
            try runBlock(body, sc) catch { case ContinueEx => () }
          }
        } catch { case BreakEx => () }
      case ClassDecl(n, parentName, ctor, fields, staticFields, methods,
          statics, getters, setters) =>
        val parent = parentName.map { pn =>
          sc.get(pn) match {
            case p: JsClass => p
            case other => throw new IllegalStateException(
              s"class $n extends $pn, which is not a class (" +
                Option(other).map(_.getClass.getSimpleName)
                  .getOrElse("null") + ")")
          }
        }
        val staticVals =
          new scala.collection.mutable.LinkedHashMap[String, Any]
        staticFields.foreach { case (fn, e) => staticVals(fn) = eval(e, sc) }
        sc.vars.put(n, JsClass(n, parent,
          ctor.map { case (ps, b) => Closure(ps, b, sc, None) },
          fields.map { case (fn, e) =>
            fn -> Closure(Nil, Vector(ReturnS(Some(e))), sc, None)
          },
          methods.map { case (mn, ps, b, g) =>
            mn -> Closure(ps, b, sc, None, g) }.toMap,
          statics.map { case (mn, ps, b, g) =>
            mn -> Closure(ps, b, sc, None, g) }.toMap,
          getters.map { case (gn, b) =>
            gn -> Closure(Nil, b, sc, None) }.toMap,
          setters.map { case (sn, p, b) =>
            sn -> Closure(Seq(P1(p)), b, sc, None) }.toMap,
          staticVals))
      case Assign(n, op, e) =>
        val v = eval(e, sc)
        val cur = () => sc.lookup(n).orNull
        sc.set(n, op match {
          case "="  => v
          case "+=" => plus(cur(), v)
          case "-=" => toNum(cur()) - toNum(v)
          case "*=" => toNum(cur()) * toNum(v)
          case "/=" => toNum(cur()) / toNum(v)
          case "%=" => toNum(cur()) % toNum(v)
        })
      case LvalAssign(lhs, op, rhs) =>
        val v = eval(rhs, sc)
        def combined(cur: Any): Any = op match {
          case "="  => v
          case "+=" => plus(cur, v)
          case "-=" => toNum(cur) - toNum(v)
          case "*=" => toNum(cur) * toNum(v)
          case "/=" => toNum(cur) / toNum(v)
          case "%=" => toNum(cur) % toNum(v)
        }
        lhs match {
          case Member(t, name, _) => eval(t, sc) match {
            case inst: JsInstance
                if Option(inst.cls).exists(_.findSetter(name).isDefined) =>
              // accessor write: read through the getter (if any) for
              // compound ops, write through the setter with `this` bound
              val cur =
                inst.get(name).getOrElse(
                  inst.cls.findGetter(name) match {
                    case Some((g, owner)) =>
                      callClosure(g, Nil, thisVal = inst, home = owner)
                    case None => null
                  })
              val (st, owner) = inst.cls.findSetter(name).get
              callClosure(st, Seq(combined(cur)), thisVal = inst, home = owner)
            case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
              m(name) = combined(m.getOrElse(name, null))
            case other => throw new IllegalStateException(
              s"cannot assign property '.$name' on " +
                Option(other).map(_.getClass.getSimpleName).getOrElse("null"))
          }
          case IndexE(t, idxE) => eval(t, sc) match {
            case a: scala.collection.mutable.ArrayBuffer[Any] @unchecked =>
              val ix = toNum(eval(idxE, sc)).toInt
              while (a.length <= ix) a += null
              a(ix) = combined(a(ix))
            case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
              val k = toStr(eval(idxE, sc))
              m(k) = combined(m.getOrElse(k, null))
            case other => throw new IllegalStateException(
              s"cannot index-assign into ${Option(other).map(_.getClass.getSimpleName).getOrElse("null")}")
          }
          case _ => throw new IllegalStateException("invalid assignment target")
        }
      case IncDec(n, op) =>
        sc.set(n, toNum(sc.lookup(n).orNull) + (if (op == "++") 1.0 else -1.0))
      case IfS(cd, t, e) =>
        if (truthy(eval(cd, sc))) runBlock(t, sc)
        else runBlock(e, sc)
      case WhileS(cd, body) =>
        // break unwinds to THIS loop (the try sits on the loop itself, so
        // nested loops each catch their own break)
        try {
          while (truthy(eval(cd, sc))) {
            tick()
            try runBlock(body, sc)
            catch { case ContinueEx => () }
          }
        } catch { case BreakEx => () }
      case ForS(init, cond, upd, body, letVars, letConst) =>
        if (letVars.isEmpty) {
          init.foreach(evalSt(_, sc))
          try {
            while (cond.forall(e => truthy(eval(e, sc)))) {
              tick()
              try runBlock(body, sc)
              catch { case ContinueEx => () }
              upd.foreach(evalSt(_, sc))
            }
          } catch { case BreakEx => () }
        } else {
          // ES per-iteration environments: the init's let/const bindings
          // are COPIED into a fresh scope before each iteration's body,
          // and the update runs in the NEXT iteration's copy — so a
          // closure created in iteration k keeps seeing iteration k's
          // value (spec: ForBodyEvaluation / CreatePerIterationEnvironment)
          val initScope = new Scope(sc, isFunc = false)
          letVars.foreach(initScope.vars.put(_, Tdz))
          init.foreach(evalSt(_, initScope))
          def perIter(): Scope = {
            val s2 = new Scope(sc, isFunc = false)
            if (letConst) letVars.foreach(s2.markConst)
            s2
          }
          var iter = perIter()
          letVars.foreach(n => iter.vars.put(n, initScope.vars.get(n)))
          try {
            while (cond.forall(e => truthy(eval(e, iter)))) {
              tick()
              try runBlock(body, iter)
              catch { case ContinueEx => () }
              val next = perIter()
              letVars.foreach(n => next.vars.put(n, iter.vars.get(n)))
              iter = next
              upd.foreach(evalSt(_, iter))
            }
          } catch { case BreakEx => () }
        }
      case ForOfS(n, iter, body, perIter, constVar) =>
        val items: Seq[Any] = eval(iter, sc) match {
          case a: scala.collection.mutable.ArrayBuffer[Any] @unchecked => a.toSeq
          case s: String => s.map(_.toString)
          case g: JsGenerator => g.drain()
          case other => throw new IllegalStateException(
            "for...of needs an array, string, or generator, got " +
              Option(other).map(_.getClass.getSimpleName).getOrElse("null"))
        }
        try items.foreach { v =>
          tick()
          if (perIter) {
            // let/const loop variable: a fresh binding per element, so
            // closures capture the element they saw
            val it = new Scope(sc, isFunc = false)
            it.vars.put(n, v)
            if (constVar) it.markConst(n)
            try runBlock(body, it) catch { case ContinueEx => () }
          } else {
            sc.set(n, v)
            try runBlock(body, sc) catch { case ContinueEx => () }
          }
        } catch { case BreakEx => () }
      case ReturnS(e) => throw ReturnEx(e.map(eval(_, sc)).orNull)
      case ThrowS(e)  => throw JsThrow(eval(e, sc))
      case TryS(body, param, catchBody, fin) =>
        try {
          try runBlock(body, sc)
          catch {
            case JsThrow(v) =>
              // the catch binding is scoped to the catch block (ES):
              // it neither leaks nor clobbers an outer variable
              val csc = new Scope(sc, isFunc = false)
              param.foreach(p => csc.vars.put(p, v))
              seedTdz(lexNames(catchBody), csc)
              catchBody.foreach(evalSt(_, csc))
          }
        } finally runBlock(fin, sc)
      case BreakS     => throw BreakEx
      case ContinueS  => throw ContinueEx
      case ExprS(e)   => eval(e, sc)
    }}

    def plus(l: Any, r: Any): Any = (l, r) match {
      case (s: String, _) => s + toStr(r)
      case (_, s: String) => toStr(l) + s
      case _              => toNum(l) + toNum(r)
    }

    def eval(e: Ex, sc: Scope): Any = { tick(); e match {
      case LNum(v)  => v
      case LStr(s)  => s
      case LBool(b) => b
      case LNull    => null
      case Ref(n)   => sc.get(n)
      case r @ LRe(_, _) => r.compiled
      case FuncLit(name, ps, body, isGen) => Closure(ps, body, sc, name, isGen)
      case CallE(t, args) =>
        eval(t, sc) match {
          case cl: Closure => callClosure(cl, evalArgs(args, sc))
          case other => throw new IllegalStateException(
            "JS UDF called a non-function value" +
              (t match { case Ref(n) => s" ('$n')"; case _ => "" }))
        }
      case Un("-", x) => -toNum(eval(x, sc))
      case Un("!", x) => !truthy(eval(x, sc))
      case Un("typeof", x) =>
        // typeof never throws on an undeclared name (the JS idiom
        // `typeof x === 'undefined'` must work)
        val v: Option[Any] = x match {
          case Ref(n) => sc.lookup(n)
          case _      => Some(eval(x, sc))
        }
        v match {
          case None             => "undefined"
          case Some(null)       => "object" // typeof null — JS's own wart
          case Some(_: Double)  => "number"
          case Some(_: String)  => "string"
          case Some(_: Boolean) => "boolean"
          case Some(_: Closure) | Some(_: JsClass) => "function"
          case Some(_)          => "object"
        }
      case Un(op, _)  => throw new IllegalStateException(s"unary $op")
      case Bin(op, l, r) =>
        // ONE Bin case: the inner string match compiles to a hash switch,
        // so the hot arithmetic path pays a single dispatch instead of a
        // chain of Bin("…") extractor+equality probes
        op match {
          case "&&" =>
            val lv = eval(l, sc); if (!truthy(lv)) lv else eval(r, sc)
          case "||" =>
            val lv = eval(l, sc); if (truthy(lv)) lv else eval(r, sc)
          case "??" =>
            val lv = eval(l, sc); if (lv == null) eval(r, sc) else lv
          case "instanceof" =>
            val lv = eval(l, sc)
            r match {
              // the builtins have no runtime binding — match on the name
              case Ref("Array") =>
                lv.isInstanceOf[scala.collection.mutable.ArrayBuffer[_]]
              case Ref("Date")   => lv.isInstanceOf[JsDate]
              case Ref("Object") =>
                lv.isInstanceOf[scala.collection.mutable.LinkedHashMap[_, _]] ||
                  lv.isInstanceOf[scala.collection.mutable.ArrayBuffer[_]]
              case Ref("Function") => lv.isInstanceOf[Closure]
              case _ => (eval(r, sc), lv) match {
                case (cls: JsClass, inst: JsInstance) =>
                  // walks the extends chain: a B is also an A
                  inst.cls != null && inst.cls.isAncestorOrSelf(cls)
                case (_: JsClass, _)                  => false
                case (other, _) => throw new IllegalStateException(
                  "instanceof needs a class, got " + Option(other)
                    .map(_.getClass.getSimpleName).getOrElse("null"))
              }
            }
          case "in" =>
            val lv = eval(l, sc)
            eval(r, sc) match {
              case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
                m.contains(toStr(lv))
              case a: scala.collection.mutable.ArrayBuffer[_] =>
                val ix = toNum(lv); ix.isWhole && ix >= 0 && ix < a.length
              case other => throw new IllegalStateException(
                "`in` needs an object or array, got " + Option(other)
                  .map(_.getClass.getSimpleName).getOrElse("null"))
            }
          case _ =>
            val lv = eval(l, sc); val rv = eval(r, sc)
            op match {
              case "+"  => plus(lv, rv)
              case "-"  => toNum(lv) - toNum(rv)
              case "*"  => toNum(lv) * toNum(rv)
              case "/"  => toNum(lv) / toNum(rv)
              case "%"  => toNum(lv) % toNum(rv)
              case "**" => math.pow(toNum(lv), toNum(rv))
              case "==" => jsEq(lv, rv)
              case "!=" => !jsEq(lv, rv)
              case "===" => jsStrictEq(lv, rv)
              case "!==" => !jsStrictEq(lv, rv)
              case "<"  => cmp(lv, rv) < 0
              case "<=" => cmp(lv, rv) <= 0
              case ">"  => cmp(lv, rv) > 0
              case ">=" => cmp(lv, rv) >= 0
            }
        }
      case Tern(cd, t, f) =>
        if (truthy(eval(cd, sc))) eval(t, sc) else eval(f, sc)
      case ArrL(items) =>
        scala.collection.mutable.ArrayBuffer[Any](evalArgs(items, sc): _*)
      case ObjL(fields) =>
        val m = new scala.collection.mutable.LinkedHashMap[String, Any]
        fields.foreach { case (k, ex) => m(toStr(eval(k, sc))) = eval(ex, sc) }
        m
      case IndexE(t, ix) => eval(t, sc) match {
        case a: scala.collection.mutable.ArrayBuffer[Any] @unchecked =>
          a.lift(toNum(eval(ix, sc)).toInt).orNull
        case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
          m.getOrElse(toStr(eval(ix, sc)), null)
        case s: String =>
          val k = toNum(eval(ix, sc)).toInt
          if (k >= 0 && k < s.length) s.charAt(k).toString else null
        case _ => null
      }
      case Member(t, name, opt) => eval(t, sc) match {
        case null if opt => null // optional chaining short-circuits
        case inst: JsInstance =>
          // own property first (JS shadowing), then a GETTER (called with
          // `this` bound), then a class method as an UNBOUND function
          // value (`this` resolves only when called as a method)
          inst.get(name).getOrElse {
            Option(inst.cls).flatMap(_.findGetter(name)) match {
              case Some((g, owner)) =>
                callClosure(g, Nil, thisVal = inst, home = owner)
              case None =>
                Option(inst.cls).flatMap(_.findMethod(name))
                  .map(_._1).orNull
            }
          }
        case cls: JsClass =>
          // static field (chain), else a static method as a value
          cls.findStaticVal(name)
            .orElse(cls.findStatic(name).map(_._1)).orNull
        case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
          m.getOrElse(name, null)
        case s: String if name == "length" => s.length.toDouble
        case a: scala.collection.mutable.ArrayBuffer[_] if name == "length" =>
          a.length.toDouble
        case _ if name == "length" => null
        case _ =>
          throw new IllegalStateException(s"unsupported property '.$name'")
      }
      case MathCall(name, args) =>
        mathCall(name, evalArgs(args, sc).map(toNum))
      case GlobalCall(name, args) =>
        val vs = evalArgs(args, sc)
        name match {
          case "Number"     => toNum(vs.headOption.orNull)
          case "String"     => toStr(vs.headOption.orNull)
          case "Boolean"    => truthy(vs.headOption.orNull)
          case "parseInt"   =>
            val s = toStr(vs.headOption.orNull).trim
            val digits = s.takeWhile(ch => ch.isDigit || ch == '-' || ch == '+')
            try digits.toLong.toDouble catch { case _: Exception => Double.NaN }
          case "parseFloat" => toNum(vs.headOption.orNull)
          case "isNaN"      => toNum(vs.headOption.orNull).isNaN
          case "isFinite"   => !toNum(vs.headOption.orNull).isInfinite &&
                               !toNum(vs.headOption.orNull).isNaN
          case "Date.UTC"   =>
            if (vs.isEmpty) throw new IllegalStateException(
              "Date.UTC needs at least a year")
            epochFromParts(vs.map(toNum))
          case "JSON.parse" =>
            jsonParse(toStr(vs.headOption.orNull))
          case "JSON.stringify" =>
            jsonStringify(vs.headOption.orNull)
          case "Array.from" => vs.headOption.orNull match {
            case a: scala.collection.mutable.ArrayBuffer[Any] @unchecked =>
              scala.collection.mutable.ArrayBuffer[Any](a.toSeq: _*)
            case s: String =>
              scala.collection.mutable.ArrayBuffer[Any](
                s.map(_.toString): _*)
            case g: JsGenerator =>
              scala.collection.mutable.ArrayBuffer[Any](g.drain(): _*)
            case other => throw new IllegalStateException(
              "Array.from needs an array, string, or generator, got " +
                Option(other).map(_.getClass.getSimpleName).getOrElse("null"))
          }
          case "Array.isArray" => vs.headOption.orNull
            .isInstanceOf[scala.collection.mutable.ArrayBuffer[_]]
          case "Object.keys" => vs.headOption.orNull match {
            case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
              scala.collection.mutable.ArrayBuffer[Any](m.keys.toSeq: _*)
            case a: scala.collection.mutable.ArrayBuffer[_] =>
              scala.collection.mutable.ArrayBuffer[Any](
                a.indices.map(_.toString): _*)
            case other => throw new IllegalStateException(
              "Object.keys needs an object, got " + Option(other)
                .map(_.getClass.getSimpleName).getOrElse("null"))
          }
          case "Object.values" => vs.headOption.orNull match {
            case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
              scala.collection.mutable.ArrayBuffer[Any](m.values.toSeq: _*)
            case other => throw new IllegalStateException(
              "Object.values needs an object, got " + Option(other)
                .map(_.getClass.getSimpleName).getOrElse("null"))
          }
          case "Object.entries" => vs.headOption.orNull match {
            case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
              scala.collection.mutable.ArrayBuffer[Any](m.toSeq.map {
                case (k, v) =>
                  scala.collection.mutable.ArrayBuffer[Any](k, v)
              }: _*)
            case other => throw new IllegalStateException(
              "Object.entries needs an object, got " + Option(other)
                .map(_.getClass.getSimpleName).getOrElse("null"))
          }
          case "Object.assign" =>
            val out = vs.headOption.orNull match {
              case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked => m
              case other => throw new IllegalStateException(
                "Object.assign needs an object target, got " + Option(other)
                  .map(_.getClass.getSimpleName).getOrElse("null"))
            }
            vs.drop(1).foreach {
              case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
                m.foreach { case (k, v) => out(k) = v }
              case null  => ()
              case other => throw new IllegalStateException(
                "Object.assign sources must be objects, got " +
                  other.getClass.getSimpleName)
            }
            out
          case "Object.fromEntries" => vs.headOption.orNull match {
            case a: scala.collection.mutable.ArrayBuffer[Any] @unchecked =>
              val m = new scala.collection.mutable.LinkedHashMap[String, Any]
              a.foreach {
                case p: scala.collection.mutable.ArrayBuffer[Any] @unchecked
                    if p.length >= 2 => m(toStr(p(0))) = p(1)
                case other => throw new IllegalStateException(
                  "Object.fromEntries needs [key, value] pairs")
              }
              m
            case g: JsGenerator =>
              val m = new scala.collection.mutable.LinkedHashMap[String, Any]
              g.drain().foreach {
                case p: scala.collection.mutable.ArrayBuffer[Any] @unchecked
                    if p.length >= 2 => m(toStr(p(0))) = p(1)
                case _ => throw new IllegalStateException(
                  "Object.fromEntries needs [key, value] pairs")
              }
              m
            case other => throw new IllegalStateException(
              "Object.fromEntries needs an array of pairs, got " +
                Option(other).map(_.getClass.getSimpleName).getOrElse("null"))
          }
        }
      case MethodCall(t, m, args, opt) =>
        val tv = eval(t, sc)
        if (tv == null && opt) null // optional call short-circuits
        else {
        val avs = evalArgs(args, sc)
        (tv, m) match {
          case (r: JsRegexVal, "test") =>
            r.p.matcher(toStr(avs.headOption.orNull)).find()
          case (_: JsRegexVal, other) => throw new IllegalStateException(
            s"unsupported regex method .$other (test; or use the string" +
              " methods match/replace/split/search)")
          // method dispatch on instances: own closure-valued property
          // shadows the class method (JS shadowing); both bind `this`;
          // class-method lookup walks the extends chain and records the
          // OWNING class as `home` so super resolves correctly
          case (inst: JsInstance, _) if inst.get(m).exists(_.isInstanceOf[Closure]) =>
            callClosure(inst(m).asInstanceOf[Closure], avs, thisVal = inst)
          case (inst: JsInstance, _)
              if Option(inst.cls).exists(_.findMethod(m).isDefined) =>
            val (cl, owner) = inst.cls.findMethod(m).get
            callClosure(cl, avs, thisVal = inst, home = owner)
          case (cls: JsClass, _) => cls.findStatic(m) match {
            case Some((cl, owner)) => callClosure(cl, avs, home = owner)
            case None => throw new IllegalStateException(
              s"class ${cls.name} has no static method '$m'")
          }
          case (mp: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked, _)
              if mp.get(m).exists(_.isInstanceOf[Closure]) =>
            // a closure stored as an object field: `this` is the object
            callClosure(mp(m).asInstanceOf[Closure], avs, thisVal = mp)
          case (g: JsGenerator, "next") =>
            val out = new scala.collection.mutable.LinkedHashMap[String, Any]
            if (g.cursor < g.items.length) {
              out("value") = g.items(g.cursor); out("done") = false
              g.cursor += 1
            } else { out("value") = null; out("done") = true }
            out
          case (d: JsDate, _) => dateMethod(d, m, avs)
          case (s: String, _)  => stringMethod(s, m, avs)
          case (a: scala.collection.mutable.ArrayBuffer[Any] @unchecked, _) =>
            arrayMethod(a, m, avs)
          case (d: Double, "toString") => toStr(d)
          case (d: Double, "toFixed") =>
            val k = avs.headOption.map(toNum(_).toInt).getOrElse(0)
            String.format(s"%.${k}f", Double.box(d))
          case _ => throw new IllegalStateException(
            s"unsupported method .$m on ${Option(tv).map(_.getClass.getSimpleName).getOrElse("null")}")
        }
        }
      case NewE(name, args) =>
        val avs = evalArgs(args, sc)
        if (name == "Date") {
          // deterministic constructions only — see JsDate
          if (avs.isEmpty) throw new IllegalStateException(
            "argless `new Date()` is non-deterministic — not allowed in " +
              "UDFs (pass the epoch/parts explicitly)")
          avs match {
            case Seq(s: String) => JsDate(parseIsoMs(s).toDouble)
            case Seq(one)       => JsDate(toNum(one))
            case parts          => JsDate(epochFromParts(parts.map(toNum)))
          }
        } else sc.get(name) match {
          case cls: JsClass => constructInstance(cls, avs)
          case cl: Closure =>
            // old-style constructor function: `this` is a fresh object
            val inst = new JsInstance(null)
            callClosure(cl, avs, thisVal = inst)
            inst
          case other => throw new IllegalStateException(
            s"'new $name' needs a class or function, got " +
              Option(other).map(_.getClass.getSimpleName).getOrElse("null"))
        }
      case SuperCallE(args) =>
        if (curHome == null || curHome.parent.isEmpty)
          throw new IllegalStateException(
            "super(…) outside a derived-class constructor")
        val inst = sc.get("this") match {
          case j: JsInstance => j
          case _ => throw new IllegalStateException("super(…) without `this`")
        }
        curHome.parent.get.findCtor.foreach { case (ct, owner) =>
          callClosure(ct, evalArgs(args, sc), thisVal = inst, home = owner)
        }
        null
      case SuperMethodE(m, args) =>
        if (curHome == null || curHome.parent.isEmpty)
          throw new IllegalStateException(
            s"super.$m(…) outside a derived-class method")
        val inst = sc.get("this") match {
          case j: JsInstance => j
          case _ => throw new IllegalStateException("super call without `this`")
        }
        curHome.parent.get.findMethod(m) match {
          case Some((cl, owner)) =>
            callClosure(cl, evalArgs(args, sc), thisVal = inst, home = owner)
          case None => throw new IllegalStateException(
            s"super.$m is not a method of ${curHome.parent.get.name}")
        }
      case YieldEx(e) =>
        if (curSink == null) throw new IllegalStateException(
          "yield outside a generator function (declare it `function*`)")
        curSink += e.map(eval(_, sc)).orNull
        null
    }}

    // JS abstract equality (==): same-type compares directly; a numeric
    // or boolean operand pulls the other side through ToNumber (so
    // '' == 0 is true, '1' == 1 is true); the reference fallback for
    // object-ish values compares string renderings
    def jsEq(l: Any, r: Any): Boolean = (l, r) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (a: Double, b: Double) => a == b
      case (a: String, b: String) => a == b
      case (a: Boolean, b: Boolean) => a == b
      case (a: Double, _) => a == toNum(r)
      case (_, b: Double) => toNum(l) == b
      case (_: Boolean, _) => toNum(l) == toNum(r)
      case (_, _: Boolean) => toNum(l) == toNum(r)
      case _ => toStr(l) == toStr(r)
    }
    // JS strict equality (===): differing runtime types are unequal,
    // no coercion — 1 === '1' is false
    def jsStrictEq(l: Any, r: Any): Boolean = (l, r) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (a: Double, b: Double) => a == b
      case (a: String, b: String) => a == b
      case (a: Boolean, b: Boolean) => a == b
      case (_: Double, _) | (_, _: Double) => false
      case (_: String, _) | (_, _: String) => false
      case (_: Boolean, _) | (_, _: Boolean) => false
      // objects/arrays: reference identity — [1,2] === [1,2] is false
      case _ => l.asInstanceOf[AnyRef] eq r.asInstanceOf[AnyRef]
    }
    def cmp(l: Any, r: Any): Int = (l, r) match {
      case (a: String, b: String) => a.compareTo(b)
      case _ =>
        val (a, b) = (toNum(l), toNum(r))
        java.lang.Double.compare(a, b)
    }

    def mathCall(name: String, xs: List[Double]): Any = name match {
      case "PI"    => math.Pi
      case "E"     => math.E
      case "abs"   => math.abs(xs.head)
      case "floor" => math.floor(xs.head)
      case "ceil"  => math.ceil(xs.head)
      case "round" => math.floor(xs.head + 0.5) // JS rounds half-up toward +∞
      case "trunc" => xs.head.toLong.toDouble
      case "sign"  => math.signum(xs.head)
      case "sqrt"  => math.sqrt(xs.head)
      case "cbrt"  => math.cbrt(xs.head)
      case "exp"   => math.exp(xs.head)
      case "log"   => math.log(xs.head)
      case "log2"  => math.log(xs.head) / math.log(2.0)
      case "log10" => math.log10(xs.head)
      case "pow"   => math.pow(xs.head, xs(1))
      case "min"   => xs.min
      case "max"   => xs.max
      case "hypot" => math.hypot(xs.head, xs(1))
      case "sin"   => math.sin(xs.head)
      case "cos"   => math.cos(xs.head)
      case "tan"   => math.tan(xs.head)
      case "atan"  => math.atan(xs.head)
      case "atan2" => math.atan2(xs.head, xs(1))
      case "asin"  => math.asin(xs.head)
      case "acos"  => math.acos(xs.head)
      case other   => throw new IllegalStateException(s"unsupported Math.$other")
    }

    /** UTC-pinned Date accessors (see [[JsDate]] for why local-time
      * accessors are rejected). */
    def dateMethod(d: JsDate, m: String, a: List[Any]): Any = {
      lazy val odt = java.time.Instant.ofEpochMilli(d.ms.toLong)
        .atOffset(java.time.ZoneOffset.UTC)
      m match {
        case "getTime" | "valueOf" => d.ms
        case "getUTCFullYear"     => odt.getYear.toDouble
        case "getUTCMonth"        => (odt.getMonthValue - 1).toDouble // 0-based
        case "getUTCDate"         => odt.getDayOfMonth.toDouble
        case "getUTCDay"          => (odt.getDayOfWeek.getValue % 7).toDouble // Sun=0
        case "getUTCHours"        => odt.getHour.toDouble
        case "getUTCMinutes"      => odt.getMinute.toDouble
        case "getUTCSeconds"      => odt.getSecond.toDouble
        case "getUTCMilliseconds" => (odt.getNano / 1000000).toDouble
        case "toISOString"        => isoString(d.ms)
        case "getFullYear" | "getMonth" | "getDate" | "getDay" | "getHours" |
             "getMinutes" | "getSeconds" | "getMilliseconds" =>
          throw new IllegalStateException(
            s"Date.$m is local-timezone-dependent — a UDF's result would " +
              s"depend on which executor ran the row; use getUTC${m.stripPrefix("get")}")
        case "getTimezoneOffset" | "toString" | "toLocaleDateString" |
             "toLocaleTimeString" | "toLocaleString" =>
          throw new IllegalStateException(
            s"Date.$m is local-timezone-dependent — a UDF's result would " +
              "depend on which executor ran the row; use toISOString")
        case other => throw new IllegalStateException(
          s"unsupported Date method .$other")
      }
    }

    def stringMethod(s: String, m: String, a: List[Any]): Any = m match {
      case "length"      => s.length.toDouble // via member normally
      case "toLowerCase" => s.toLowerCase
      case "toUpperCase" => s.toUpperCase
      case "trim"        => s.trim
      case "trimStart"   => s.replaceAll("^\\s+", "")
      case "trimEnd"     => s.replaceAll("\\s+$", "")
      case "charAt" =>
        val k = toNum(a.head).toInt
        if (k >= 0 && k < s.length) s.charAt(k).toString else ""
      case "charCodeAt" =>
        val k = toNum(a.head).toInt
        if (k >= 0 && k < s.length) s.charAt(k).toDouble else Double.NaN
      case "substring" =>
        val from = math.max(0, math.min(s.length, toNum(a.head).toInt))
        val to = a.lift(1).map(x => math.max(0, math.min(s.length, toNum(x).toInt)))
          .getOrElse(s.length)
        s.substring(math.min(from, to), math.max(from, to))
      case "slice" =>
        def norm(k: Int) = if (k < 0) math.max(0, s.length + k) else math.min(k, s.length)
        val from = norm(toNum(a.head).toInt)
        val to = a.lift(1).map(x => norm(toNum(x).toInt)).getOrElse(s.length)
        if (from >= to) "" else s.substring(from, to)
      case "indexOf"    => s.indexOf(toStr(a.head)).toDouble
      case "lastIndexOf"=> s.lastIndexOf(toStr(a.head)).toDouble
      case "includes"   => s.contains(toStr(a.head))
      case "startsWith" => s.startsWith(toStr(a.head))
      case "endsWith"   => s.endsWith(toStr(a.head))
      case "repeat"     => s * toNum(a.head).toInt
      case "padStart"   =>
        val w = toNum(a.head).toInt
        val p = a.lift(1).map(toStr).getOrElse(" ")
        if (s.length >= w || p.isEmpty) s
        else (p * ((w - s.length) / p.length + 1)).take(w - s.length) + s
      case "padEnd" =>
        val w = toNum(a.head).toInt
        val p = a.lift(1).map(toStr).getOrElse(" ")
        if (s.length >= w || p.isEmpty) s
        else s + (p * ((w - s.length) / p.length + 1)).take(w - s.length)
      case "replace" | "replaceAll"
          if a.headOption.exists(_.isInstanceOf[JsRegexVal]) =>
        val r = a.head.asInstanceOf[JsRegexVal]
        // JS $& (whole match) is java's $0; $1.. group refs align
        val repl = toStr(a(1)).replace("$&", "$0")
        val mt = r.p.matcher(s)
        if (r.global || m == "replaceAll") mt.replaceAll(repl)
        else mt.replaceFirst(repl)
      case "match" =>
        val r = a.headOption match {
          case Some(rv: JsRegexVal) => rv
          case other => throw new IllegalStateException(
            s".match needs a regex literal, got $other")
        }
        val mt = r.p.matcher(s)
        if (r.global) {
          val out = scala.collection.mutable.ArrayBuffer.empty[Any]
          while (mt.find()) out += mt.group()
          if (out.isEmpty) null else out
        } else if (mt.find()) {
          val out = scala.collection.mutable.ArrayBuffer.empty[Any]
          var g = 0
          while (g <= mt.groupCount()) { out += mt.group(g); g += 1 }
          out
        } else null
      case "search" =>
        a.headOption match {
          case Some(rv: JsRegexVal) =>
            val mt = rv.p.matcher(s)
            (if (mt.find()) mt.start() else -1).toDouble
          case other => throw new IllegalStateException(
            s".search needs a regex literal, got $other")
        }
      case "replace" => // JS: first occurrence only (literal)
        val find = toStr(a.head)
        val ix = s.indexOf(find)
        if (ix < 0 || find.isEmpty) s
        else s.substring(0, ix) + toStr(a(1)) + s.substring(ix + find.length)
      case "replaceAll" =>
        val find = toStr(a.head)
        if (find.isEmpty) s else s.replace(find, toStr(a(1)))
      case "split" if a.headOption.exists(_.isInstanceOf[JsRegexVal]) =>
        val parts = a.head.asInstanceOf[JsRegexVal].p.split(s, -1)
        scala.collection.mutable.ArrayBuffer[Any](parts.toSeq: _*)
      case "split" =>
        val sep = toStr(a.head)
        val parts: Seq[String] =
          if (sep.isEmpty) s.map(_.toString)
          else {
            // literal split, JS semantics (keep empty fields)
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var rest = s
            var ix = rest.indexOf(sep)
            while (ix >= 0) {
              out += rest.substring(0, ix)
              rest = rest.substring(ix + sep.length)
              ix = rest.indexOf(sep)
            }
            out += rest
            out.toSeq
          }
        scala.collection.mutable.ArrayBuffer[Any](parts: _*)
      case "concat"   => s + a.map(toStr).mkString
      case "toString" => s
      case other => throw new IllegalStateException(s"unsupported string method .$other")
    }

    def arrayMethod(arr: scala.collection.mutable.ArrayBuffer[Any], m: String,
                    a: List[Any]): Any = m match {
      case "push"     => a.foreach(arr += _); arr.length.toDouble
      case "pop"      => if (arr.isEmpty) null else arr.remove(arr.length - 1)
      case "join"     => arr.map(toStr).mkString(a.headOption.map(toStr).getOrElse(","))
      case "indexOf"  => arr.indexWhere(v => jsEq(v, a.head)).toDouble
      case "includes" => arr.exists(v => jsEq(v, a.head))
      case "slice" =>
        def norm(k: Int) = if (k < 0) math.max(0, arr.length + k) else math.min(k, arr.length)
        val from = a.headOption.map(x => norm(toNum(x).toInt)).getOrElse(0)
        val to = a.lift(1).map(x => norm(toNum(x).toInt)).getOrElse(arr.length)
        scala.collection.mutable.ArrayBuffer[Any](arr.slice(from, to).toSeq: _*)
      case "concat" =>
        val out = scala.collection.mutable.ArrayBuffer[Any](arr.toSeq: _*)
        a.foreach {
          case more: scala.collection.mutable.ArrayBuffer[Any] @unchecked => out ++= more
          case one => out += one
        }
        out
      case "reverse" => val r = arr.reverse; arr.clear(); arr ++= r; arr
      // higher-order methods: the callback is a closure value, invoked
      // through the same budgeted/depth-guarded call machinery
      case "map" | "filter" | "forEach" | "some" | "every" |
           "find" | "findIndex" | "reduce" =>
        val cb = a.headOption match {
          case Some(cl: Closure) => cl
          case other => throw new IllegalStateException(
            s".$m needs a function argument, got " +
              other.map(v => Option(v).map(_.getClass.getSimpleName)
                .getOrElse("null")).getOrElse("nothing"))
        }
        def call1(v: Any, ix: Int): Any =
          callClosure(cb, Seq(v, ix.toDouble, arr))
        m match {
          case "map" =>
            val out = scala.collection.mutable.ArrayBuffer.empty[Any]
            arr.zipWithIndex.foreach { case (v, ix) => out += call1(v, ix) }
            out
          case "filter" =>
            val out = scala.collection.mutable.ArrayBuffer.empty[Any]
            arr.zipWithIndex.foreach { case (v, ix) =>
              if (truthy(call1(v, ix))) out += v }
            out
          case "forEach" =>
            arr.zipWithIndex.foreach { case (v, ix) => call1(v, ix) }; null
          case "some" =>
            arr.zipWithIndex.exists { case (v, ix) => truthy(call1(v, ix)) }
          case "every" =>
            arr.zipWithIndex.forall { case (v, ix) => truthy(call1(v, ix)) }
          case "find" =>
            arr.zipWithIndex.find { case (v, ix) => truthy(call1(v, ix)) }
              .map(_._1).orNull
          case "findIndex" =>
            arr.zipWithIndex.indexWhere { case (v, ix) => truthy(call1(v, ix)) }
              .toDouble
          case "reduce" =>
            // JS: with an initial value the callback sees every element;
            // without one the first element seeds the accumulator
            var (acc, start) = a.lift(1) match {
              case Some(init) => (init, 0)
              case None =>
                if (arr.isEmpty) throw new IllegalStateException(
                  "reduce of empty array with no initial value")
                (arr(0), 1)
            }
            var ix = start
            while (ix < arr.length) {
              acc = callClosure(cb, Seq(acc, arr(ix), ix.toDouble, arr))
              ix += 1
            }
            acc
        }
      case other => throw new IllegalStateException(s"unsupported array method .$other")
    }

    try {
      seedTdz(lexNames(c.body), global)
      if (c.isGen) {
        // a top-level generator UDF: run eagerly, return the yields as an
        // array (the declared ARRAY return type does the element coercion)
        curSink = scala.collection.mutable.ArrayBuffer.empty[Any]
        try { c.body.foreach(evalSt(_, global)) }
        catch { case ReturnEx(_) => () }
        denormalize(new JsGenerator(curSink))
      } else {
        try { c.body.foreach(evalSt(_, global)); null }
        catch { case ReturnEx(v) => denormalize(v) }
      }
    } catch {
      // the depth cap guards CALL nesting; a single pathologically deep
      // expression tree can still exhaust the JVM stack — surface it as
      // the same loud, catchable-by-nothing failure instead of an Error
      // unwinding through the task
      case _: StackOverflowError => throw new IllegalStateException(
        s"JS UDF '${c.name}' overflowed the JVM stack " +
          "(deeply nested expressions?)")
    }
  }

  // ---------- Spark registration ----------

  /** Registers a compiled body as a session scalar UDF of the declared
    * return DataType (the Java-UDF interface takes boxed Objects, which
    * matches the interpreter's dynamic values). */
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
               c: Compiled, dt: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.api.java._
    def out(v: Any): Any = coerce(v, dt)
    c.params.length match {
      case 0 => spark.udf.register(name, new UDF0[Any] {
        override def call(): Any = out(c.eval(Nil)) }, dt)
      case 1 => spark.udf.register(name, new UDF1[Any, Any] {
        override def call(a: Any): Any = out(c.eval(Seq(a))) }, dt)
      case 2 => spark.udf.register(name, new UDF2[Any, Any, Any] {
        override def call(a: Any, b: Any): Any = out(c.eval(Seq(a, b))) }, dt)
      case 3 => spark.udf.register(name, new UDF3[Any, Any, Any, Any] {
        override def call(a: Any, b: Any, x: Any): Any =
          out(c.eval(Seq(a, b, x))) }, dt)
      case 4 => spark.udf.register(name, new UDF4[Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, x: Any, y: Any): Any =
          out(c.eval(Seq(a, b, x, y))) }, dt)
      case 5 => spark.udf.register(name, new UDF5[Any, Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, x: Any, y: Any, z: Any): Any =
          out(c.eval(Seq(a, b, x, y, z))) }, dt)
      case 6 => spark.udf.register(name, new UDF6[Any, Any, Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, x: Any, y: Any, z: Any, w: Any): Any =
          out(c.eval(Seq(a, b, x, y, z, w))) }, dt)
      case n => throw new UnsupportedOperationException(
        s"interpreted JS UDFs support up to 6 arguments, got $n")
    }
  }

  /** interpreter value → the declared Spark return type. */
  private def coerce(v: Any, dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    if (v == null) return null
    dt match {
      case LongType    => toNum(v).toLong
      case IntegerType => toNum(v).toInt
      case ShortType   => toNum(v).toShort
      case ByteType    => toNum(v).toByte
      case DoubleType  => toNum(v)
      case FloatType   => toNum(v).toFloat
      case BooleanType => truthy(v)
      case StringType  => toStr(v)
      case TimestampType => v match {
        case d: JsDate => new java.sql.Timestamp(d.ms.toLong)
        // ISO string → epoch, UTC-pinned (the reference coerces string
        // returns to the declared TIMESTAMP the same way —
        // JavascriptUserDefinedFunctionTest.testTimestampReturnType)
        case s: String => new java.sql.Timestamp(parseIsoMs(s))
        case other     => new java.sql.Timestamp(toNum(other).toLong)
      }
      case DateType => v match {
        case d: JsDate => new java.sql.Date(d.ms.toLong)
        case s: String => new java.sql.Date(parseIsoMs(s))
        case other     => new java.sql.Date(toNum(other).toLong)
      }
      case ArrayType(et, _) =>
        (v match {
          case a: scala.collection.mutable.ArrayBuffer[_] => a.toSeq
          // a WKT "POINT (x y)" string for a declared GEO_POINT
          // (= ARRAY<DOUBLE>) — the reference's GeoPointType implicit
          // cast accepts WKT (JavascriptUserDefinedFunctionTest
          // .testGeoTypeReturnTypeWithWKT)
          case s: String if et == DoubleType &&
              s.trim.toUpperCase.startsWith("POINT") =>
            val m = java.util.regex.Pattern
              .compile("(?i)POINT\\s*\\(\\s*(\\S+)\\s+(\\S+)\\s*\\)")
              .matcher(s.trim)
            if (!m.matches()) throw new IllegalStateException(
              s"unparseable WKT point '$s' for a GEO_POINT return")
            Seq(m.group(1).toDouble, m.group(2).toDouble)
          case s: scala.collection.Seq[_] => s.toSeq
          case one => Seq(one)
        }).map(x => coerce(x, et))
      case _: DecimalType => v match {
        // a numeric STRING keeps full precision (the reference's
        // NumericType cast of "123456789.123456789" is exact —
        // PolyglotValuesTest numbers case); doubles go through toNum
        case s: String => BigDecimal(s.trim)
        case other     => BigDecimal(toNum(other))
      }
      case MapType(kt, vt, _) =>
        (v match {
          case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
            m.toSeq
          case _ => Seq.empty[(String, Any)]
        }).map { case (k, x) => coerce(k, kt) -> coerce(x, vt) }.toMap
      case st: StructType => v match {
        // typed OBJECT return (RETURNS OBJECT AS (…) → STRUCT): fields
        // resolve by name, missing keys are null
        case m: scala.collection.mutable.LinkedHashMap[String, Any] @unchecked =>
          org.apache.spark.sql.Row(
            st.fields.map(f => coerce(m.getOrElse(f.name, null), f.dataType))
              .toSeq: _*)
        case other => throw new IllegalStateException(
          "a STRUCT-returning JS UDF must return an object, got " +
            other.getClass.getSimpleName)
      }
      case _ => v
    }
  }

  /** Spark input value → interpreter value (numbers become doubles,
    * arrays become mutable buffers). */
  private def normalize(v: Any): Any = v match {
    case null         => null
    case d: Double    => d
    case f: Float     => f.toDouble
    case l: Long      => l.toDouble
    case i: Int       => i.toDouble
    case s: Short     => s.toDouble
    case b: Byte      => b.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case d: scala.math.BigDecimal => d.toDouble
    case b: Boolean   => b
    case s: String    => s
    case t: java.sql.Timestamp => JsDate(t.getTime.toDouble)
    case d: java.sql.Date      => JsDate(d.getTime.toDouble)
    case i: java.time.Instant  => JsDate(i.toEpochMilli.toDouble)
    case d: java.time.LocalDate =>
      JsDate(d.atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli.toDouble)
    case seq: scala.collection.Seq[_] =>
      scala.collection.mutable.ArrayBuffer[Any](seq.map(normalize).toSeq: _*)
    case arr: Array[_] =>
      scala.collection.mutable.ArrayBuffer[Any](arr.map(normalize).toSeq: _*)
    // OBJECT-typed arguments (reference: plain JS objects in the body —
    // `a.y`, `a["x"]`): Spark MAP values and STRUCT Rows both arrive as
    // the interpreter's object shape
    case m: scala.collection.Map[_, _] =>
      val lm = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      m.foreach { case (k, x) => lm(toStr(normalize(k))) = normalize(x) }
      lm
    case r: org.apache.spark.sql.Row =>
      val lm = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      if (r.schema != null)
        r.schema.fieldNames.zipWithIndex.foreach { case (n, ix) =>
          lm(n) = normalize(r.get(ix))
        }
      lm
    case other => other
  }

  /** interpreter value → plain JVM value for Spark's Row conversion;
    * the registered UDF's declared DataType does the final cast. */
  private def denormalize(v: Any): Any = v match {
    case a: scala.collection.mutable.ArrayBuffer[_] => a.map(denormalize).toSeq
    case g: JsGenerator => g.drain().map(denormalize)
    case _: Closure => throw new IllegalStateException(
      "JS UDF returned a function — return a serializable value instead")
    case _: JsClass => throw new IllegalStateException(
      "JS UDF returned a class — return a serializable value instead")
    case _: JsRegexVal => throw new IllegalStateException(
      "JS UDF returned a regex — return a serializable value instead")
    case other => other
  }
}
