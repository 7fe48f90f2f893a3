package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's regex-match operators `~` / `~*`
  * (expression/operator/RegexpMatchOperator.java:80 and
  * RegexpMatchCaseInsensitiveOperator.java:63), which graft previously
  * approximated with Spark `rlike` — WRONG twice over: rlike is a
  * substring FIND, while both reference operators anchor a FULL-string
  * match, and the reference's case-sensitive operator doesn't even run
  * java.util.regex unless the pattern uses PCRE features:
  *
  *  - `~` inspects the pattern (RegexpFlags.isPcrePattern): if it
  *    contains PCRE escapes (\d \D \s \S \w \W \b \B \A \G \Z \z) or
  *    starts with an embedded flag group ((?i) …), it runs
  *    `source.matches(pattern)`; OTHERWISE the pattern is LUCENE RegExp
  *    syntax (RegExp.ALL | DEPRECATED_COMPLEMENT): `|` union, `&`
  *    intersection, `~x` complement, `<m-n>` numeric interval, `@`
  *    any-string, `#` empty-language, `"…"` quoted literal, plus the
  *    usual `. ? * + {m,n} [..] (..)` — matched against the WHOLE
  *    string. So `'abc' ~ 'b'` is FALSE (rlike says true) and
  *    `'abc' ~ 'a~bc'` is FALSE ('~' is an operator, not a literal).
  *  - `~*` compiles java.util.regex with CASE_INSENSITIVE|UNICODE_CASE
  *    and uses `.matches()` (full match) — no Lucene branch.
  *
  * The Lucene branch is re-expressed as a recursive-descent parse into
  * a small AST plus a memoized interval dynamic program ("does
  * s[i,j) ∈ L(node)") — complement and intersection are trivial under
  * DP where automata would need determinize/complement; a completely
  * different algorithm from Lucene's automaton compiler, chosen because
  * catalog strings are short and patterns are plan literals. The parsed
  * AST is cached per pattern (patterns are almost always literals), so
  * the per-row cost is the DP alone. Scale: map-only scalar — no
  * shuffle, distributes like any projection. */
object GraftRegexp {

  /** RegexpFlags.isPcrePattern, verbatim semantics: PCRE escape
    * sequences anywhere, or an embedded flag group at the start. */
  private val PcrePattern = java.util.regex.Pattern.compile(
    ".*\\\\[dDsSwWbBAGZz].*|^\\(\\?[idmsuxU]\\).*")

  def isPcrePattern(p: String): Boolean = PcrePattern.matcher(p).matches()

  // ---------- Lucene RegExp AST ----------
  // Node ids are assigned PER AST by a numbering walk after parse
  // (`number` below), starting at 4; the four singletons own the
  // reserved ids -1..-4, mapped to memo-key slots 0..3. A global
  // counter packed into the 16-bit memo-key id field aliased once it
  // wrapped 65536 — easy to reach when a projection alternates
  // patterns and re-parses — silently cross-contaminating memo results
  // between nodes (ADVICE r15). Per-AST numbering is bounded by the
  // pattern's own node count and loud past the 16-bit field.
  // Lit/Cls/Str carry CODE POINTS, not UTF-16 units: the reference
  // runs its automaton over code points, so '.' matches one non-BMP
  // character (a surrogate pair), and the DP must agree.
  private sealed trait Rx { var id: Int = 0 }
  private case class Lit(c: Int) extends Rx
  private case object AnyChar extends Rx { id = -1 }
  private case object AnyString extends Rx { id = -2 }
  private case object EmptyLang extends Rx { id = -3 }
  private case object Eps extends Rx { id = -4 }
  private case class Str(cps: Vector[Int]) extends Rx
  private case class Cls(neg: Boolean, ranges: Vector[(Int, Int)]) extends Rx
  private case class Cat(xs: Vector[Rx]) extends Rx
  private case class Or(a: Rx, b: Rx) extends Rx
  private case class And(a: Rx, b: Rx) extends Rx
  private case class Not(x: Rx) extends Rx
  private case class Rep(x: Rx, min: Int, max: Int) extends Rx // max -1 = inf
  private case class Interval(min: Long, max: Long, digits: Int) extends Rx

  /** Assign memo ids 4.. depth-first (singletons keep their reserved
    * negatives); returns the next free id. */
  private def number(r: Rx, n0: Int): Int = r match {
    case AnyChar | AnyString | EmptyLang | Eps => n0
    case _ =>
      r.id = n0
      r match {
        case Cat(xs)       => xs.foldLeft(n0 + 1)((n, x) => number(x, n))
        case Or(a, b)      => number(b, number(a, n0 + 1))
        case And(a, b)     => number(b, number(a, n0 + 1))
        case Not(x)        => number(x, n0 + 1)
        case Rep(x, _, _)  => number(x, n0 + 1)
        case _             => n0 + 1 // Lit / Str / Cls / Interval
      }
  }

  private def bad(p: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"Invalid regular expression [$p]: $why")

  /** Recursive-descent parser over the public Lucene RegExp grammar
    * (union > intersection > concat > repeat > complement > atoms). */
  private final class Parser(p: String) {
    private var pos = 0
    private def more: Boolean = pos < p.length
    private def peek: Char = p.charAt(pos)
    private def next(): Char = { val c = p.charAt(pos); pos += 1; c }
    /** Consume one full CODE POINT — for literal contexts (Lit, class
      * bounds, quoted strings), where a non-BMP character is one
      * symbol, not two surrogate units. Operator dispatch stays on
      * chars: every grammar operator is ASCII, and a high surrogate
      * simply falls through to the literal case. */
    private def nextCp(): Int = {
      val c = p.codePointAt(pos); pos += Character.charCount(c); c
    }
    private def expect(c: Char): Unit =
      if (!more || next() != c) bad(p, s"expected '$c'")

    def parse(): Rx = {
      val r = union()
      if (more) bad(p, s"unexpected '${peek}' at $pos")
      r
    }

    private def union(): Rx = {
      val a = inter()
      if (more && peek == '|') { next(); Or(a, union()) } else a
    }

    private def inter(): Rx = {
      val a = concat()
      if (more && peek == '&') { next(); And(a, inter()) } else a
    }

    private def concat(): Rx = {
      val xs = Vector.newBuilder[Rx]
      var n = 0
      while (more && peek != '|' && peek != '&' && peek != ')') {
        xs += repeat(); n += 1
      }
      val v = xs.result()
      if (n == 0) Eps else if (n == 1) v.head else Cat(v)
    }

    private def repeat(): Rx = {
      var x = complement()
      var go = true
      while (go && more) peek match {
        case '?' => next(); x = Rep(x, 0, 1)
        case '*' => next(); x = Rep(x, 0, -1)
        case '+' => next(); x = Rep(x, 1, -1)
        case '{' =>
          next()
          val sb = new StringBuilder
          while (more && peek != '}' && peek != ',') sb.append(next())
          val mn = try sb.toString.toInt
            catch { case _: NumberFormatException => bad(p, "bad {m,n}") }
          var mx = mn
          if (more && peek == ',') {
            next()
            if (more && peek == '}') mx = -1
            else {
              val sb2 = new StringBuilder
              while (more && peek != '}') sb2.append(next())
              mx = try sb2.toString.toInt
                catch { case _: NumberFormatException => bad(p, "bad {m,n}") }
            }
          }
          expect('}')
          if (mx != -1 && mx < mn) bad(p, "bad {m,n} bounds")
          x = Rep(x, mn, mx)
        case _ => go = false
      }
      x
    }

    private def complement(): Rx =
      if (more && peek == '~') { next(); Not(complement()) } else charClass()

    private def charClass(): Rx =
      if (more && peek == '[') {
        next()
        val neg = more && peek == '^'
        if (neg) next()
        val rs = Vector.newBuilder[(Int, Int)]
        var first = true
        while (more && (peek != ']' || first)) {
          first = false
          val lo = if (peek == '\\') { next(); nextCp() } else nextCp()
          if (more && peek == '-' && pos + 1 < p.length &&
              p.charAt(pos + 1) != ']') {
            next()
            val hi = if (peek == '\\') { next(); nextCp() } else nextCp()
            rs += ((lo, hi))
          } else rs += ((lo, lo))
        }
        expect(']')
        Cls(neg, rs.result())
      } else simple()

    private def simple(): Rx = {
      if (!more) bad(p, "unexpected end")
      peek match {
        case '.' => next(); AnyChar
        case '@' => next(); AnyString
        case '#' => next(); EmptyLang
        case '"' =>
          next()
          val b = Vector.newBuilder[Int]
          while (more && peek != '"') b += nextCp()
          expect('"')
          Str(b.result())
        case '(' =>
          next()
          if (more && peek == ')') { next(); Eps }
          else { val r = union(); expect(')'); r }
        case '<' =>
          next()
          val sb = new StringBuilder
          while (more && peek != '-') sb.append(next())
          expect('-')
          val sb2 = new StringBuilder
          while (more && peek != '>') sb2.append(next())
          expect('>')
          val (lo, hi) = (sb.toString, sb2.toString)
          val (mn, mx) =
            try (lo.toLong, hi.toLong)
            catch { case _: NumberFormatException => bad(p, "bad <m-n>") }
          if (mn > mx) bad(p, "bad <m-n> bounds")
          // Lucene makeDecimalInterval: a bound written with leading
          // zeros (or equal-width bounds) pins the digit count
          val digits =
            if (lo.length == hi.length || lo.startsWith("0")) lo.length else 0
          Interval(mn, mx, digits)
        case ')' | ']' | '}' | '|' | '&' | '?' | '*' | '+' =>
          bad(p, s"unexpected '$peek' at $pos")
        case '\\' => next(); if (!more) bad(p, "dangling escape"); Lit(nextCp())
        case _ => Lit(nextCp())
      }
    }
  }

  /** Memoized interval DP over CODE POINTS: does cp[i,j) belong to
    * L(node)? Memo capped so an adversarial pattern fails loudly
    * instead of consuming the executor; sources past the key field's
    * 16-bit index range fail loudly too (silent key truncation
    * corrupted matches on >65535-char sources before — ADVICE r15;
    * ordinary long-document patterns ride the java fast path and
    * never reach here). */
  private final class Matcher(s: String, pattern: String) {
    private val cp: Array[Int] = s.codePoints().toArray
    if (cp.length > 0xffff)
      bad(pattern, "source longer than 65535 code points not supported" +
        " for Lucene-interval matching")
    private val memo = new java.util.HashMap[Long, java.lang.Boolean]()
    // id slots: singletons -1..-4 → 0..3; numbered nodes start at 4
    // (see `number`) and are guarded against the 16-bit field at parse
    private def key(id: Int, i: Int, j: Int, extra: Int): Long = {
      val nid = if (id < 0) -1 - id else id
      ((nid & 0xffffL) << 48) | ((extra & 0xffffL) << 32) |
        ((i & 0xffffL) << 16) | (j & 0xffffL)
    }
    private def checkBudget(): Unit =
      if (memo.size > 500000)
        bad(pattern, "pattern too complex for interval matching")

    def matches(r: Rx): Boolean = m(r, 0, cp.length)

    private def m(r: Rx, i: Int, j: Int): Boolean = {
      val k = key(r.id, i, j, 0)
      val cached = memo.get(k)
      if (cached != null) return cached.booleanValue()
      checkBudget()
      val res: Boolean = r match {
        case Lit(c)     => j == i + 1 && cp(i) == c
        case AnyChar    => j == i + 1
        case AnyString  => true
        case EmptyLang  => false
        case Eps        => i == j
        case Str(t) =>
          j - i == t.length && {
            var ok = true; var x = 0
            while (ok && x < t.length) { ok = cp(i + x) == t(x); x += 1 }
            ok
          }
        case Cls(neg, rs) =>
          j == i + 1 && {
            val c = cp(i)
            val in = rs.exists { case (lo, hi) => c >= lo && c <= hi }
            in != neg
          }
        case Or(a, b)  => m(a, i, j) || m(b, i, j)
        case And(a, b) => m(a, i, j) && m(b, i, j)
        case Not(x)    => !m(x, i, j)
        case Cat(xs)   => seq(xs, 0, i, j)
        case Rep(x, mn, mx) => rep(x, i, j, mn, mx)
        case Interval(mn, mx, digits) =>
          val len = j - i
          len > 0 && len <= 18 && {
            var ok = true
            var t = i
            while (ok && t < j) { ok = cp(t) >= '0' && cp(t) <= '9'; t += 1 }
            ok && (if (digits > 0) len == digits
                   else len == 1 || cp(i) != '0') && {
              var v = 0L
              var d = i
              while (d < j) { v = v * 10 + (cp(d) - '0'); d += 1 }
              v >= mn && v <= mx
            }
          }
      }
      memo.put(k, res)
      res
    }

    private def seq(xs: Vector[Rx], idx: Int, i: Int, j: Int): Boolean = {
      if (idx == xs.length) return i == j
      if (idx == xs.length - 1) return m(xs(idx), i, j)
      // memoize only while the idx tag fits its key slot (0x7000+idx
      // must stay below 0x8000); correctness never depends on the memo
      val memoizable = idx < 0x1000
      val k = if (memoizable) key(xs(idx).id, i, j, 0x7000 + idx) else 0L
      if (memoizable) {
        val cached = memo.get(k)
        if (cached != null) return cached.booleanValue()
        checkBudget()
      }
      var split = i
      var res = false
      while (!res && split <= j) {
        res = m(xs(idx), i, split) && seq(xs, idx + 1, split, j)
        split += 1
      }
      if (memoizable) memo.put(k, res)
      res
    }

    private def rep(x: Rx, i: Int, j: Int, mn: Int, mx: Int): Boolean = {
      if (i == j) return mn == 0 || m(x, i, i)
      if (mx == 0) return false // non-empty remainder, no reps left
      // the key carries the EXACT residual bounds (63 means unbounded,
      // reserved); larger finite bounds skip the memo rather than
      // alias with each other or with unbounded (ADVICE r15)
      val memoizable = mn <= 62 && (mx == -1 || mx <= 62)
      val k = if (memoizable)
        key(x.id, i, j, 0x1000 | (mn << 6) | (if (mx == -1) 63 else mx))
      else 0L
      if (memoizable) {
        val cached = memo.get(k)
        if (cached != null) return cached.booleanValue()
        checkBudget()
      }
      var split = i + 1 // first chunk non-empty: guarantees progress
      var res = false
      val mx2 = if (mx < 0) -1 else mx - 1
      while (!res && split <= j) {
        res = m(x, i, split) && rep(x, split, j, math.max(0, mn - 1), mx2)
        split += 1
      }
      if (memoizable) memo.put(k, res)
      res
    }
  }

  /** Small bounded per-thread LRU for per-pattern compiled artifacts.
    * A single-slot cache thrashed whenever a projection evaluated two+
    * patterns per row (the q269/q271 CASE shapes re-parsed or
    * re-compiled every row — ADVICE r15); 16 slots cover any realistic
    * projection's pattern set with zero sharing between task threads. */
  private final class PatternLru[V <: AnyRef](cap: Int = 16) {
    private val tl = new ThreadLocal[java.util.LinkedHashMap[String, V]] {
      override def initialValue() =
        new java.util.LinkedHashMap[String, V](cap * 2, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, V]): Boolean = size() > cap
        }
    }
    def getOrCompute(p: String)(f: => V): V = {
      val m = tl.get()
      val hit = m.get(p)
      if (hit != null) hit
      else { val v = f; m.put(p, v); v }
    }
  }

  /** Per-thread AST cache: patterns are plan literals in practice, so
    * each task thread parses each distinct pattern once and replays
    * the numbered AST per row. */
  private val astCache = new PatternLru[Rx]()

  private def astOf(pattern: String): Rx =
    astCache.getOrCompute(pattern) {
      val ast = new Parser(pattern).parse()
      if (number(ast, 4) > 0xffff)
        bad(pattern, "pattern too complex for interval matching")
      ast
    }

  /** SCALE fast path: when the pattern uses none of Lucene RegExp's
    * extra operators (`~ & < @ # "`), no escapes, and no `^`/`$`
    * (LITERALS in Lucene, anchors in java.util.regex), the remaining
    * grammar (`| . ? * + {m,n} [..] (..)` + literal chars) means the
    * same language in both dialects — compile java.util.regex with
    * DOTALL (Lucene's `.` crosses newlines) and match LINEARLY instead
    * of paying the O(n²) interval DP per row. Long-document matching
    * (the 100 TB path) rides this branch for every ordinary pattern;
    * the DP handles the Lucene-only operators, which are bounded by
    * the memo budget and loud past it. */
  private def javaCompatible(p: String): Boolean = {
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      // '^' right after '[' is class negation — identical in both
      if (c == '^' && i > 0 && p.charAt(i - 1) == '[') ()
      else if (c == '~' || c == '&' || c == '<' || c == '>' || c == '@' ||
          c == '#' || c == '"' || c == '^' || c == '$' || c == '\\')
        return false
      else if (c == '{') {
        // java treats a malformed brace ('a{x}') as a LITERAL where
        // Lucene rejects it — only a well-formed {m[,n]} may fast-path
        var j = i + 1
        while (j < p.length && p.charAt(j) >= '0' && p.charAt(j) <= '9')
          j += 1
        if (j == i + 1) return false // no digits
        if (j < p.length && p.charAt(j) == ',') {
          j += 1
          while (j < p.length && p.charAt(j) >= '0' && p.charAt(j) <= '9')
            j += 1
        }
        if (j >= p.length || p.charAt(j) != '}') return false
      }
      i += 1
    }
    true
  }

  private val fastCache = new PatternLru[java.util.regex.Pattern]()

  /** `~` — full-string match; PCRE-feature patterns via java.util.regex,
    * everything else via the Lucene RegExp grammar. */
  def matches(source: UTF8String, pattern: UTF8String): Boolean = {
    val p = pattern.toString
    val s = source.toString
    if (isPcrePattern(p)) s.matches(p)
    else if (javaCompatible(p)) {
      val compiled = fastCache.getOrCompute(p) {
        try java.util.regex.Pattern.compile(p,
          java.util.regex.Pattern.DOTALL)
        catch { case e: java.util.regex.PatternSyntaxException =>
          // uniform loud contract with the Lucene-branch parser
          throw new IllegalArgumentException(
            s"Invalid regular expression [$p]: ${e.getDescription}")
        }
      }
      compiled.matcher(s).matches()
    }
    else new Matcher(s, p).matches(astOf(p))
  }

  /** Test seam: force the DP route (the fast path must agree with it
    * on the shared-syntax subset — gated in the conformance spec). */
  private[graft] def matchesDp(s: String, p: String): Boolean =
    new Matcher(s, p).matches(astOf(p))

  private val ciCache = new PatternLru[java.util.regex.Pattern]()

  /** `~*` — java.util.regex full match, CASE_INSENSITIVE|UNICODE_CASE. */
  def matchesCi(source: UTF8String, pattern: UTF8String): Boolean = {
    val p = pattern.toString
    val compiled = ciCache.getOrCompute(p) {
      java.util.regex.Pattern.compile(p,
        java.util.regex.Pattern.CASE_INSENSITIVE |
          java.util.regex.Pattern.UNICODE_CASE)
    }
    compiled.matcher(source.toString).matches()
  }
}

/** `graft_regexp_match(source, pattern)` (`~`) and
  * `graft_regexp_match_ci(source, pattern)` (`~*`) — strict null
  * (the reference operators return NULL on either null operand),
  * BOOLEAN, codegen'd. */
case class RegexpMatchOpExpr(left: Expression, right: Expression,
                             ci: Boolean = false)
    extends BinaryExpression {
  override def prettyName: String =
    if (ci) "graft_regexp_match_ci" else "graft_regexp_match"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e =>
        e.dataType == StringType || e.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments")
  override def nullSafeEval(a: Any, b: Any): Any =
    if (ci) GraftRegexp.matchesCi(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
    else GraftRegexp.matches(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (ci) "matchesCi" else "matches"
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.GraftRegexp.$fn($a, $b)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
