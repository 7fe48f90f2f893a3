package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's regexp scalar family (scalar/regex/
  * RegexpReplaceFunction.java, RegexpPositionFunction.java,
  * RegexpCountFunction.java) — three behaviors Spark's natives miss:
  *
  *  - regexp_replace(src, pattern, repl[, flags]): WITHOUT 'g' the
  *    reference replaces the FIRST match only (PG semantics); Spark's
  *    native always replaces all. Flags are the PG set
  *    (i u U s m x d + g/space), unknown flags LOUD with the
  *    reference's message (RegexpFlags.parseFlags).
  *  - regexp_instr(src, pattern[, start[, N[, endoption[, flags
  *    [, subexpr]]]]]): the PG 7-arg form — Spark's native third arg is
  *    a GROUP index, the reference's is the 1-based start position.
  *    0 on no match; loud on start<1, N<1, endoption∉{0,1}, subexpr<0;
  *    subexpr beyond the group count yields 0 (reference behavior).
  *  - regexp_count(src, pattern[, start[, flags]]): counting from a
  *    1-based start; start<1 loud; start past the end → 0; the 'g'
  *    flag is rejected ("The regular expression flag is unknown: g").
  *
  * All STRICTNULL (any null argument → null). Patterns compile per
  * (pattern, flags) with a single-slot thread cache — plan literals in
  * practice. Map-only scalars; eval-only (CodegenFallback) for the
  * variadic forms, which keeps the expression usable inside
  * whole-stage-codegen'd projections via the fallback boundary. */
object GraftRegexpFns {

  /** RegexpFlags.parseFlags, verbatim: unknown flag is LOUD. */
  def parseFlags(flags: String): Int = {
    var f = 0
    if (flags == null) return f
    var i = 0
    while (i < flags.length) {
      flags.charAt(i) match {
        case 'i' => f |= java.util.regex.Pattern.CASE_INSENSITIVE
        case 'u' => f |= java.util.regex.Pattern.UNICODE_CASE
        case 'U' => f |= java.util.regex.Pattern.UNICODE_CHARACTER_CLASS
        case 's' => f |= java.util.regex.Pattern.DOTALL
        case 'm' => f |= java.util.regex.Pattern.MULTILINE
        case 'x' => f |= java.util.regex.Pattern.COMMENTS
        case 'd' => f |= java.util.regex.Pattern.UNIX_LINES
        case ' ' | 'g' => // 'g' handled by isGlobal
        case other => throw new IllegalArgumentException(
          s"The regular expression flag is unknown: $other")
      }
      i += 1
    }
    f
  }

  def isGlobal(flags: String): Boolean =
    flags != null && flags.indexOf('g') >= 0

  /** Per-thread bounded LRU keyed by (pattern, flags) — a single slot
    * thrashed (full recompile per row) whenever a projection evaluated
    * two+ patterns per row, e.g. the q271 CASE arms (ADVICE r15). */
  private val patCache =
    new ThreadLocal[java.util.LinkedHashMap[(String, String), java.util.regex.Pattern]] {
      override def initialValue() =
        new java.util.LinkedHashMap[(String, String), java.util.regex.Pattern](32, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[(String, String), java.util.regex.Pattern]): Boolean =
            size() > 16
        }
    }

  def compiled(pattern: String, flags: String): java.util.regex.Pattern = {
    val m = patCache.get()
    val k = (pattern, flags)
    val hit = m.get(k)
    if (hit != null) hit
    else {
      val p = java.util.regex.Pattern.compile(pattern, parseFlags(flags))
      m.put(k, p)
      p
    }
  }

  def replace(src: UTF8String, pattern: UTF8String, repl: UTF8String,
              flags: UTF8String): UTF8String = {
    val f = if (flags == null) "" else flags.toString
    val m = compiled(pattern.toString, f).matcher(src.toString)
    UTF8String.fromString(
      if (isGlobal(f)) m.replaceAll(repl.toString)
      else m.replaceFirst(repl.toString))
  }
}

/** `regexp_replace(src, pattern, repl[, flags])` — reference PG
  * semantics (first match unless 'g'). Codegen'd via the static
  * helper. */
case class GraftRegexpReplaceExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size == 3 || children.size == 4,
    "regexp_replace takes 3 or 4 arguments")
  override def prettyName: String = "graft_regexp_replace"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(e =>
        e.dataType == StringType || e.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments")
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    GraftRegexpFns.replace(vs(0).asInstanceOf[UTF8String],
      vs(1).asInstanceOf[UTF8String], vs(2).asInstanceOf[UTF8String],
      if (vs.size == 4) vs(3).asInstanceOf[UTF8String] else null)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `regexp_instr(src, pattern[, start[, N[, endoption[, flags
  * [, subexpr]]]]])` — the reference's PG position contract. ONE
  * deliberate graceful divergence: a start past the end of the string
  * returns 0 here, where the reference lets Java Matcher.find(start)
  * raise its raw IndexOutOfBoundsException. */
case class GraftRegexpInstrExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size >= 2 && children.size <= 7,
    "regexp_instr takes 2 to 7 arguments")
  override def prettyName: String = "regexp_instr"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  private def asInt(x: Any): Int = x.asInstanceOf[Number].intValue()
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val value = vs(0).asInstanceOf[UTF8String].toString
    val pattern = vs(1).asInstanceOf[UTF8String].toString
    var startPosition = 0
    if (vs.size >= 3) {
      startPosition = asInt(vs(2))
      if (startPosition < 1)
        throw new IllegalArgumentException("start must be >= 1")
      startPosition -= 1
    }
    var n = 1
    if (vs.size >= 4) {
      n = asInt(vs(3))
      if (n < 1) throw new IllegalArgumentException("N must be >= 1")
    }
    var endOption = 0
    if (vs.size >= 5) {
      endOption = asInt(vs(4))
      if (endOption != 0 && endOption != 1)
        throw new IllegalArgumentException(
          "endoption needs to be set to 0 or 1")
    }
    val flags = if (vs.size >= 6) vs(5).asInstanceOf[UTF8String].toString
      else ""
    var subexpr = 0
    if (vs.size == 7) {
      subexpr = asInt(vs(6))
      if (subexpr < 0)
        throw new IllegalArgumentException("subexpr must not be negative")
    }
    val m = GraftRegexpFns.compiled(pattern, flags).matcher(value)
    var result = 0
    if (startPosition <= value.length && m.find(startPosition)) {
      var continue = true
      while (continue) {
        n -= 1
        if (n == 0) {
          if (subexpr <= m.groupCount())
            result = 1 + (if (endOption == 0) m.start(subexpr)
                          else m.end(subexpr))
          continue = false
        } else continue = m.find()
      }
    }
    result
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `regexp_count(src, pattern[, start[, flags]])` — the reference's
  * count-from-start contract; 'g' rejected like the reference. */
case class GraftRegexpCountExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size >= 2 && children.size <= 4,
    "regexp_count takes 2 to 4 arguments")
  override def prettyName: String = "regexp_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val value = vs(0).asInstanceOf[UTF8String].toString
    val pattern = vs(1).asInstanceOf[UTF8String].toString
    var startIndex = 0
    if (vs.size >= 3) {
      val start = vs(2).asInstanceOf[Number].intValue()
      if (start < 1)
        throw new IllegalArgumentException(
          "`start` must be greater than or equal to 1")
      startIndex = start - 1
    }
    if (startIndex >= value.length) return 0
    val flags = if (vs.size == 4) vs(3).asInstanceOf[UTF8String].toString
      else null
    if (GraftRegexpFns.isGlobal(flags))
      throw new IllegalArgumentException(
        "The regular expression flag is unknown: g")
    val m = GraftRegexpFns.compiled(pattern,
      if (flags == null) "" else flags).matcher(value)
    var count = 0
    if (m.find(startIndex)) {
      count = 1
      while (m.find()) count += 1
    }
    count
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
