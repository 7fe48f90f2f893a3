package graft.plans

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.TextStyle
import java.time.temporal.{IsoFields, JulianFields, WeekFields}
import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** The reference's FULL PG `to_char` template engine
  * (expression/scalar/formatting/PGDateTimeTemplates.java +
  * ToCharFunction.java — round-15 depth; replaces the r4 common-subset
  * java.time shim, which could not express ordinal suffixes, lowercase
  * patterns, week/century/Julian tokens, or INTERVAL formatting).
  *
  * Re-expression notes (same observable semantics, different machinery):
  *  - the reference tokenizes with a character trie + backtrack to the
  *    deepest complete token; that is exactly longest-match, so this
  *    port scans with a length-sorted pattern table instead.
  *  - `"..."` quoted literals with backslash escapes, unmatched quote
  *    consuming the rest, per the reference's parse().
  *  - every numeric token remembers its value so a following TH/th
  *    renders the right ordinal suffix (11/12/13 → th); literals reset
  *    the memory to a plain "th", non-numeric tokens to "".
  *  - TZ/TZH/TZM/OF render NOTHING (the reference formats a LOCAL
  *    datetime and yields the non-numeric sentinel for zone tokens).
  *  - INTERVALs format as year-0 anchored datetimes
  *    (ToCharFunction.evaluateInterval: LocalDateTime.of(0,1,1) plus
  *    the period), so `interval '2 year'` → 'YYYY' = "0002".
  *  - HH/HH12 of a 0-hour renders "00" (the reference pads hour-12
  *    arithmetic without PG's 12-for-0 quirk) — ported faithfully.
  */
object PgToChar {

  private val WeekOfYear = WeekFields.of(Locale.ENGLISH).weekOfWeekBasedYear()

  private sealed trait Tok
  private final case class Lit(s: String) extends Tok
  private final case class Pat(p: String) extends Tok

  /** All template patterns, longest first so a plain scan is the
    * trie's longest-match (PGDateTimeTemplates.TemplatePattern). */
  private val patterns: Array[String] = Array(
    "Y,YYY", "y,yyy", "SSSSS", "sssss",
    "HH12", "hh12", "HH24", "hh24", "SSSS", "ssss", "IYYY", "iyyy",
    "YYYY", "yyyy", "IDDD", "iddd", "A.M.", "a.m.", "P.M.", "p.m.",
    "MONTH", "Month", "month",
    "YYY", "yyy", "IYY", "iyy", "FF1", "ff1", "FF2", "ff2", "FF3", "ff3",
    "FF4", "ff4", "FF5", "ff5", "FF6", "ff6", "MON", "Mon", "mon",
    "DAY", "Day", "day", "DDD", "ddd", "B.C", "b.c", "A.D", "a.d",
    "TZH", "tzh", "TZM", "tzm",
    "HH", "hh", "MI", "mi", "SS", "ss", "MS", "ms", "US", "us",
    "AM", "am", "PM", "pm", "YY", "yy", "IY", "iy", "BC", "bc",
    "AD", "ad", "MM", "mm", "DY", "Dy", "dy", "DD", "dd", "ID", "id",
    "WW", "ww", "IW", "iw", "CC", "cc", "RM", "rm", "TZ", "tz",
    "OF", "of", "TH", "th",
    "Y", "y", "I", "i", "D", "d", "W", "w", "J", "j", "Q", "q"
  ).sortBy(-_.length)

  private def parse(template: String): Array[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val lit = new StringBuilder
    def flushLit(): Unit =
      if (lit.nonEmpty) { out += Lit(lit.toString); lit.clear() }
    var i = 0
    while (i < template.length) {
      val c = template.charAt(i)
      if (c == '"') {
        // quoted literal: backslash escapes, unmatched quote takes rest
        flushLit()
        val sb = new StringBuilder
        var pos = i + 1
        var closed = false
        while (pos < template.length && !closed) {
          val q = template.charAt(pos)
          if (q == '\\' && pos + 1 < template.length) {
            sb.append(template.charAt(pos + 1)); pos += 2
          } else if (q == '"') { closed = true; pos += 1 }
          else { sb.append(q); pos += 1 }
        }
        out += Lit(sb.toString)
        i = pos
      } else {
        val hit = patterns.find(p => template.regionMatches(i, p, 0, p.length))
        hit match {
          case Some(p) => flushLit(); out += Pat(p); i += p.length
          case None    => lit.append(c); i += 1
        }
      }
    }
    flushLit()
    out.toArray
  }

  // per-thread bounded LRU of parsed templates (patterns are plan
  // literals in practice; 16 slots cover a projection's CASE arms)
  private val cache = new ThreadLocal[java.util.LinkedHashMap[String, Array[Tok]]] {
    override def initialValue() =
      new java.util.LinkedHashMap[String, Array[Tok]](32, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[Tok]]): Boolean = size() > 16
      }
  }
  private def parsed(t: String): Array[Tok] = {
    val m = cache.get()
    val hit = m.get(t)
    if (hit != null) hit else { val v = parse(t); m.put(t, v); v }
  }

  private val PrevLiteral = Long.MaxValue
  private val PrevNonNumeric = Long.MinValue

  private def pad0(sb: StringBuilder, v: Long, w: Int): Unit = {
    val s = String.valueOf(v)
    var k = w - s.length
    while (k > 0) { sb.append('0'); k -= 1 }
    sb.append(s)
  }
  private def padEnd(sb: StringBuilder, s: String, w: Int): Unit = {
    sb.append(s)
    var k = w - s.length
    while (k > 0) { sb.append(' '); k -= 1 }
  }
  /** zero-pad to at least 4, then take the last n (the reference's
    * Y/YY/YYY truncations) */
  private def last(v: Int, n: Int): String = {
    var s = String.valueOf(v)
    while (s.length < 4) s = "0" + s
    s.substring(s.length - n)
  }
  private def ordSuffix(prev: Long): String =
    if (prev == PrevLiteral) "th"
    else if (prev == PrevNonNumeric) ""
    else {
      val n = math.abs(prev)
      val m100 = n % 100
      if (m100 >= 11 && m100 <= 13) "th"
      else (n % 10) match {
        case 1 => "st"; case 2 => "nd"; case 3 => "rd"; case _ => "th"
      }
    }
  private def roman(n0: Int): String = {
    val ns = Array(10, 9, 5, 4, 1); val ss = Array("X", "IX", "V", "IV", "I")
    val sb = new StringBuilder; var n = n0
    var i = 0
    while (i < ns.length) { while (n >= ns(i)) { sb.append(ss(i)); n -= ns(i) }; i += 1 }
    sb.toString
  }
  private def capitalize(s: String): String =
    if (s.isEmpty) s else s.substring(0, 1).toUpperCase(Locale.ENGLISH) + s.substring(1)

  def format(dt: LocalDateTime, template: String): String = {
    val sb = new StringBuilder
    var prev = PrevLiteral
    for (tok <- parsed(template)) tok match {
      case Lit(s) => sb.append(s); prev = PrevLiteral
      case Pat(p) => prev = element(sb, p, dt, prev)
    }
    sb.toString
  }

  /** One pattern arm; returns the numeric value rendered (for TH), or a
    * sentinel (PGDateTimeTemplates.addElement). */
  private def element(sb: StringBuilder, p: String, dt: LocalDateTime,
                      prev: Long): Long = p match {
    case "HH" | "hh" | "HH12" | "hh12" =>
      val h = dt.getHour; val v = if (h >= 12) h - 12 else h
      pad0(sb, v, 2); v
    case "HH24" | "hh24" => pad0(sb, dt.getHour, 2); dt.getHour
    case "MI" | "mi"     => pad0(sb, dt.getMinute, 2); dt.getMinute
    case "SS" | "ss"     => pad0(sb, dt.getSecond, 2); dt.getSecond
    case "MS" | "ms"     => val v = dt.getNano / 1000000; pad0(sb, v, 3); v
    case "US" | "us"     => val v = dt.getNano / 1000; pad0(sb, v, 6); v
    case "FF1" | "ff1"   => val v = dt.getNano / 100000000; sb.append(v); v
    case "FF2" | "ff2"   => val v = dt.getNano / 10000000; sb.append(v); v
    case "FF3" | "ff3"   => val v = dt.getNano / 1000000; sb.append(v); v
    case "FF4" | "ff4"   => val v = dt.getNano / 100000; sb.append(v); v
    case "FF5" | "ff5"   => val v = dt.getNano / 10000; sb.append(v); v
    case "FF6" | "ff6"   => val v = dt.getNano / 1000; sb.append(v); v
    case "SSSS" | "ssss" | "SSSSS" | "sssss" =>
      val v = dt.toLocalTime.toSecondOfDay.toLong; sb.append(v); v
    case "AM" | "PM" => sb.append(if (dt.getHour >= 12) "PM" else "AM"); PrevNonNumeric
    case "am" | "pm" => sb.append(if (dt.getHour >= 12) "pm" else "am"); PrevNonNumeric
    case "A.M." | "P.M." =>
      sb.append(if (dt.getHour >= 12) "P.M." else "A.M."); PrevNonNumeric
    case "a.m." | "p.m." =>
      sb.append(if (dt.getHour >= 12) "p.m." else "a.m."); PrevNonNumeric
    case "Y,YYY" | "y,yyy" =>
      val s = String.valueOf(dt.getYear)
      sb.append(s.substring(0, 1)).append(',').append(s.substring(1))
      PrevNonNumeric
    case "YYYY" | "yyyy" => pad0(sb, dt.getYear, 4); dt.getYear
    case "YYY" | "yyy"   => sb.append(last(dt.getYear, 3)); dt.getYear
    case "YY" | "yy"     => sb.append(last(dt.getYear, 2)); dt.getYear
    case "Y" | "y"       => sb.append(last(dt.getYear, 1)); dt.getYear
    case "IYYY" | "iyyy" =>
      val v = dt.get(IsoFields.WEEK_BASED_YEAR); sb.append(v); v
    case "IYY" | "iyy" =>
      val v = dt.get(IsoFields.WEEK_BASED_YEAR); val s = String.valueOf(v)
      sb.append(s.substring(s.length - 3)); v
    case "IY" | "iy" =>
      val v = dt.get(IsoFields.WEEK_BASED_YEAR); val s = String.valueOf(v)
      sb.append(s.substring(s.length - 2)); v
    case "I" | "i" =>
      val v = dt.get(IsoFields.WEEK_BASED_YEAR); val s = String.valueOf(v)
      sb.append(s.substring(s.length - 1)); v
    case "BC" | "AD" =>
      sb.append(if (dt.getYear >= 1) "AD" else "BC"); PrevNonNumeric
    case "bc" | "ad" =>
      sb.append(if (dt.getYear >= 1) "ad" else "bc"); PrevNonNumeric
    case "B.C" | "A.D" =>
      sb.append(if (dt.getYear >= 1) "A.D" else "B.C"); PrevNonNumeric
    case "b.c" | "a.d" =>
      sb.append(if (dt.getYear >= 1) "a.d" else "b.c"); PrevNonNumeric
    case "MONTH" =>
      padEnd(sb, dt.getMonth.getDisplayName(TextStyle.FULL, Locale.ENGLISH)
        .toUpperCase(Locale.ENGLISH), 7); PrevNonNumeric
    case "Month" =>
      padEnd(sb, capitalize(
        dt.getMonth.getDisplayName(TextStyle.FULL, Locale.ENGLISH)), 7)
      PrevNonNumeric
    case "month" =>
      padEnd(sb, dt.getMonth.getDisplayName(TextStyle.FULL, Locale.ENGLISH)
        .toLowerCase(Locale.ENGLISH), 7); PrevNonNumeric
    case "MON" =>
      sb.append(dt.getMonth.getDisplayName(TextStyle.SHORT, Locale.ENGLISH)
        .toUpperCase(Locale.ENGLISH)); PrevNonNumeric
    case "Mon" =>
      sb.append(capitalize(
        dt.getMonth.getDisplayName(TextStyle.SHORT, Locale.ENGLISH)))
      PrevNonNumeric
    case "mon" =>
      sb.append(dt.getMonth.getDisplayName(TextStyle.SHORT, Locale.ENGLISH)
        .toLowerCase(Locale.ENGLISH)); PrevNonNumeric
    case "MM" | "mm" => pad0(sb, dt.getMonthValue, 2); dt.getMonthValue
    case "DAY" =>
      padEnd(sb, dt.getDayOfWeek.getDisplayName(TextStyle.FULL, Locale.ENGLISH)
        .toUpperCase(Locale.ENGLISH), 8); PrevNonNumeric
    case "Day" =>
      padEnd(sb, capitalize(
        dt.getDayOfWeek.getDisplayName(TextStyle.FULL, Locale.ENGLISH)), 8)
      PrevNonNumeric
    case "day" =>
      padEnd(sb, dt.getDayOfWeek.getDisplayName(TextStyle.FULL, Locale.ENGLISH)
        .toLowerCase(Locale.ENGLISH), 8); PrevNonNumeric
    case "DY" =>
      sb.append(dt.getDayOfWeek.getDisplayName(TextStyle.SHORT, Locale.ENGLISH)
        .toUpperCase(Locale.ENGLISH)); PrevNonNumeric
    case "Dy" =>
      sb.append(capitalize(
        dt.getDayOfWeek.getDisplayName(TextStyle.SHORT, Locale.ENGLISH)))
      PrevNonNumeric
    case "dy" =>
      sb.append(dt.getDayOfWeek.getDisplayName(TextStyle.SHORT, Locale.ENGLISH)
        .toLowerCase(Locale.ENGLISH)); PrevNonNumeric
    case "DDD" | "ddd" => pad0(sb, dt.getDayOfYear, 3); dt.getDayOfYear
    case "IDDD" | "iddd" =>
      val v = (dt.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR) - 1) * 7 +
        dt.getDayOfWeek.getValue
      pad0(sb, v, 3); v
    case "DD" | "dd" => pad0(sb, dt.getDayOfMonth, 2); dt.getDayOfMonth
    case "D" | "d" =>
      val v = (dt.getDayOfWeek.getValue % 7) + 1; sb.append(v); v
    case "ID" | "id" =>
      val v = dt.getDayOfWeek.getValue; sb.append(v); v
    case "W" | "w" =>
      val v = (dt.getDayOfMonth / 7) + 1; sb.append(v); v
    case "WW" | "ww" =>
      val v = dt.get(WeekOfYear); pad0(sb, v, 2); v
    case "IW" | "iw" =>
      val v = dt.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR); pad0(sb, v, 2); v
    case "CC" | "cc" =>
      val v = ((dt.getYear - 1) / 100) + 1; sb.append(v); v
    case "J" | "j" =>
      val v = dt.getLong(JulianFields.JULIAN_DAY); sb.append(v); v
    case "Q" | "q" =>
      val v = (dt.getMonthValue + 2) / 3; sb.append(v); v
    case "RM" => padEnd(sb, roman(dt.getMonthValue), 4); PrevNonNumeric
    case "rm" =>
      padEnd(sb, roman(dt.getMonthValue).toLowerCase(Locale.ENGLISH), 4)
      PrevNonNumeric
    case "TZ" | "tz" | "TZH" | "tzh" | "TZM" | "tzm" | "OF" | "of" =>
      PrevNonNumeric
    case "TH" => sb.append(ordSuffix(prev).toUpperCase(Locale.ENGLISH)); PrevLiteral
    case "th" => sb.append(ordSuffix(prev)); PrevLiteral
    case other => throw new IllegalArgumentException(s"Unexpected pattern: $other")
  }

  /** Entry points for codegen: timestamp micros / interval. */
  def formatTs(micros: Long, template: UTF8String): UTF8String = {
    val dt = LocalDateTime.ofInstant(
      Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L), ZoneOffset.UTC)
    UTF8String.fromString(format(dt, template.toString))
  }

  def formatInterval(ci: CalendarInterval, template: UTF8String): UTF8String = {
    val dt = LocalDateTime.of(0, 1, 1, 0, 0, 0, 0)
      .plusMonths(ci.months)
      .plusDays(ci.days)
      .plusNanos(ci.microseconds * 1000L)
    UTF8String.fromString(format(dt, template.toString))
  }

  /** ANSI year-month interval (months) / day-time interval (micros) —
    * Spark's native single-unit interval literals. */
  def formatYmInterval(months: Int, template: UTF8String): UTF8String =
    UTF8String.fromString(format(
      LocalDateTime.of(0, 1, 1, 0, 0, 0, 0).plusMonths(months),
      template.toString))

  def formatDtInterval(micros: Long, template: UTF8String): UTF8String =
    UTF8String.fromString(format(
      LocalDateTime.of(0, 1, 1, 0, 0, 0, 0).plusNanos(micros * 1000L),
      template.toString))
}

/** `to_char(timestamp | interval, template)` — strict null, codegen'd. */
case class PgToCharExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "to_char"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val okL = left.dataType match {
      case TimestampType | TimestampNTZType | CalendarIntervalType |
           _: YearMonthIntervalType | _: DayTimeIntervalType |
           NullType => true
      case _ => false
    }
    val okR = right.dataType == StringType || right.dataType == NullType
    if (okL && okR) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "to_char requires (timestamp | interval, string) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  private def helper: String = left.dataType match {
    case CalendarIntervalType      => "formatInterval"
    case _: YearMonthIntervalType  => "formatYmInterval"
    case _: DayTimeIntervalType    => "formatDtInterval"
    case _                         => "formatTs"
  }
  override def nullSafeEval(v: Any, t: Any): Any = {
    val tpl = t.asInstanceOf[UTF8String]
    left.dataType match {
      case CalendarIntervalType =>
        PgToChar.formatInterval(v.asInstanceOf[CalendarInterval], tpl)
      case _: YearMonthIntervalType =>
        PgToChar.formatYmInterval(v.asInstanceOf[Int], tpl)
      case _: DayTimeIntervalType =>
        PgToChar.formatDtInterval(v.asInstanceOf[Long], tpl)
      case _ => PgToChar.formatTs(v.asInstanceOf[Long], tpl)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, t) => s"graft.plans.PgToChar.$helper($v, $t)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
