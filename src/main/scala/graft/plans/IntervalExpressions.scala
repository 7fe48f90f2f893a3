package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** The reference's INTERVAL string grammar (server/src/main/java/io/
  * crate/interval/IntervalParser.java:58 and its three delegates),
  * re-expressed for Spark's `CalendarInterval` (months, days, micros):
  *
  *  1. NUMERIC — a bare decimal is SECONDS ("1" = 1s, "1.5" = 1s 500ms;
  *     NumericalIntervalParser.java:105 truncates toward zero and keeps
  *     the fraction as millis);
  *  2. ISO-8601 — "P1Y2M3DT4H5M6.5S" (weeks allowed, per-field signs);
  *  3. SQL STANDARD — "Y-M [D [H:M[:S] | S]]" parsed BACKWARDS with the
  *     reference's exact state machine (SQLStandardIntervalParser
  *     .java:48): a lone trailing number is seconds, a number before an
  *     H:M[:S] group is days, a number directly after Y-M is days, and
  *     "D S" (two bare numbers) is invalid;
  *  4. POSTGRES — "[@] 1 year 2 mons 3 days 04:05:06.7 [ago]" with
  *     abbreviated units (y/mon/d/w/h/m/s/ms), attached forms ("1year"),
  *     week→7 days, duplicate-unit rejection, and "@ … ago" negation
  *     (PGIntervalParser.java:45).
  *
  * Like the reference, the cascade tries each in order and the final
  * value normalizes years into months and whole days out of the time
  * part (Period.normalizedStandard(yearMonthDayTime)).
  *
  * Faithful-quirk notes (ported bug-for-bug, adjudicated against the
  * reference source in round 12's review): the SQL-standard machine
  * silently OVERWRITES a repeated H:M[:S] or Y-M group ("15:30 10:20"
  * keeps 15:30) exactly like SQLStandardIntervalParser's stateless
  * branch; the PG leg's duplicate-unit guards test `> 0`, so a zero or
  * negative first occurrence can be overwritten ("@ -1 hour 2 hours"),
  * like PGIntervalParser.java:124-172; and MINUTE TO SECOND drops the
  * numeric fraction while DAY/HOUR TO SECOND keep it, mirroring
  * NumericalIntervalParser.java:96. ONE deliberate divergence: int
  * overflow is LOUD on every leg (ArithmeticException "out of range"),
  * where the reference's PG leg silently wraps 32 bits. Typed-precision
  * qualifiers (INTERVAL 'x' HOUR TO MINUTE) stay on Spark's native
  * syntax — this parser serves the STRING literal/cast form
  * (`'…'::interval`, `graft_interval('…')`). */
object GraftInterval {

  /** Stackless rejection (hot path: the cascade legs raise and catch
    * these per ROW on mixed-grammar columns — a filled-in stack trace
    * per leg made q253 ~2× slower; BENCH r13 "What's wrong #2"). Still
    * an IllegalArgumentException with the reference's exact message, so
    * both the cascade's catch and the user-visible final error are
    * unchanged — only the (unused) stack trace is skipped. */
  private final class BadFormat(msg: String)
      extends IllegalArgumentException(msg) {
    override def fillInStackTrace(): Throwable = this
  }

  private def bad(value: String): Nothing =
    throw new BadFormat(s"Invalid interval format: $value")

  /** (years, months, days, hours, minutes, seconds, millis) — the
    * reference Period's fields before normalization. */
  private type P7 = (Int, Int, Int, Int, Int, Int, Int)

  private def parseIntStrict(s: String): Int = {
    // digit gate first: parseInt's NumberFormatException fills a stack
    // trace, and the cascade feeds this non-numeric tokens per row
    if (s.isEmpty) throw NumEx
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!(c >= '0' && c <= '9') && !(i == 0 && (c == '-' || c == '+')))
        throw NumEx
      i += 1
    }
    try java.lang.Integer.parseInt(s)
    catch { case _: NumberFormatException => throw NumEx } // int overflow
  }

  /** BigDecimal int part, truncated toward zero, LOUD above int range
    * (reference NumericalIntervalParser.parseInteger raises
    * ArithmeticException; its PG leg silently wraps via intValue() —
    * graft goes loud on every leg, the engine's silent-wrong-value
    * policy). */
  private def decInt(s: String): Int = {
    val bi =
      try {
        if (!plausibleNumber(s)) throw NumEx
        new java.math.BigDecimal(s).toBigInteger
      }
      catch { case _: NumberFormatException => throw NumEx }
    if (bi.bitLength > 31)
      throw new ArithmeticException(s"Interval field value out of range $s")
    bi.intValue
  }

  /** fraction → millis (reference IntervalParser.parseMilliSeconds). */
  private def decMillis(s: String): Int =
    try {
      if (!plausibleNumber(s)) throw NumEx
      val d = new java.math.BigDecimal(s)
      d.subtract(new java.math.BigDecimal(d.intValue()))
        .multiply(new java.math.BigDecimal(1000)).intValue()
    } catch { case _: NumberFormatException => throw NumEx }

  private object NumEx extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Cheap structural pre-check before BigDecimal: the constructor's
    * NumberFormatException fills a stack trace, and the numeric leg is
    * tried FIRST on every row — without this gate a non-numeric arm
    * pays an exception construction per row per parse (the q253
    * regression). Accepts the BigDecimal grammar's shape: digits, one
    * '.', signs only leading or right after an exponent marker. */
  private def plausibleNumber(s: String): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    var ok = true
    while (ok && i < s.length) {
      val c = s.charAt(i)
      val isDigit = c >= '0' && c <= '9'
      val isSign = c == '+' || c == '-'
      val isExp = c == 'e' || c == 'E'
      if (isDigit || c == '.' || isExp) ()
      else if (isSign) {
        if (!(i == 0 || { val p = s.charAt(i - 1); p == 'e' || p == 'E' }))
          ok = false
      } else ok = false
      i += 1
    }
    ok
  }

  // ---- 1. numeric: bare seconds ----
  private def tryNumeric(v: String): P7 = {
    val s = v.trim
    if (!plausibleNumber(s)) throw NumEx
    (0, 0, 0, 0, 0, decInt(s), decMillis(s))
  }

  // ---- 2. ISO-8601 ----
  private val IsoPat = java.util.regex.Pattern.compile(
    "^(-?)P(?:(-?\\d+)Y)?(?:(-?\\d+)M)?(?:(-?\\d+)W)?(?:(-?\\d+)D)?" +
      "(?:T(?:(-?\\d+)H)?(?:(-?\\d+)M)?(?:(-?\\d+(?:\\.\\d+)?)S)?)?$")

  private def tryIso(v: String): P7 = {
    val m = IsoPat.matcher(v.trim)
    if (!m.matches()) throw NumEx
    val neg = if (m.group(1) == "-") -1 else 1
    def g(i: Int): Int = Option(m.group(i)).map(parseIntStrict).getOrElse(0)
    val secStr = Option(m.group(8))
    if ((2 to 8).forall(i => m.group(i) == null)) throw NumEx // bare "P"
    (neg * g(2), neg * g(3), neg * (g(4) * 7 + g(5)), neg * g(6), neg * g(7),
      neg * secStr.map(decInt).getOrElse(0),
      neg * secStr.map(decMillis).getOrElse(0))
  }

  // ---- 3. SQL standard (ported state machine) ----
  private val YearMonthPat =
    java.util.regex.Pattern.compile("-?\\d{1,9}-\\d{1,9}")

  private def trySqlStandard(v: String): P7 = {
    val values = v.split(" ")
    if (values.length > 3 || values.length == 0) bad(v)
    var state = 0 // 0 nothing, 1 hms, 2 second, 3 days, 4 year-month
    var (years, months, days, hours, minutes, seconds) = (0, 0, 0, 0, 0, 0)
    var i = values.length - 1
    while (i >= 0) {
      var part = values(i)
      var negative = false
      if (part.trim.nonEmpty) {
        if (part.startsWith("-")) { negative = true; part = part.substring(1) }
        if (part.startsWith("+")) part = part.substring(1)
        if (part.contains(":")) {
          val hms = part.split(":")
          hms.length match {
            case 3 =>
              hours = parseIntStrict(hms(0)); minutes = parseIntStrict(hms(1))
              seconds = parseIntStrict(hms(2))
            case 2 =>
              hours = parseIntStrict(hms(0)); minutes = parseIntStrict(hms(1))
            case 1 => seconds = parseIntStrict(hms(0))
            case _ => bad(v)
          }
          if (negative) { hours = -hours; minutes = -minutes; seconds = -seconds }
          state = 1
        } else if (part.contains("-")) {
          val ym = part.split("-")
          if (ym.length != 2) bad(v)
          years = parseIntStrict(ym(0)); months = parseIntStrict(ym(1))
          if (negative) { years = -years; months = -months }
          state = 4
        } else if (state == 0) {
          val number = parseIntStrict(part)
          if (i - 1 >= 0) {
            if (YearMonthPat.matcher(values(i - 1)).matches()) {
              days = if (negative) -number else number
              state = 3
            } else bad(v) // bare "D S" combination
          } else {
            seconds = if (negative) -number else number
            state = 2
          }
        } else if (state == 1) {
          days = { val n = parseIntStrict(part); if (negative) -n else n }
          state = 3
        } else if (state == 2) bad(v)
      }
      i -= 1
    }
    if (state == 0) bad(v)
    (years, months, days, hours, minutes, seconds, 0)
  }

  // ---- 4. postgres verbose/compact ----
  private def tryPg(v: String): P7 = {
    var s = v.trim.toLowerCase(java.util.Locale.ENGLISH)
    val isoFormat = !s.startsWith("@")
    val hasAgo = s.endsWith("ago")
    s = s.replace("+", "").replace("@", "").replace("ago", "").trim
    if (!isoFormat && v.length == 3 && v.charAt(2) == '0')
      return (0, 0, 0, 0, 0, 0, 0)
    var (years, months, days, hours, minutes, seconds, millis) =
      (0, 0, 0, 0, 0, 0, 0)
    var weeksParsed = false
    var daysParsed = false
    var timeParsed = false
    val st = new java.util.StringTokenizer(s)
    if (!st.hasMoreTokens) bad(v)
    while (st.hasMoreTokens) {
      val token = st.nextToken()
      var unitToken: String = null
      var valueToken: String = null
      val firstChar = token.indexWhere(_.isLetter)
      if (firstChar > 0) {
        valueToken = token.substring(0, firstChar)
        unitToken = token.substring(firstChar)
      } else {
        valueToken = token
        if (st.hasMoreTokens) unitToken = st.nextToken()
      }
      val endHours = token.indexOf(':')
      if (endHours > 0) {
        if (timeParsed) bad(v)
        val offset = if (token.charAt(0) == '-') 1 else 0
        hours = parseIntStrict(token.substring(offset, endHours))
        minutes = parseIntStrict(token.substring(endHours + 1, endHours + 3))
        val endMinutes = token.indexOf(':', endHours + 1)
        seconds = decInt(token.substring(endMinutes + 1))
        millis = decMillis(token.substring(endMinutes + 1))
        if (offset == 1) {
          hours = -hours; minutes = -minutes; seconds = -seconds
          millis = -millis
        }
        timeParsed = true
        // NOTE: unitToken is deliberately NOT cleared here — if the
        // tokenizer consumed a trailing token as this time group's
        // "unit" (reference PGIntervalParser keeps it too), the switch
        // below rejects it, which is what makes
        // "1y 11:22:33 11:22:33" fail like the reference
      } else if (unitToken == null) bad(v)
      if (unitToken != null) unitToken match {
        case "year" | "years" | "y" =>
          if (years > 0) bad(v)
          years = parseIntStrict(valueToken)
        case "month" | "months" | "mon" | "mons" =>
          if (months > 0) bad(v)
          months = parseIntStrict(valueToken)
        case "day" | "days" | "d" =>
          if (daysParsed) bad(v)
          days += parseIntStrict(valueToken); daysParsed = true
        case "week" | "weeks" | "w" =>
          if (weeksParsed) bad(v)
          days += parseIntStrict(valueToken) * 7; weeksParsed = true
        case "hour" | "hours" | "h" =>
          if (hours > 0) bad(v)
          hours = parseIntStrict(valueToken); timeParsed = true
        case "min" | "mins" | "minute" | "minutes" | "m" =>
          if (minutes > 0) bad(v)
          minutes = parseIntStrict(valueToken); timeParsed = true
        case "sec" | "secs" | "second" | "seconds" | "s" =>
          if (seconds > 0 || millis > 0) bad(v)
          seconds = decInt(valueToken); millis = decMillis(valueToken)
          timeParsed = true
        case "ms" | "msec" | "msecs" | "millisecond" | "milliseconds" =>
          if (millis > 0) bad(v)
          millis = decInt(valueToken); timeParsed = true
        case _ => bad(v)
      }
    }
    val sign = if (!isoFormat && hasAgo) -1 else 1
    (sign * years, sign * months, sign * days, sign * hours, sign * minutes,
      sign * seconds, sign * millis)
  }

  /** Precision slots of the typed literal form (reference
    * IntervalParser.Precision) in significance order. */
  private val Precisions =
    Vector("year", "month", "day", "hour", "minute", "second")

  /** Constructor-time whitelist for the typed-precision slots: doGenCode
    * splices these strings into generated Java, so anything outside the
    * grammar must be rejected BEFORE codegen — a direct SQL call like
    * `graft_interval(s, 'ho"ur')` would otherwise inject into the
    * generated source instead of raising the interpreted path's clean
    * error (ADVICE r12). */
  def requirePrecision(o: Option[String]): Unit =
    o.foreach { p =>
      if (!Precisions.contains(p))
        throw new IllegalArgumentException(
          s"Invalid interval precision: $p")
    }

  /** `INTERVAL 'v' start [TO end]` — the reference's two precision
    * behaviors: a BARE NUMBER takes the (start, end) unit directly
    * (NumericalIntervalParser — '1' HOUR TO SECOND is 1 second,
    * '100' DAY TO SECOND is 100 seconds), while a parsed period ROUNDS
    * to the window (IntervalParser.roundToPrecision — fields outside
    * [start, end] zero out). */
  private def numericWithPrecision(v: Int, ms: Int, start: String,
                                   end: String): P7 =
    (start, end) match {
      case ("year", null)       => (v, 0, 0, 0, 0, 0, 0)
      case ("year", "month")    => (0, v, 0, 0, 0, 0, 0)
      case ("month", null)      => (0, v, 0, 0, 0, 0, 0)
      case ("day", null)        => (0, 0, v, 0, 0, 0, 0)
      case ("day", "hour")      => (0, 0, 0, v, 0, 0, 0)
      case ("day", "minute")    => (0, 0, 0, 0, v, 0, 0)
      case ("day", "second")    => (0, 0, 0, 0, 0, v, ms)
      case ("hour", null)       => (0, 0, 0, v, 0, 0, 0)
      case ("hour", "minute")   => (0, 0, 0, 0, v, 0, 0)
      case ("hour", "second")   => (0, 0, 0, 0, 0, v, ms)
      case ("minute", null)     => (0, 0, 0, 0, v, 0, 0)
      case ("minute", "second") => (0, 0, 0, 0, 0, v, 0)
      case ("second", null)     => (0, 0, 0, 0, 0, v, ms)
      case _ => throw new IllegalArgumentException(
        "Invalid start and end combination")
    }

  private def roundToPrecision(p: P7, start: String, end: String): P7 = {
    val (y, mo, d, h, mi, se, ms) = p
    (start, end) match {
      case ("year", null)       => (y, 0, 0, 0, 0, 0, 0)
      case ("year", "month")    => (y, mo, 0, 0, 0, 0, 0)
      case ("month", null)      => (y, mo, 0, 0, 0, 0, 0)
      case ("day", null)        => (y, mo, d, 0, 0, 0, 0)
      case ("day", "hour")      => (y, mo, d, h, 0, 0, 0)
      case ("day", "minute")    => (y, mo, d, h, mi, 0, 0)
      case ("day", "second")    => (y, mo, d, h, mi, se, 0)
      case ("hour", null)       => (y, mo, d, h, 0, 0, 0)
      case ("hour", "minute")   => (y, mo, d, h, mi, 0, 0)
      case ("hour", "second")   => (y, mo, d, h, mi, se, 0)
      case ("minute", null)     => (y, mo, d, h, mi, 0, 0)
      case ("minute", "second") => (y, mo, d, h, mi, se, 0)
      case ("second", null)     => (y, mo, d, h, mi, se, 0)
      case _ => throw new IllegalArgumentException(
        "Invalid start and end combination")
    }
  }

  /** The reference cascade → normalized (months, days, micros).
    * `start`/`end` are the typed-literal precision slots (null = none);
    * an end without a start, or an end at-or-above the start's
    * significance, is the reference grammar's loud rejection. */
  def parseParts(value: String, start: String = null,
                 end: String = null): (Int, Int, Long) = {
    if (value == null || value.trim.isEmpty) bad(value)
    if (end != null) {
      require(start != null, "Invalid start and end combination")
      if (Precisions.indexOf(start) >= Precisions.indexOf(end))
        throw new IllegalArgumentException(
          "Startfield must be less significant than Endfield")
    }
    val p: P7 =
      try {
        val n = tryNumeric(value)
        if (start == null) n
        else numericWithPrecision(n._6, n._7, start, end)
      }
      catch { case NumEx | _: IllegalArgumentException =>
        val parsed =
          try tryIso(value)
          catch { case NumEx | _: IllegalArgumentException =>
            try trySqlStandard(value)
            catch { case NumEx | _: IllegalArgumentException =>
              try tryPg(value)
              catch { case NumEx => bad(value) }
            }
          }
        if (start == null) parsed else roundToPrecision(parsed, start, end)
      }
    val (y, mo, d, h, mi, se, ms) = p
    // Period.normalizedStandard(yearMonthDayTime): years fold into
    // months; DAYS fold into the precise-time total before the re-split
    // (joda sums days*86400000 into the millis total, then divides back
    // out), so mixed-sign day/time inputs like '1 -2:00' normalize to
    // (0 days, 22:00:00) — not (1 day, -02:00:00). Truncation toward
    // zero; overflow of the combined total is LOUD (the one documented
    // divergence — joda would raise its own ArithmeticException here
    // via toStandardDuration's checked arithmetic as well)
    val microsPerDay = 86400000000L
    val months = y * 12 + mo
    val totalMicros = Math.addExact(
      Math.multiplyExact(d.toLong, microsPerDay),
      ((h * 3600L + mi * 60L + se) * 1000L + ms) * 1000L)
    val days = (totalMicros / microsPerDay).toInt
    val micros = totalMicros - days * microsPerDay
    (months, days, micros)
  }

  /** The reference's display form (IntervalType.PERIOD_FORMATTER — the
    * docs pin "1 day 00:00:00", "-1 days 00:00:00", "00:00:01.500",
    * "1 year 2 mons 3 days 04:05:06"): year/mon/day fields print only
    * when nonzero (singular iff exactly 1, so -1 prints "days" like the
    * docs), the time part ALWAYS prints as 2-digit H:M:S with optional
    * 3-digit millis; mixed-sign values print each field signed
    * (joda's per-field printing). */
  def formatParts(months: Int, days: Int, micros: Long): String = {
    val sb = new StringBuilder
    val y = months / 12
    val mo = months % 12
    def field(v: Int, one: String, many: String): Unit =
      if (v != 0) {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(v).append(if (v == 1) one else many)
      }
    field(y, " year", " years")
    field(mo, " mon", " mons")
    field(days, " day", " days")
    var us = micros
    val h = us / 3600000000L; us -= h * 3600000000L
    val m = us / 60000000L; us -= m * 60000000L
    val s = us / 1000000L; us -= s * 1000000L
    val ms = us / 1000L
    def f2(v: Long): String = {
      val a = math.abs(v)
      (if (v < 0) "-" else "") + (if (a < 10) "0" + a else a.toString)
    }
    if (sb.nonEmpty) sb.append(' ')
    // seconds + millis print as ONE signed field (joda
    // appendSecondsWithOptionalMillis): '-0.5s' is "-00.500", never a
    // sign-stripped "00.500"
    val sMs = s * 1000 + ms
    val secStr = {
      val a = math.abs(s)
      (if (sMs < 0) "-" else "") +
        (if (a < 10) "0" + a else a.toString) +
        (if (ms != 0) f".${math.abs(ms)}%03d" else "")
    }
    sb.append(f2(h)).append(':').append(f2(m)).append(':').append(secStr)
    sb.toString
  }

  def formatString(s: UTF8String): UTF8String = {
    val (m, d, us) = parseParts(s.toString)
    UTF8String.fromString(formatParts(m, d, us))
  }

  def formatCal(ci: CalendarInterval): UTF8String =
    UTF8String.fromString(formatParts(ci.months, ci.days, ci.microseconds))

  def partsCal(ci: CalendarInterval): org.apache.spark.sql.catalyst.InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ci.months, ci.days, ci.microseconds))

  /** The reference's interval ORDERING key (io.crate.types.IntervalType
    * .compare → toStandardDuration, IntervalType.java:171): months count
    * 30 days, years count 365 DAYS (the javadoc says "12 months per
    * year" but the code adds years*365*MILLIS_PER_DAY — ported
    * bug-for-bug, ADVICE r13 high), and the total is exact
    * unbounded-integer arithmetic (the reference uses BigInteger to
    * dodge long overflow). CalendarInterval carries TOTAL months, so
    * the (years, months) split is re-derived the way the reference's
    * own parsers leave it — Period.normalizedStandard: years = m/12,
    * months = m%12, Java truncation-toward-zero on both. Exact for
    * every parsed value; the one unreachable divergence is a reference
    * Period HAND-CONSTRUCTED with months outside [-11, 11] and never
    * normalized (interval±interval keeps fields raw there), a state the
    * total-months triple cannot represent.
    * Rendered in MICROS as DECIMAL(38,0) — comparable, hash-gateable,
    * and ORDER BY on it distributes through Spark's native range sort
    * (a 100 TB sort needs no special operator, just this key column).
    * Invariant under parse normalization: folding whole days between
    * the micros and days fields moves exactly 86 400 000 000 per day on
    * both sides of the sum. */
  private val MicrosPerDay = java.math.BigInteger.valueOf(86400000000L)
  private val MicrosPer30Days = java.math.BigInteger.valueOf(2592000000000L)
  private val MicrosPer365Days = java.math.BigInteger.valueOf(31536000000000L)

  def orderKey(months: Int, days: Int, micros: Long): org.apache.spark.sql.types.Decimal = {
    val years = months / 12
    val moRem = months % 12
    val total = java.math.BigInteger.valueOf(years).multiply(MicrosPer365Days)
      .add(java.math.BigInteger.valueOf(moRem).multiply(MicrosPer30Days))
      .add(java.math.BigInteger.valueOf(days).multiply(MicrosPerDay))
      .add(java.math.BigInteger.valueOf(micros))
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(total), 38, 0)
  }

  def orderKeyString(s: UTF8String): org.apache.spark.sql.types.Decimal = {
    val (m, d, us) = parseParts(s.toString)
    orderKey(m, d, us)
  }

  def orderKeyCal(ci: CalendarInterval): org.apache.spark.sql.types.Decimal =
    orderKey(ci.months, ci.days, ci.microseconds)

  // ---- interval arithmetic (reference IntervalArithmeticFunctions /
  // IntervalTimestampArithmeticScalar / SubtractTimestampScalar) ----

  /** `interval + interval` / `interval - interval` are joda
    * `Period::plus/minus` — FIELD-WISE, with NO normalization after
    * (IntervalArithmeticFunctions.java:52/62: '20 hours' + '20 hours'
    * is 40:00:00, not 1 day 16:00:00). On the (months, days, micros)
    * triple that is exact field-wise addition. Representation note:
    * joda keeps hours/minutes/seconds/millis as separate int fields, so
    * a reference sum can carry e.g. minutes=118 internally — but its
    * OWN pg wire encoding (protocols IntervalType.writeAsBinary)
    * collapses the time fields into one micros total, which is exactly
    * this triple; graft's value (and display) equals what a reference
    * client receives over the wire. Overflow is LOUD (addExact). */
  def add(a: CalendarInterval, b: CalendarInterval): CalendarInterval =
    new CalendarInterval(Math.addExact(a.months, b.months),
      Math.addExact(a.days, b.days),
      Math.addExact(a.microseconds, b.microseconds))

  def subtract(a: CalendarInterval, b: CalendarInterval): CalendarInterval =
    new CalendarInterval(Math.subtractExact(a.months, b.months),
      Math.subtractExact(a.days, b.days),
      Math.subtractExact(a.microseconds, b.microseconds))

  /** joda FieldUtils.safeMultiply(int, int) — the reference's exact
    * overflow message for Period.multipliedBy. */
  private def safeMulInt(field: Int, k: Int): Int = {
    val total = field.toLong * k
    if (total < Int.MinValue || total > Int.MaxValue)
      throw new ArithmeticException(
        s"Multiplication overflows an int: $field * $k")
    total.toInt
  }

  /** `interval * integer` is `Period.multipliedBy(k)
    * .normalizedStandard(yearMonthDayTime)` — each FIELD multiplied
    * with an int-overflow check (so '2 second' * 2147483647 raises
    * "Multiplication overflows an int: 2 * 2147483647" even though the
    * micros total would fit a long), THEN normalized (so '20 hours' * 2
    * IS 1 day 16:00:00, unlike addition). The micros total decomposes
    * into the h/mi/s/ms fields the parsed period carries. Documented
    * divergence: the reference multiplies years and months as separate
    * int fields, graft carries total months — a product that fits the
    * years field but overflows total-months (> ~178 M years) is LOUD
    * here where the reference succeeds (CalendarInterval month-int
    * representation limit). */
  def multiply(iv: CalendarInterval, k: Int): CalendarInterval = {
    var us = iv.microseconds
    val h = us / 3600000000L; us -= h * 3600000000L
    val mi = us / 60000000L; us -= mi * 60000000L
    val s = us / 1000000L; us -= s * 1000000L
    val ms = us / 1000L; us -= ms * 1000L
    val months = safeMulInt(iv.months, k)
    val days = safeMulInt(iv.days, k)
    // `us` now holds the sub-millisecond remainder. A reference Period
    // holds fields only down to MILLIS, so reference inputs never carry
    // one — but graft itself produces micros-precision intervals (e.g.
    // graft_ts_diff over Spark's microsecond timestamps), and dropping
    // the remainder made even multiply(iv, 1) lossy (ADVICE r13). It
    // scales exactly, outside joda's per-field int checks.
    val totalMicros = Math.addExact(Math.addExact(
      Math.multiplyExact(days.toLong, 86400000000L),
      ((safeMulInt(Math.toIntExact(h), k) * 3600L +
        safeMulInt(Math.toIntExact(mi), k) * 60L +
        safeMulInt(Math.toIntExact(s), k)) * 1000L +
        safeMulInt(Math.toIntExact(ms), k)) * 1000L),
      Math.multiplyExact(us, k.toLong))
    val d2 = (totalMicros / 86400000000L).toInt
    new CalendarInterval(months, d2, totalMicros - d2 * 86400000000L)
  }

  /** The reference's integer implicit cast for a fractional multiplier
    * (interval '1 hour' * 3.5 is 3 hours — IntegerType.implicitCast,
    * IntervalFunctionTest.test_implicit_cast_to_integer_while_
    * multiplying_by_double): `long longVal = number.longValue()`, LOUD
    * "integer value out of range" outside int32, else truncate (ADVICE
    * r13 — graft used Scala's saturating toInt, which silently turned
    * 1e12 into Int.MaxValue). Faithful corners of Number.longValue:
    * Double.NaN.longValue() is 0 in Java, so the reference maps a NaN
    * multiplier to 0 — ported as-is; ±Infinity saturate to
    * Long.MIN/MAX_VALUE, both out of int range, so they are LOUD. */
  private def factorRange(longVal: Long): Int =
    if (longVal < Int.MinValue || longVal > Int.MaxValue)
      throw new IllegalArgumentException(
        s"integer value out of range: $longVal")
    else longVal.toInt

  def factorToInt(x: Any): Int = x match {
    case i: Int     => i
    case l: Long    => factorRange(l)
    case s: Short   => s.toInt
    case b: Byte    => b.toInt
    case d: Double  => factorRange(d.toLong)
    case f: Float   => factorRange(f.toDouble.toLong)
    case d: org.apache.spark.sql.types.Decimal =>
      factorRange(d.toBigDecimal.bigDecimal.longValue())
    case other => throw new IllegalArgumentException(
      s"interval multiplier must be numeric, got $other")
  }

  /** `timestamp - timestamp` returns an interval in the reference
    * (SubtractTimestampScalar: Period(end - start millis)
    * .normalizedStandard(yearMonthDayTime) — pure duration split into
    * days + time, NO months). Inputs are epoch micros. */
  def tsDiff(endMicros: Long, startMicros: Long): CalendarInterval = {
    val total = Math.subtractExact(endMicros, startMicros)
    val d = (total / 86400000000L).toInt
    new CalendarInterval(0, d, total - d * 86400000000L)
  }

  /** micros → (0 months, days, micros) fold — the reference's
    * back-conversion for duration-valued results (interval percentile:
    * PercentileAggregation's `new Period((long) x).normalizedStandard
    * (yearMonthDayTime)`). */
  def fromMicros(totalMicros: Long): CalendarInterval = {
    val d = (totalMicros / 86400000000L).toInt
    new CalendarInterval(0, d, totalMicros - d * 86400000000L)
  }

  def parse(s: UTF8String): CalendarInterval = parse(s, null, null)

  def parse(s: UTF8String, start: String, end: String): CalendarInterval = {
    val (m, d, us) = parseParts(s.toString, start, end)
    new CalendarInterval(m, d, us)
  }

  def parseStruct(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow =
    parseStruct(s, null, null)

  def parseStruct(s: UTF8String, start: String,
                  end: String): org.apache.spark.sql.catalyst.InternalRow = {
    val (m, d, us) = parseParts(s.toString, start, end)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m, d, us))
  }

  val partsType: StructType = StructType(Seq(
    StructField("months", IntegerType, nullable = false),
    StructField("days", IntegerType, nullable = false),
    StructField("micros", LongType, nullable = false)))
}

/** `graft_interval(s[, start[, end]])` — the reference's interval
  * grammar into Spark's CalendarInterval (timestamp ± works natively);
  * start/end are the typed-literal precision slots. Codegen'd. */
case class IntervalParseExpr(child: Expression,
                             startPrec: Option[String] = None,
                             endPrec: Option[String] = None)
    extends UnaryExpression {
  GraftInterval.requirePrecision(startPrec)
  GraftInterval.requirePrecision(endPrec)
  override def prettyName: String = "graft_interval"
  override def dataType: DataType = CalendarIntervalType
  override def nullable: Boolean = true
  private def jn(o: Option[String]): String = o.orNull
  private def jq(o: Option[String]): String =
    o.map(v => "\"" + v + "\"").getOrElse("null")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    GraftInterval.parse(input.asInstanceOf[UTF8String], jn(startPrec),
      jn(endPrec))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.GraftInterval.parse($c, ${jq(startPrec)}, ${jq(endPrec)})")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_interval_parts(s[, start[, end]])` — the same parse as a
  * STRUCT<months, days, micros> (hash-gate-friendly components). */
case class IntervalPartsExpr(child: Expression,
                             startPrec: Option[String] = None,
                             endPrec: Option[String] = None)
    extends UnaryExpression {
  GraftInterval.requirePrecision(startPrec)
  GraftInterval.requirePrecision(endPrec)
  override def prettyName: String = "graft_interval_parts"
  override def dataType: DataType = GraftInterval.partsType
  override def nullable: Boolean = true
  private def jn(o: Option[String]): String = o.orNull
  private def jq(o: Option[String]): String =
    o.map(v => "\"" + v + "\"").getOrElse("null")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case CalendarIntervalType if startPrec.isEmpty && endPrec.isEmpty =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string (or bare interval) argument, " +
            s"got ${other.simpleString}")
    }
  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String =>
      GraftInterval.parseStruct(s, jn(startPrec), jn(endPrec))
    case ci: CalendarInterval => GraftInterval.partsCal(ci)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case CalendarIntervalType =>
        defineCodeGen(ctx, ev, c => s"graft.plans.GraftInterval.partsCal($c)")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.GraftInterval.parseStruct($c, ${jq(startPrec)}, ${jq(endPrec)})")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_interval_order(x)` — the reference's interval ordering key
  * (IntervalType.compare semantics: 30-day months, exact arithmetic)
  * as DECIMAL(38,0) micros. Accepts an interval string (parsed through
  * the reference grammar) or a CalendarInterval. Codegen'd. */
case class IntervalOrderKeyExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_interval_order"
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | CalendarIntervalType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string or interval argument, got " +
            other.simpleString)
    }
  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String       => GraftInterval.orderKeyString(s)
    case ci: CalendarInterval => GraftInterval.orderKeyCal(ci)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.GraftInterval.orderKeyString($c)")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.GraftInterval.orderKeyCal($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_interval_add(a, b)` / `graft_interval_sub(a, b)` — the
  * reference's interval±interval: joda Period::plus/minus field-wise,
  * NO post-normalization ('20 hours' + '20 hours' = 40:00:00). */
case class IntervalAddExpr(left: Expression, right: Expression,
                           negate: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String =
    if (negate) "graft_interval_sub" else "graft_interval_add"
  override def dataType: DataType = CalendarIntervalType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    // NullType allowed: the reference registers these STRICTNULL, so a
    // bare NULL operand yields NULL (nullSafeEval never runs)
    if (Seq(left, right).forall(e => e.dataType == CalendarIntervalType ||
        e.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two interval arguments")
  override def nullSafeEval(a: Any, b: Any): Any =
    if (negate)
      GraftInterval.subtract(a.asInstanceOf[CalendarInterval],
        b.asInstanceOf[CalendarInterval])
    else GraftInterval.add(a.asInstanceOf[CalendarInterval],
      b.asInstanceOf[CalendarInterval])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (negate) "subtract" else "add"
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.GraftInterval.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_interval_mul(iv, k)` — the reference's interval×integer:
  * per-field int multiply with joda's loud overflow, THEN
  * normalizedStandard; fractional factors implicit-cast by truncation
  * (1 hour × 3.5 = 3 hours). */
case class IntervalMulExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_interval_mul"
  override def dataType: DataType = CalendarIntervalType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if ((left.dataType == CalendarIntervalType ||
        left.dataType == NullType) &&
        (right.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
          || right.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (interval, numeric) arguments")
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftInterval.multiply(a.asInstanceOf[CalendarInterval],
      GraftInterval.factorToInt(b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.GraftInterval.multiply($a, " +
        s"graft.plans.GraftInterval.factorToInt(((Object) $b)));")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_ts_diff(end, start)` — the reference's timestamp−timestamp →
  * INTERVAL (SubtractTimestampScalar: duration split into days + time,
  * no months). */
case class TsDiffExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_ts_diff"
  override def dataType: DataType = CalendarIntervalType
  private def isTs(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType || t == NullType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isTs(left.dataType) && isTs(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two timestamp arguments")
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftInterval.tsDiff(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.GraftInterval.tsDiff($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_interval_from_micros(x)` — duration micros → the folded
  * (0 months, days, micros) interval (the reference's back-conversion
  * for duration-valued aggregates like interval percentile). */
case class IntervalFromMicrosExpr(child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "graft_interval_from_micros"
  override def dataType: DataType = CalendarIntervalType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | _: DecimalType | DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a numeric micros argument, got " +
            other.simpleString)
    }
  override def nullSafeEval(input: Any): Any = {
    val us = input match {
      case l: Long    => l
      case i: Int     => i.toLong
      case d: Double  => math.rint(d).toLong
      case d: org.apache.spark.sql.types.Decimal => d.toLong
    }
    GraftInterval.fromMicros(us)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DoubleType =>
        defineCodeGen(ctx, ev, c =>
          s"graft.plans.GraftInterval.fromMicros((long) java.lang.Math.rint($c))")
      case _: DecimalType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.GraftInterval.fromMicros($c.toLong())")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.GraftInterval.fromMicros((long) $c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_interval_format(s)` — parse (once) + the reference's display
  * form. Codegen'd. */
case class IntervalFormatExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_interval_format"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | CalendarIntervalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string or interval argument, got " +
            other.simpleString)
    }
  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String        => GraftInterval.formatString(s)
    case ci: CalendarInterval => GraftInterval.formatCal(ci)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case CalendarIntervalType =>
        defineCodeGen(ctx, ev, c => s"graft.plans.GraftInterval.formatCal($c)")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.GraftInterval.formatString($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
