package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `TIME WITH TIME ZONE` value semantics (TimeTZ.java:26,
  * TimeTZParser.java:97): a value is (microsFromMidnight, secondsFromUTC),
  * equality is component-wise, and ordering compares micros first, then
  * the offset — NOT the UTC-normalized instant. graft models the type as
  * `STRUCT<micros: BIGINT, offset_sec: INT>`, whose struct ordering is
  * exactly that lexicographic compare, so ORDER BY / GROUP BY / joins on
  * TIMETZ columns behave like the reference with zero extra machinery.
  *
  * Accepted literals (TimeTZParser's formatter): `HH[[:]MM[[:]SS]]` with
  * an optional `.fraction` (up to 9 digits) and an optional offset suffix
  * `Z` or `(+|-)HH[[:]MM[[:]SS]]`. NAMED time zones (`[VV]` in the
  * reference's pattern) are REJECTED here with the fix named: the
  * reference resolves them against `Instant.now()`
  * (TimeTZParser.java:117), which makes the same literal parse to
  * different offsets depending on when a task retries — the
  * irreproducibility graft's determinism invariant exists to prevent.
  */
object TimeTzUtil {
  private val Pat = java.util.regex.Pattern.compile(
    "^(\\d{2})(?::?(\\d{2})(?::?(\\d{2}))?)?(?:\\.(\\d{1,9}))?" +
      "(Z|[+-]\\d{2}(?::?\\d{2}(?::?\\d{2})?)?)?$")

  val MaxMicros: Long = 24L * 3600 * 1000000 - 1

  /** (microsFromMidnight, secondsFromUTC) from a TIMETZ literal. */
  def parse(s0: String): (Long, Int) = {
    val s = s0.replaceAll("\\s+", "")
    val m = Pat.matcher(s)
    if (!m.matches()) {
      if (s.matches(".*[A-Za-z_/]{2,}.*"))
        throw new IllegalArgumentException(
          s"value [$s0] uses a named time zone — clock-dependent in the " +
            "reference; use an explicit offset like '+02:00'")
      throw new IllegalArgumentException(
        s"value [$s0] is not a valid literal for TimeTZType")
    }
    val hh = m.group(1).toInt
    val mm = Option(m.group(2)).map(_.toInt).getOrElse(0)
    val ss = Option(m.group(3)).map(_.toInt).getOrElse(0)
    if (hh > 23 || mm > 59 || ss > 59)
      throw new IllegalArgumentException(
        s"value [$s0] is not a valid literal for TimeTZType")
    val frac = Option(m.group(4)).getOrElse("")
    // fraction digits are nanos left-aligned; micros = first 6, padded
    val micros = (frac + "000000").take(6).toLong
    val total = (((hh * 60L + mm) * 60) + ss) * 1000000L + micros
    val off = Option(m.group(5)) match {
      case None | Some("Z") => 0
      case Some(o) =>
        val sign = if (o.charAt(0) == '-') -1 else 1
        val digits = o.substring(1).replace(":", "")
        val oh = digits.substring(0, 2).toInt
        val om = if (digits.length >= 4) digits.substring(2, 4).toInt else 0
        val os = if (digits.length >= 6) digits.substring(4, 6).toInt else 0
        // bound the TOTAL, not just the hour field: ±18:00 exactly is
        // the ZoneOffset limit, so '+18:30' must fail HERE (at parse)
        // rather than later inside format()'s ofTotalSeconds (ADVICE r12)
        if (om > 59 || os > 59 ||
            oh * 3600 + om * 60 + os > 18 * 3600)
          throw new IllegalArgumentException(
            s"value [$s0] has an out-of-range offset (max ±18:00)")
        sign * (oh * 3600 + om * 60 + os)
    }
    (total, off)
  }

  /** The TIMETZ value type: STRUCT<micros, offset_sec>, whose struct
    * ordering IS the reference's (micros, offset) lexicographic compare. */
  val structType: StructType = StructType(Seq(
    StructField("micros", LongType, nullable = false),
    StructField("offset_sec", IntegerType, nullable = false)))

  /** ONE parse → the full struct row (called from interpreted eval and
    * generated code alike). */
  def parseStruct(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (m, o) = parse(s.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m, o))
  }

  /** TimeTZParser.formatTime: ISO local time (fraction only when
    * non-zero, in 3-digit groups) plus the ISO offset when non-zero. */
  def format(micros: Long, offsetSec: Int): UTF8String = {
    val lt = java.time.LocalTime.ofNanoOfDay(micros * 1000L)
      .format(java.time.format.DateTimeFormatter.ISO_TIME)
    UTF8String.fromString(
      if (offsetSec == 0) lt
      else lt + java.time.ZoneOffset.ofTotalSeconds(offsetSec).toString)
  }
}

/** `timetz(s)` — parses the literal ONCE per row and returns the full
  * STRUCT<micros, offset_sec> value (ADVICE r12: the previous
  * two-component registration ran the regex parse twice per row, and
  * would have double-evaluated a non-deterministic input). Codegen'd. */
case class TimeTzParseExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "timetz"
  override def dataType: DataType = TimeTzUtil.structType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    TimeTzUtil.parseStruct(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TimeTzUtil.parseStruct($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}



/** `timetz_format(micros, offset_sec)` — the reference's display form. */
case class TimeTzFormatExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "timetz_format"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    TimeTzUtil.format(l.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.TimeTzUtil.format($l, $r)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
