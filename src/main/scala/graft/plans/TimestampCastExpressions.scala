package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's TIMESTAMP cast semantics (server/src/main/java/io/
  * crate/types/TimestampType.java:134 implicitCast + :189/:212 parsers),
  * which Spark's CAST diverges from in three load-bearing ways:
  *  - a BARE-INTEGER STRING is epoch MILLIS ('86400000'::timestamp =
  *    1970-01-02; Spark's cast silently yields NULL);
  *  - an integer NUMBER is epoch millis, while a float/double is
  *    SECONDS with fractional millis (Spark treats all numerics as
  *    seconds);
  *  - the string grammar is exactly ISO_LOCAL_DATE [('T'|' ')
  *    ISO_LOCAL_TIME [offset]] with STRICT resolution and LOUD
  *    "could not be parsed" errors (Spark nulls out), where
  *    `timestamp` (without tz) parses-then-IGNORES an offset and
  *    `timestamptz` applies it. Sub-millisecond fraction digits are
  *    accepted but TRUNCATED to millis ('…17.25988' → .259), because
  *    the reference type is millis-resolution.
  * Timestamp/date-typed inputs pass through with Spark's own
  * conversion (the reference has no work to do there either). */
object TsCastUtil {

  /** Mirrors the reference TIMESTAMP_PARSER (TimestampType.java:235):
    * ISO date, optional space-padded-or-'T' separator, ISO time,
    * optional zone/offset in the accepted spellings, STRICT resolver. */
  private val Parser: java.time.format.DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .append(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE)
      .optionalStart()
      .padNext(1)
      .optionalStart()
      .appendLiteral('T')
      .optionalEnd()
      .append(java.time.format.DateTimeFormatter.ISO_LOCAL_TIME)
      .optionalStart()
      .appendPattern("[Z][VV][x][xx][xxx]")
      .toFormatter(java.util.Locale.ENGLISH)
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  private val UTC = java.time.ZoneOffset.UTC

  /** String → epoch millis per the reference cascade: bare long first,
    * then the grammar; `withTz` selects parseTimestamp (offset applied)
    * vs parseTimestampIgnoreTimeZone (offset parsed but ignored). */
  def parseMillis(s: String, withTz: Boolean): Long = {
    s.toLongOption match {
      case Some(l) => return l
      case None    =>
    }
    import java.time._
    val dt =
      try {
        if (withTz)
          Parser.parseBest(s, OffsetDateTime.from _, LocalDateTime.from _,
            LocalDate.from _)
        else Parser.parseBest(s, LocalDateTime.from _, LocalDate.from _)
      } catch {
        case e: format.DateTimeParseException =>
          throw new IllegalArgumentException(e.getMessage)
      }
    dt match {
      case odt: OffsetDateTime => odt.toInstant.toEpochMilli
      case ldt: LocalDateTime  => ldt.toInstant(UTC).toEpochMilli
      case ld: LocalDate       => ld.atStartOfDay(UTC).toInstant.toEpochMilli
    }
  }

  /** The DATE cast's string leg (DateType.java:100): the grammar
    * without zone queries, keeping the DATE part of a datetime. */
  def parseLocal(s: String): java.time.LocalDate = {
    import java.time._
    val dt =
      try Parser.parseBest(s, LocalDateTime.from _, LocalDate.from _)
      catch {
        case e: format.DateTimeParseException =>
          throw new IllegalArgumentException(e.getMessage)
      }
    dt match {
      case ldt: LocalDateTime => ldt.toLocalDate
      case ld: LocalDate      => ld
    }
  }

  // Spark TimestampType carries MICROS; the reference value is millis.
  def fromString(s: UTF8String, withTz: Boolean): Long =
    Math.multiplyExact(parseMillis(s.toString, withTz), 1000L)

  /** integer numbers are MILLIS (implicitCast's Number branch). */
  def fromLong(v: Long): Long = Math.multiplyExact(v, 1000L)

  /** float/double are SECONDS with millis fractions (implicitCast's
    * Double/Float branches: `(long) (value * 1000)` millis). */
  def fromDouble(v: Double): Long =
    Math.multiplyExact((v * 1000).toLong, 1000L)
}

/** `x::timestamp` / `x::timestamptz` / CAST(x AS TIMESTAMP …) — the
  * reference's cast; `withTz` per the type spelling (bare `timestamp`
  * is WITHOUT time zone in the reference, DataTypes.java:89).
  * Codegen'd through type-resolved helpers; timestamp/date inputs keep
  * Spark's Cast. */
case class TimestampCastExpr(child: Expression, withTz: Boolean)
    extends UnaryExpression {
  override def prettyName: String = "graft_ts_cast"
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | _: DecimalType | NullType |
           TimestampType | TimestampNTZType | DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"Can't cast ${other.simpleString} to timestamp")
    }
  // timestamp/ntz inputs pass through (identical micros at the
  // contract's UTC session); dates go to midnight UTC — both identical
  // to Spark's own CAST, kept here so the Dialect can reroute EVERY
  // `… AS TIMESTAMP` spelling without knowing the operand type
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case TimestampType | TimestampNTZType => input
    case DateType => input.asInstanceOf[Int].toLong * 86400000000L
    case _ => input match {
      case s: UTF8String => TsCastUtil.fromString(s, withTz)
      case l: Long       => TsCastUtil.fromLong(l)
      case i: Int        => TsCastUtil.fromLong(i.toLong)
      case i: Short      => TsCastUtil.fromLong(i.toLong)
      case i: Byte       => TsCastUtil.fromLong(i.toLong)
      case d: Double     => TsCastUtil.fromDouble(d)
      case f: Float      => TsCastUtil.fromDouble(f.toDouble)
      // Spark types the literal `1.5` as DECIMAL where the reference's
      // parser types it DOUBLE — so the decimal branch takes the
      // reference's double semantics (seconds) to keep the SQL-visible
      // behavior identical; the reference's Number.longValue branch is
      // unreachable from SQL literals
      case d: org.apache.spark.sql.types.Decimal =>
        TsCastUtil.fromDouble(d.toDouble)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c => s"$c")
      case DateType =>
        defineCodeGen(ctx, ev, c => s"((long) $c) * 86400000000L")
      case StringType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.TsCastUtil.fromString($c, $withTz)")
      case DoubleType | FloatType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.TsCastUtil.fromDouble((double) $c)")
      case _: DecimalType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.TsCastUtil.fromDouble($c.toDouble())")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.TsCastUtil.fromLong((long) $c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The reference's DATE cast (server/src/main/java/io/crate/types/
  * DateType.java:94 implicitCast): strings try the TIMESTAMP grammar
  * first (the date part of a datetime wins), then bare-long epoch
  * MILLIS; doubles are seconds; every numeric path truncates to the
  * day with `/ 1000 / 86400` — TRUNCATION TOWARD ZERO, a faithful
  * quirk: pre-1970 millis land one day late vs floor division (the
  * reference uses `/`, not floorDiv). Garbage raises the reference's
  * "Can't cast … to date". Spark representation: DateType days. */
object DateCastUtil {

  def fromString(s0: UTF8String): Int = {
    val s = s0.toString
    try {
      val dt = TsCastUtil.parseLocal(s)
      dt.toEpochDay.toInt
    } catch {
      case _: IllegalArgumentException =>
        val millis =
          try java.lang.Long.parseLong(s)
          catch {
            case _: NumberFormatException =>
              throw new ClassCastException(s"Can't cast '$s' to date")
          }
        fromMillis(millis)
    }
  }

  def fromMillis(millis: Long): Int = (millis / 1000 / 86400).toInt

  def fromDouble(v: Double): Int = fromMillis((v * 1000).toLong)
}

/** `x::date` — the reference cast; date/timestamp operands take the
  * reference's numeric truncation path. Codegen'd. */
case class DateCastExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_date_cast"
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | _: DecimalType | NullType |
           TimestampType | TimestampNTZType | DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"Can't cast ${other.simpleString} to date")
    }
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case DateType => input
    case TimestampType | TimestampNTZType =>
      DateCastUtil.fromMillis(input.asInstanceOf[Long] / 1000L)
    case _ => input match {
      case s: UTF8String => DateCastUtil.fromString(s)
      case l: Long       => DateCastUtil.fromMillis(l)
      case i: Int        => DateCastUtil.fromMillis(i.toLong)
      case i: Short      => DateCastUtil.fromMillis(i.toLong)
      case i: Byte       => DateCastUtil.fromMillis(i.toLong)
      case d: Double     => DateCastUtil.fromDouble(d)
      case f: Float      => DateCastUtil.fromDouble(f.toDouble)
      case d: org.apache.spark.sql.types.Decimal =>
        DateCastUtil.fromDouble(d.toDouble)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DateType => defineCodeGen(ctx, ev, c => s"$c")
      case TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.DateCastUtil.fromMillis($c / 1000L)")
      case StringType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.DateCastUtil.fromString($c)")
      case DoubleType | FloatType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.DateCastUtil.fromDouble((double) $c)")
      case _: DecimalType =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.DateCastUtil.fromDouble($c.toDouble())")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"graft.plans.DateCastUtil.fromMillis((long) $c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
