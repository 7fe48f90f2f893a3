package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's IP cast semantics (IpType.java:150 implicitCast):
  *  - a STRING must be a valid IP literal and NORMALIZES
  *    ('::ffff:192.168.0.1' → '192.168.0.1'); garbage like '2000.0.0.1'
  *    raises "Failed to validate ip […]" — graft's previous plain
  *    string cast silently passed anything through;
  *  - a NUMBER renders as the dotted quad via the reference's exact
  *    per-octet modulo arithmetic (longToIp — no range error above
  *    2^32, faithful), negatives raise "Failed to convert long value".
  *
  * Literal parsing avoids DNS: IPv4 is hand-parsed strictly; anything
  * containing ':' is an IPv6 literal (hostnames cannot contain ':'),
  * parsed and normalized by java.net — IPv4-mapped forms collapse to
  * the dotted quad like the reference's Guava formatter. */
object IpCastUtil {

  def fromString(s0: UTF8String): UTF8String = {
    val s = s0.toString.trim
    val norm =
      if (s.indexOf(':') >= 0) {
        // IPv6 literal (possibly IPv4-mapped); java.net parses literals
        // without DNS because of the ':' gate above
        try {
          val addr = java.net.InetAddress.getByName(s)
          addr.getHostAddress
        } catch {
          case _: Exception => fail(s)
        }
      } else {
        graft.functions.GeoNetFunctions.ipv4ToLong(s) match {
          case Some(_) => s.split('.').map(_.toInt).mkString(".")
          case None    => fail(s)
        }
      }
    UTF8String.fromString(norm)
  }

  private def fail(s: String): Nothing =
    throw new IllegalArgumentException(
      s"Failed to validate ip [$s], not a valid ipv4 address")

  /** reference longToIp — per-octet modulo, faithful (no high-bit
    * range check). */
  def fromLong(v: Long): UTF8String = {
    if (v < 0)
      throw new IllegalArgumentException(
        s"Failed to convert long value: $v to ipv4 address")
    UTF8String.fromString(
      s"${(v >> 24) % 256}.${(v >> 16) % 256}.${(v >> 8) % 256}.${v % 256}")
  }
}

/** `x::ip` — validates/normalizes strings, renders numbers. Codegen'd
  * through the type-resolved helper. */
case class IpCastExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_ip_cast"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"Can't cast ${other.simpleString} to ip")
    }
  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => IpCastUtil.fromString(s)
    case n: Long       => IpCastUtil.fromLong(n)
    case n: Int        => IpCastUtil.fromLong(n.toLong)
    case n: Short      => IpCastUtil.fromLong(n.toLong)
    case n: Byte       => IpCastUtil.fromLong(n.toLong)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.plans.IpCastUtil.fromString($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.plans.IpCastUtil.fromLong((long) $c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
