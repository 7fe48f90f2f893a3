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
  * Literal parsing avoids DNS: IPv4 is hand-parsed with Guava's
  * strictness (InetAddresses.isInetAddress — NO surrounding whitespace,
  * each octet 1-3 digits, no sign, no leading zero: '010.0.0.1' and
  * '+1.2.3.4' raise like the reference; ADVICE r12); anything
  * containing ':' is an IPv6 literal (hostnames cannot contain ':'),
  * parsed by java.net and rendered in the RFC 5952 compressed form the
  * reference emits via Guava toAddrString ('::1', not the expanded
  * '0:0:0:0:0:0:0:1'; ADVICE r12) — IPv4-mapped forms collapse to the
  * dotted quad like the reference's formatter. */
object IpCastUtil {

  /** Guava parseOctet's grammar: 1-3 digits, ≤255, no leading zero
    * except "0" itself, no sign. */
  private val Ipv4Strict = java.util.regex.Pattern.compile(
    "(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]\\d|\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]\\d|\\d)){3}")

  /** RFC 5952 §4 rendering of 16 address bytes (Guava toAddrString):
    * lowercase hex, no leading zeros, the LONGEST run of two-or-more
    * zero groups collapsed to '::' (leftmost wins a tie). */
  private def rfc5952(bytes: Array[Byte]): String = {
    val g = Array.tabulate(8)(i =>
      ((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff))
    var bestStart = -1
    var bestLen = 1 // runs of exactly one zero group do NOT compress
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    val sb = new StringBuilder
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::")
        i += bestLen
      } else {
        if (sb.nonEmpty && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        i += 1
      }
    }
    sb.toString
  }

  def fromString(s0: UTF8String): UTF8String = {
    val s = s0.toString
    val norm =
      if (s.indexOf(':') >= 0) {
        // IPv6 literal (possibly IPv4-mapped); java.net parses literals
        // without DNS because of the ':' gate above. Reject untrimmed
        // input before java.net gets a chance to be lenient.
        if (s != s.trim) fail(s)
        val addr =
          try java.net.InetAddress.getByName(s)
          catch { case _: Exception => fail(s) }
        addr match {
          case v4: java.net.Inet4Address => v4.getHostAddress
          case v6 => rfc5952(v6.getAddress)
        }
      } else {
        if (!Ipv4Strict.matcher(s).matches()) fail(s)
        s
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
