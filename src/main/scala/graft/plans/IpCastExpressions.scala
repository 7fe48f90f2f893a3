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

  /** Strict IP literal → address bytes (4 for IPv4 and IPv4-mapped
    * forms, 16 for IPv6), loud on garbage — the byte view the CIDR
    * operator ranges over. */
  def parseBytes(s: String): Array[Byte] =
    if (s.indexOf(':') >= 0) {
      if (s != s.trim) fail(s)
      // Guava's InetAddresses.forString rejects zone-scoped literals
      // ('fe80::1%eth0'); java.net resolves the scope id and would
      // silently drop it on render (ADVICE r13) — gate it first
      if (s.indexOf('%') >= 0) fail(s)
      try java.net.InetAddress.getByName(s).getAddress
      catch { case _: Exception => fail(s) }
    } else {
      if (!Ipv4Strict.matcher(s).matches()) fail(s)
      s.split('.').map(o => o.toInt.toByte)
    }

  def fromString(s0: UTF8String): UTF8String = {
    val s = s0.toString
    val norm =
      if (s.indexOf(':') >= 0) {
        // IPv6 literal (possibly IPv4-mapped); java.net parses literals
        // without DNS because of the ':' gate above. Reject untrimmed
        // and zone-scoped ('%eth0' — Guava-rejected, ADVICE r13) input
        // before java.net gets a chance to be lenient.
        if (s != s.trim) fail(s)
        if (s.indexOf('%') >= 0) fail(s)
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

/** The reference's CIDR containment operator `ip << 'cidr'`
  * (server/src/main/java/io/crate/expression/operator/CIDROperator.java:64
  * containedWithin): an ip with a '/' or a cidr without one raises the
  * reference's exact "operands are incorrect" message; both literals
  * parse strictly (IPv4 AND IPv6 — the previous graft operator was
  * IPv4-only and silently null on garbage); the cidr's address need not
  * be the network base (obtainBounds masks it); containment is an
  * unsigned BigInteger range test over the address bytes, so a
  * mixed-family probe compares numerically exactly like the reference. */
object CidrUtil {

  def containedWithin(ipS: UTF8String, cidrS: UTF8String): Boolean =
    containedWithin(ipS.toString, cidrS.toString)

  def containedWithin(ip: String, cidr: String): Boolean = {
    if (!cidr.contains("/") || ip.contains("/"))
      throw new IllegalArgumentException(
        s"operands are incorrect, expected [ip, cidr], got [$ip, $cidr]")
    val ipNum = new java.math.BigInteger(1, IpCastUtil.parseBytes(ip))
    val slash = cidr.lastIndexOf('/')
    val addr = IpCastUtil.parseBytes(cidr.substring(0, slash))
    val len =
      try Integer.parseInt(cidr.substring(slash + 1))
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"Invalid CIDR prefix length in [$cidr]")
      }
    val bits = addr.length * 8
    if (len < 0 || len > bits)
      throw new IllegalArgumentException(
        s"Invalid CIDR prefix length in [$cidr]")
    val lower = new Array[Byte](addr.length)
    val upper = new Array[Byte](addr.length)
    var i = 0
    while (i < addr.length) {
      val maskBits = math.max(0, math.min(8, len - i * 8))
      val mask = (0xff << (8 - maskBits)) & 0xff
      lower(i) = (addr(i) & mask).toByte
      upper(i) = ((addr(i) & mask) | (~mask & 0xff)).toByte
      i += 1
    }
    new java.math.BigInteger(1, lower).compareTo(ipNum) <= 0 &&
      ipNum.compareTo(new java.math.BigInteger(1, upper)) <= 0
  }
}

/** `ip << cidr` — registered as graft_contained_within; the Dialect
  * rewrites the reference's `<<` operator (which is ONLY the CIDR
  * containment in the reference grammar — there is no integer shift)
  * to this. Codegen'd. */
case class CidrContainedWithinExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_contained_within"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType == StringType ||
        e.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ip string, cidr string) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullSafeEval(a: Any, b: Any): Any =
    CidrUtil.containedWithin(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.CidrUtil.containedWithin($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_ip_sortkey(ip)` — the reference's IP ordering key
  * (IpType.java:199 compare: `Arrays.compareUnsigned` over the parsed
  * address bytes) as BINARY: Spark orders BinaryType by the same
  * unsigned lexicographic byte comparison with shorter-prefix-first
  * ties, so ORDER BY this key reproduces the reference's total order
  * across MIXED IPv4/IPv6 columns (a 4-byte v4 value compares against
  * a v6 value's leading bytes — '::1' sorts before '10.0.0.1', which
  * sorts before '2001:db8::1') and distributes through Spark's native
  * range sort. Codegen'd. */
case class IpSortKeyExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_ip_sortkey"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ip string argument, got " +
        child.dataType.simpleString)
  override def nullSafeEval(input: Any): Any =
    IpCastUtil.parseBytes(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.IpCastUtil.parseBytes($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
