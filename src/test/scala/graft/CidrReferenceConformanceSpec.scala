package graft

import graft.plans.CidrUtil

/** The reference's CIDROperatorTest ported (server/src/test/java/io/
  * crate/expression/operator/CIDROperatorTest.java) over the round-13
  * `<<` operator (Dialect rewrite → CidrContainedWithinExpr → the
  * CIDROperator.containedWithin algorithm): IPv4 + IPv6 containment
  * with the cidr's address masked to its network (the address need not
  * be the base), and LOUD rejections — an ip carrying '/', a cidr
  * lacking one, or garbage literals all raise (the reference raises
  * ConversionException at its ip CAST for some of these shapes; graft
  * raises IllegalArgumentException from the operator — same loud
  * class of failure with the operand named). */
class CidrReferenceConformanceSpec extends SparkTestBase {

  test("ipv4/ipv6 containment vectors (CIDROperatorTest)") {
    // the cidr address is masked: .1/24 covers .0-.255
    assert(CidrUtil.containedWithin("192.168.0.0", "192.168.0.1/24"))
    assert(CidrUtil.containedWithin("192.168.0.255", "192.168.0.1/24"))
    assert(!CidrUtil.containedWithin("192.168.1.0", "192.168.0.1/24"))
    assert(CidrUtil.containedWithin("10.5.2.3", "10.5.0.0/16"))
    assert(!CidrUtil.containedWithin("10.6.2.3", "10.5.0.0/16"))
    // /0 covers everything; /32 is a point
    assert(CidrUtil.containedWithin("1.2.3.4", "9.9.9.9/0"))
    assert(CidrUtil.containedWithin("1.2.3.4", "1.2.3.4/32"))
    assert(!CidrUtil.containedWithin("1.2.3.5", "1.2.3.4/32"))
    // IPv6 (test_ipv6 family): /120 frees the last byte
    assert(CidrUtil.containedWithin("2001:db8::c7", "2001:db8::1/120"))
    assert(CidrUtil.containedWithin("2001:db8::ff", "2001:db8::1/120"))
    assert(!CidrUtil.containedWithin("2001:db8::1:0", "2001:db8::1/120"))
    // non-byte-aligned prefix
    assert(CidrUtil.containedWithin("192.168.0.63", "192.168.0.0/26"))
    assert(!CidrUtil.containedWithin("192.168.0.64", "192.168.0.0/26"))
    // mixed family compares numerically like the reference's BigInteger
    assert(!CidrUtil.containedWithin("192.168.0.1", "2001:db8::1/120"))
  }

  test("malformed operands raise loudly (wrong order / both ips / " +
      "garbage / bad prefix)") {
    val e1 = intercept[IllegalArgumentException](
      CidrUtil.containedWithin("192.168.0.1/24", "192.168.0.1"))
    assert(e1.getMessage ==
      "operands are incorrect, expected [ip, cidr], got " +
        "[192.168.0.1/24, 192.168.0.1]")
    val e2 = intercept[IllegalArgumentException](
      CidrUtil.containedWithin("192.168.0.0", "192.168.0.1"))
    assert(e2.getMessage.contains("operands are incorrect"))
    intercept[IllegalArgumentException](
      CidrUtil.containedWithin("2001:db8::1/120", "2001:db8::c8"))
    val e3 = intercept[IllegalArgumentException](
      CidrUtil.containedWithin("bogus", "10.0.0.0/8"))
    assert(e3.getMessage.contains("Failed to validate ip"))
    intercept[IllegalArgumentException](
      CidrUtil.containedWithin("10.0.0.1", "10.0.0.0/33"))
    intercept[IllegalArgumentException](
      CidrUtil.containedWithin("10.0.0.1", "10.0.0.0/-1"))
    intercept[IllegalArgumentException](
      CidrUtil.containedWithin("10.0.0.1", "10.0.0.0/x"))
    intercept[IllegalArgumentException](
      CidrUtil.containedWithin("10.0.0.1", "010.0.0.0/8")) // strict octets
    // ipv6 prefix range goes to 128
    assert(CidrUtil.containedWithin("2001:db8::1", "2001:db8::1/128"))
    intercept[IllegalArgumentException](
      CidrUtil.containedWithin("2001:db8::1", "2001:db8::1/129"))
  }

  test("mixed-family IP ordering = Arrays.compareUnsigned over bytes " +
      "(IpType.compare)") {
    graft.functions.GraftFunctions.registerAll(spark)
    import spark.implicits._
    // the reference compares PARSED BYTES unsigned-lexicographically,
    // so a 4-byte v4 value interleaves with v6 values by leading bytes:
    // '::1' (00…01) < '9.0.0.1' < '10.0.0.1' < '2001:db8::1' (20 01 …)
    // < 'ff02::1'
    val ips = Seq("10.0.0.1", "ff02::1", "::1", "2001:db8::1", "9.0.0.1")
      .toDF("ip")
    ips.createOrReplaceTempView("ips_mixed")
    val sorted = Engine.sql(spark,
      "SELECT ip FROM ips_mixed ORDER BY graft_ip_sortkey(ip)")
      .collect().map(_.getString(0)).toSeq
    assert(sorted ==
      Seq("::1", "9.0.0.1", "10.0.0.1", "2001:db8::1", "ff02::1"))
    // within-v4 the numeric order is preserved ('9.x' < '10.x', the
    // q108 property)
    assert(sorted.indexOf("9.0.0.1") < sorted.indexOf("10.0.0.1"))
  }

  test("SQL surface: << routes through the Dialect; null propagation") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT '192.168.0.255' << '192.168.0.1/24' AS a, " +
        "'192.168.1.0' << '192.168.0.1/24' AS b, " +
        "'2001:db8::c7' << '2001:db8::1/120' AS c, " +
        "CAST(NULL AS STRING) << '10.0.0.0/8' AS n1, " +
        "'10.0.0.1' << CAST(NULL AS STRING) AS n2").collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
    assert(r.isNullAt(3) && r.isNullAt(4))
    // and with a normalized ::ip cast on the left, like the reference's
    // typed form '…'::ip << '…/24'
    val r2 = Engine.sql(spark,
      "SELECT '192.168.0.0'::ip << '192.168.0.1/24' AS a").collect()(0)
    assert(r2.getBoolean(0))
    val e = intercept[Exception](Engine.sql(spark,
      "SELECT '192.168.0.0' << '192.168.0.1' AS x").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null &&
      m.contains("operands are incorrect")), msgs(e).mkString(" | "))
  }
}
