package graft

import graft.plans.TimeTzUtil

/** The reference's OWN unit-test vectors for the two fringe types,
  * ported wholesale (continuing the r12 conformance discipline of
  * JsReferenceConformanceSpec):
  *  - server/src/test/java/io/crate/types/TimeTZParserTest.java —
  *    every parse/format vector (error messages differ; error CLASS and
  *    loudness match)
  *  - libs/sql-parser/src/test/java/io/crate/sql/tree/BitStringTest.java
  *    and server/src/test/java/io/crate/types/BitStringTypeTest.java —
  *    validation, ordering, and the trim/extend explicit cast. */
class FringeReferenceConformanceSpec extends SparkTestBase {

  private def p(s: String): (Long, Int) = TimeTzUtil.parse(s)

  test("T1 parse, correct syntax, no colon") {
    assert(p("12") == (43200000000L, 0))
    assert(p("12.000001") == (43200000001L, 0))
    assert(p("1200") == (43200000000L, 0))
    assert(p("1200.002") == (43200002000L, 0))
    assert(p("120000") == (43200000000L, 0))
    assert(p("120000.000003") == (43200000003L, 0))
  }

  test("T2 parse, correct syntax, colon") {
    assert(p("12:00") == (43200000000L, 0))
    assert(p("12:00.999") == (43200999000L, 0))
    assert(p("12:00:00") == (43200000000L, 0))
    assert(p("12:00:00.003") == (43200003000L, 0))
  }

  test("T3 parse, correct syntax, tz") {
    assert(p("00+12") == (0L, 12 * 3600))
    assert(p("00+1200") == (0L, 12 * 3600))
    assert(p("00-12:00") == (0L, -12 * 3600))
    assert(p("00.0+12") == (0L, 12 * 3600))
    assert(p("00.0+1200") == (0L, 12 * 3600))
    assert(p("00.000001  +12:00") == (1L, 12 * 3600))
  }

  test("T4 every reference parse-error vector fails loudly") {
    // hour/minute/second range + unparsed-tail cases; the reference
    // raises IllegalArgumentException with a field-specific message —
    // graft raises the same class with the literal named
    for (bad <- Seq("24:00:00.000001", "234", "234.9999", "25", "1778",
        "175978", "25.999999", "1778.999999", "175978.999999")) {
      val e = intercept[IllegalArgumentException](p(bad))
      assert(e.getMessage.contains(bad), s"'$bad': ${e.getMessage}")
    }
  }

  test("T5 parse equivalences (test_parse_time)") {
    val four = p("04")
    assert(four == (4L * 3600 * 1000000, 0))
    for (same <- Seq("0400", "04:00", "040000", "04:00:00", "040000.0",
        "04:00:00.0"))
      assert(p(same) == four, same)
    val fourZ = p("04+00")
    for (same <- Seq("04:00:00.0+00", "04:00:00.0+0000", "04:00:00.0+00:00"))
      assert(p(same) == fourZ, same)
  }

  test("T6 formatTime vectors (test_format_time / _with_tz)") {
    def f(m: Long, o: Int): String = TimeTzUtil.format(m, o).toString
    assert(f(14400000000L, 0) == "04:00:00")
    assert(f(14400123000L, 0) == "04:00:00.123")
    assert(f(14400123666L, 65) == "04:00:00.123666+00:01:05")
    assert(f(14400123000L, 123) == "04:00:00.123+00:02:03")
    assert(f(14400123666L, 14 * 3600 + 59 * 60) == "04:00:00.123666+14:59")
  }

  test("B1 raw-bits validation (BitStringTest)") {
    graft.functions.GraftFunctions.registerAll(spark)
    // 0/1 parse OK; any other character is named in the error
    assert(Engine.sql(spark, "SELECT B'00000110' AS b").collect()(0)
      .getString(0) == "00000110")
    val e = intercept[Exception](
      Engine.sql(spark, "SELECT B'0021' AS b").collect())
    assert(e.getMessage.toLowerCase.contains("bit"), e.getMessage)
  }

  test("B2 lexicographic order = string compare (test_lexicographically_order)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT B'1001' < B'1111' AS a, B'1111' > B'1001' AS b, " +
        "(B'111' < B'0001') = ('111' < '0001') AS c").collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("B3 explicit cast trims AND extends (BitStringTypeTest)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT '1111'::bit(3) AS t, '111'::bit(4) AS x").collect()(0)
    assert(r.getString(0) == "111")  // test_explicit_cast_can_trim
    assert(r.getString(1) == "1110") // test_explicit_cast_can_extend
  }

  test("A1 type-name aliases (DataTypesTest): int2/int4/int8/float4/" +
      "float8/varchar/decimal resolve through casts") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT 1::int2 AS a, 1::int4 AS b, 1::int8 AS c, " +
        "1.5::float4 AS d, 1.5::float8 AS e, 7::varchar AS f, " +
        "1.25::decimal(4,2) AS g").collect()(0)
    assert(r.getShort(0) == 1 && r.getInt(1) == 1 && r.getLong(2) == 1L)
    assert(r.getFloat(3) == 1.5f && r.getDouble(4) == 1.5)
    assert(r.getString(5) == "7")
    assert(BigDecimal(r.getDecimal(6)) == BigDecimal("1.25"))
  }

  test("A2 text casts (StringTypeTest/CharacterTypeTest): boolean 't'/'f', " +
      "varchar(n) truncates, char(n) truncates and blank-pads") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT true::text AS a, false::text AS b, 123::text AS c, " +
        "'abcde'::varchar(1) AS d, 'a    '::varchar(2) AS e, " +
        "'abc'::varchar(5) AS f, 'foo'::char(1) AS g, true::char(1) AS h, " +
        "'a'::char(5) AS i, (-12)::char(1) AS j").collect()(0)
    assert(r.getString(0) == "t" && r.getString(1) == "f") // PG booleans
    assert(r.getString(2) == "123")
    assert(r.getString(3) == "a")    // explicit varchar(1) truncates
    assert(r.getString(4) == "a ")   // keeps inner blank, truncates to 2
    assert(r.getString(5) == "abc")  // within limit, untouched
    assert(r.getString(6) == "f")    // char(1) truncates
    assert(r.getString(7) == "t")    // char(1) of boolean
    assert(r.getString(8) == "a    ") // char(5) blank-pads
    assert(r.getString(9) == "-")    // char(1) of -12
  }

  test("A3 IP casts (IpTypeTest): validate, normalize, numbers render, " +
      "negatives and garbage reject") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT '127.0.0.1'::ip AS a, '::ffff:192.168.0.1'::ip AS b, " +
        "CAST(3232235521 AS BIGINT)::ip AS c, 0::ip AS d").collect()(0)
    assert(r.getString(0) == "127.0.0.1")
    assert(r.getString(1) == "192.168.0.1") // IPv4-mapped form normalizes
    assert(r.getString(2) == "192.168.0.1") // longToIp
    assert(r.getString(3) == "0.0.0.0")
    val e1 = intercept[Exception](
      Engine.sql(spark, "SELECT '2000.0.0.1'::ip AS x").collect())
    assert(e1.getMessage.contains("Failed to validate ip"), e1.getMessage)
    val e2 = intercept[Exception](
      Engine.sql(spark, "SELECT (0 - 5)::ip AS x").collect())
    assert(e2.getMessage.contains("Failed to convert long"), e2.getMessage)
  }

  test("A3b IP casts, round-13 review fixes: RFC 5952 compressed IPv6, " +
      "Guava-strict IPv4") {
    graft.functions.GraftFunctions.registerAll(spark)
    import graft.plans.IpCastUtil
    import org.apache.spark.unsafe.types.UTF8String
    def ip(s: String): String =
      IpCastUtil.fromString(UTF8String.fromString(s)).toString
    // the reference renders IPv6 via Guava toAddrString = RFC 5952
    // compressed, not java.net's expanded form (ADVICE r12)
    assert(ip("::1") == "::1")
    assert(ip("0:0:0:0:0:0:0:1") == "::1")
    assert(ip("2001:0DB8:0:0:0:0:0:1") == "2001:db8::1") // lowercase hex
    assert(ip("2001:db8:0:1:1:1:1:1") == "2001:db8:0:1:1:1:1:1") // 1-run stays
    assert(ip("2001:0:0:1:0:0:0:1") == "2001:0:0:1::1") // longest run wins
    assert(ip("2001:db8:0:0:1:0:0:1") == "2001:db8::1:0:0:1") // tie → leftmost
    assert(ip("fe80::") == "fe80::")
    assert(ip("::") == "::")
    // Guava-strict IPv4 (InetAddresses.isInetAddress): no surrounding
    // whitespace, no sign, no leading zeros (ADVICE r12)
    // zone-scoped IPv6 literals are Guava-rejected (ADVICE r13:
    // java.net resolves 'fe80::1%eth0' and silently drops the scope)
    for (bad <- Seq("010.0.0.1", "+1.2.3.4", " 127.0.0.1", "127.0.0.1 ",
        "1.2.3", "1.2.3.4.5", "1..2.3", "256.1.1.1", " ::1",
        "fe80::1%eth0", "fe80::1%1", "::1%lo")) {
      val e = intercept[IllegalArgumentException](ip(bad))
      assert(e.getMessage.contains("Failed to validate ip"), bad)
    }
    intercept[IllegalArgumentException](
      graft.plans.IpCastUtil.parseBytes("fe80::1%eth0"))
    assert(ip("0.0.0.0") == "0.0.0.0") // lone '0' octets stay legal
    assert(ip("255.255.255.255") == "255.255.255.255")
  }

  test("A4 concat() SKIPS nulls, || stays strict " +
      "(ConcatFunction.java:222 vs :197)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT concat(CAST(NULL AS STRING), 'x') AS a, " +
        "concat('a', CAST(NULL AS STRING), 'b') AS b, " +
        "concat(CAST(NULL AS STRING), CAST(NULL AS STRING)) AS c, " +
        "'a' || CAST(NULL AS STRING) AS d, " +
        "concat('a', 1) AS e, " +
        "concat('v=', 2 > 1) AS f, " +
        "concat(array(1, 2), array(3)) AS g").collect()(0)
    assert(r.getString(0) == "x")
    assert(r.getString(1) == "ab")
    assert(r.getString(2) == "") // all-null concat is '', not NULL
    assert(r.isNullAt(3)) // the operator is strict on both engines
    assert(r.getString(4) == "a1")
    assert(r.getString(5) == "v=t") // implicit boolean→text is 't'/'f'
    assert(r.getSeq[Int](6) == Seq(1, 2, 3)) // arrays keep Concat
  }

  test("B4 valueForInsert requires the exact length (write-time)") {
    // test_value_for_insert_only_allows_exact_length_matches: a column
    // write rejects a length mismatch even though the CAST would extend
    val root = graft.ArtifactStore.scratchDir("graft_bvi")
      .toFile.getAbsolutePath
    val r = new StatementRouter(spark, root)
    r.execute("CREATE TABLE bvi (id BIGINT PRIMARY KEY, b BIT(3))")
    val e = intercept[Exception](
      r.execute("INSERT INTO bvi (id, b) VALUES (1, B'00010001')"))
    assert(e.getMessage.toLowerCase.contains("check") ||
      e.getMessage.contains("bit"), e.getMessage)
  }
}
