package graft

import graft.plans.TsCastUtil

/** The reference's TIMESTAMP cast ported as behavioral goldens
  * (server/src/test/java/io/crate/types/TimestampTypesTest.java +
  * TimestampType.implicitCast + the pg-wire decode vector from
  * protocols/postgres/types/TimestampTypeTest.java):
  *  - bare-integer strings and integer numbers are epoch MILLIS
  *    (Spark's cast nulls the former and reads the latter as seconds);
  *  - doubles/floats are SECONDS with millis fractions;
  *  - the grammar is ISO date [('T'|' ') time [offset]], STRICT and
  *    LOUD; `timestamp` (without tz) parses-then-IGNORES offsets,
  *    `timestamptz` applies them; sub-milli digits TRUNCATE to millis.
  */
class TimestampCastConformanceSpec extends SparkTestBase {

  private def tz(s: String): Long = TsCastUtil.parseMillis(s, withTz = true)
  private def ntz(s: String): Long = TsCastUtil.parseMillis(s, withTz = false)

  test("with-zone parse vectors (testTimestampWithZoneParse*)") {
    assert(tz("1999-01-08T01:00:00Z") == 915757200000L)
    assert(tz("1999-01-08T01:00:00+00") == 915757200000L)
    assert(tz("1999-01-08T04:00:00-03:00") == 915778800000L)
    assert(tz("1999-01-08T04:00:00+0300") == 915757200000L)
    assert(tz("1999-01-08T04:00:00+03:00") == 915757200000L)
    assert(tz("1999-01-08T04:00:00.123456789+03:00") == 915757200123L)
    assert(tz("1999-01-08T04:00:00+0000") == 915768000000L)
    assert(tz("1999-01-08T04:00:00.123456789-0000") == 915768000123L)
    // SQL-standard space separator
    assert(tz("1999-01-08 01:00:00Z") == 915757200000L)
    assert(tz("1999-01-08 04:00:00+03:00") == 915757200000L)
    assert(tz("1999-01-08 04:00:00.123456789+03:00") == 915757200123L)
    // no offset → UTC; bare date → midnight UTC
    assert(tz("1999-01-08") == 915753600000L)
    assert(tz("1999-01-08T04:00:00") == 915768000000L)
    assert(tz("1999-01-08T04:00:00.123456789") == 915768000123L)
    assert(tz("1999-01-08 04:00:00.123456789") == 915768000123L)
  }

  test("without-zone parse vectors: offsets parsed but IGNORED " +
      "(testTimestampWithoutZoneParse*)") {
    val expected = 915768000000L
    assert(ntz("1999-01-08T04:00:00Z") == expected)
    assert(ntz("1999-01-08T04:00:00+09:00") == expected)
    assert(ntz("1999-01-08T04:00:00+0900") == expected)
    assert(ntz("1999-01-08T04:00:00-0100") == expected)
    assert(ntz("1999-01-08 04:00:00Z") == expected)
    assert(ntz("1999-01-08 04:00:00+0900") == expected)
    assert(ntz("1999-01-08") == 915753600000L)
    assert(ntz("1999-01-08T04:00:00") == expected)
    assert(ntz("1999-01-08T04:00:00.123456789") == expected + 123)
    assert(ntz("1999-01-08T04:00:00+01") == expected)
    assert(ntz("1999-01-08T04:00:00.123456789+01:00") == expected + 123)
    assert(ntz("1999-01-08 04:00:00") == expected)
    assert(ntz("1999-01-08 04:00:00.123456789+01:00") == expected + 123)
    // the pg-wire decode vector: sub-milli digits truncate
    assert(ntz("2021-01-13T14:37:17.25988") == 1610548637259L)
    assert(ntz("2021-01-13 14:37:17.25988") == 1610548637259L)
  }

  test("malformed separators fail LOUDLY with the reference's message") {
    for (bad <- Seq("1999-01-08  04:00:00", "1999-01-0804:00:00",
        "1999-01-08 T04:00:00")) {
      val e1 = intercept[IllegalArgumentException](tz(bad))
      assert(e1.getMessage.contains("could not be parsed"), bad)
      val e2 = intercept[IllegalArgumentException](ntz(bad))
      assert(e2.getMessage.contains("could not be parsed"), bad)
    }
  }

  test("DATE cast (DateType.implicitCast): grammar-first, epoch-millis " +
      "fallback, truncation-to-day quirk, loud garbage") {
    import graft.plans.DateCastUtil
    import org.apache.spark.unsafe.types.UTF8String
    def d(s: String): Int = DateCastUtil.fromString(UTF8String.fromString(s))
    assert(d("1999-01-08") == 10599) // epoch day
    assert(d("1999-01-08T04:00:00") == 10599) // date part of a datetime wins
    assert(d("86400000") == 1) // bare long = epoch millis → 1970-01-02
    assert(DateCastUtil.fromMillis(86400000L + 3600_000L) == 1)
    assert(DateCastUtil.fromDouble(86400.5) == 1) // double = seconds
    // the faithful truncation-toward-zero quirk: -1 ms is epoch day 0,
    // not -1 (the reference divides with `/`, not floorDiv)
    assert(DateCastUtil.fromMillis(-1L) == 0)
    val e = intercept[ClassCastException](d("not a date"))
    assert(e.getMessage == "Can't cast 'not a date' to date")
  }

  test("BOOLEAN cast (BooleanType.implicitCast): PG map with on/off, " +
      "untrimmed, loud; numbers true iff strictly positive") {
    import graft.plans.BoolCastUtil
    import org.apache.spark.unsafe.types.UTF8String
    def b(s: String): Boolean = BoolCastUtil.fromString(UTF8String.fromString(s))
    for (t <- Seq("t", "TRUE", "y", "Yes", "on", "1")) assert(b(t), t)
    for (f <- Seq("f", "false", "N", "no", "OFF", "0")) assert(!b(f), f)
    val e = intercept[IllegalArgumentException](b(" t")) // untrimmed
    assert(e.getMessage == "Can't convert \" t\" to boolean")
    intercept[IllegalArgumentException](b("maybe"))
    // strictly-positive rule: -1 is FALSE (Spark's nonzero rule says true)
    assert(!BoolCastUtil.fromDouble(-1.0))
    assert(!BoolCastUtil.fromDouble(0.0))
    assert(BoolCastUtil.fromDouble(0.5))
    // SQL surface
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT 'on'::boolean AS a, 'off'::boolean AS b, " +
        "(0 - 1)::boolean AS c, 2::boolean AS d, " +
        "CAST('1999-01-08T04:00:00' AS DATE) AS e, " +
        "'86400000'::date AS f").collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(!r.getBoolean(2) && r.getBoolean(3))
    assert(r.getDate(4).toString == "1999-01-08")
    assert(r.getDate(5).toString == "1970-01-02")
  }

  test("implicitCast branches through SQL: integer strings/numbers are " +
      "MILLIS, doubles are seconds (::timestamp routes in the Dialect)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT CAST('86400000'::timestamp AS STRING) AS a, " +
        "CAST(86400000::timestamp AS STRING) AS b, " +
        "CAST(1.5::timestamp AS STRING) AS c, " +
        "CAST('1999-01-08T04:00:00+03:00'::timestamptz AS STRING) AS d, " +
        "CAST('1999-01-08T04:00:00+03:00'::timestamp AS STRING) AS e, " +
        "CAST(CAST('86400000' AS TIMESTAMP) AS STRING) AS f").collect()(0)
    assert(r.getString(0).startsWith("1970-01-02 00:00:00"))
    assert(r.getString(1).startsWith("1970-01-02 00:00:00")) // millis, not seconds
    assert(r.getString(2).startsWith("1970-01-01 00:00:01.5")) // double = seconds
    assert(r.getString(3).startsWith("1999-01-08 01:00:00")) // offset applied
    assert(r.getString(4).startsWith("1999-01-08 04:00:00")) // offset ignored
    assert(r.getString(5).startsWith("1970-01-02 00:00:00")) // CAST AS spelling
    // column-typed operands pass through (q74-family CAST(ts AS
    // TIMESTAMP) on the ntz fixture keeps its value)
    graft.Tables.registerAll(spark, sfDir)
    val ev = Engine.sql(spark,
      "SELECT CAST(ts AS TIMESTAMP) AS t FROM events ORDER BY event_id " +
        "LIMIT 1").collect()(0)
    assert(!ev.isNullAt(0))
    // garbage is LOUD, not silently NULL like Spark's cast
    val e = intercept[Exception](Engine.sql(spark,
      "SELECT 'not a ts'::timestamp AS x").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("could not be parsed")),
      msgs(e).mkString(" | "))
  }
}
