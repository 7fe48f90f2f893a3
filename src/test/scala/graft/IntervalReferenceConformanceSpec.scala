package graft

import graft.plans.GraftInterval

/** The reference's IntervalParserTest ported wholesale (server/src/
  * test/java/io/crate/interval/IntervalParserTest.java) — every parse
  * vector asserted as the normalized (months, days, micros) triple
  * Spark's CalendarInterval carries, every error vector asserted loud.
  * Plus the SQL surface: `'…'::interval` / CAST(x AS interval) route to
  * graft_interval, and timestamp arithmetic works on the result. */
class IntervalReferenceConformanceSpec extends SparkTestBase {

  private def p(s: String): (Int, Int, Long) = GraftInterval.parseParts(s)

  private val H = 3600000000L // micros per hour

  test("SQL-standard vectors (year-month / day / h:m[:s] / seconds)") {
    assert(p("120-1 1 15:30") == (1441, 1, 15 * H + 30 * 60000000L))
    assert(p("-120-1 -1 -15:30") == (-1441, -1, -(15 * H + 30 * 60000000L)))
    assert(p("1") == (0, 0, 1000000L)) // bare number = seconds
    assert(p("120-1 1") == (1441, 1, 0L))
    assert(p("-120-1 -1") == (-1441, -1, 0L))
    assert(p("120-1") == (1441, 0, 0L))
    assert(p("-120-1") == (-1441, 0, 0L))
    assert(p("120-1 15:30") == (1441, 0, 15 * H + 30 * 60000000L))
    assert(p("15:30") == (0, 0, 15 * H + 30 * 60000000L))
    assert(p("-15:30") == (0, 0, -(15 * H + 30 * 60000000L)))
    assert(p("15:30:10") == (0, 0, 15 * H + 30 * 60000000L + 10000000L))
    assert(p("1 15:30:10") == (0, 1, 15 * H + 30 * 60000000L + 10000000L))
    assert(p("-1 -15:30:10") == (0, -1, -(15 * H + 30 * 60000000L + 10000000L)))
    assert(p("0-0 0 0:0:0") == (0, 0, 0L)) // parse_invalid_input_3: zero is valid
  }

  test("every reference error vector fails loudly") {
    for (bad <- Seq("1 1", "-1 -1", "10-1-1-1-1-1", "10:1:1:1:N1:1",
        "1-2 3 4-5-6", "A-B C D:E:F", "a week b mons c days",
        "1 week 2 monthss 3 days", "1 week 2 mons 3 days 4w",
        "1y 11:22:33 11:22:33", "2sec 11:22:33",
        "1 years 2 mons 3 days 2 years",
        "5 millis 1 years 2 mons 3 days 2 ms",
        "1 years 2 mons 3 days 2.2 secs 2 ms", "", "  ")) {
      val e = intercept[IllegalArgumentException](p(bad))
      assert(e.getMessage.startsWith("Invalid interval format:"),
        s"'$bad': ${e.getMessage}")
    }
  }

  test("PG verbose / abbreviated / @-ago vectors") {
    assert(p("@ 1 year 1 mon 1 day 1 hour 1 minute 1 secs  ") ==
      (13, 1, H + 60000000L + 1000000L))
    assert(p("@ 1 year 1 mon 1 day 1 hour 1 minute 1 secs 1 millisecond  ") ==
      (13, 1, H + 60000000L + 1000000L + 1000L))
    assert(p("  @ 1 year 1 mon 1 day 1 hour 1 minute 1 secs ago  ") ==
      (-13, -1, -(H + 60000000L + 1000000L)))
    // negative fields; "-3.30 secs" = -3 s -300 ms (reference
    // parseMilliSeconds fraction rule)
    assert(p("@ 1 year -23 hours -3 mins -3.30 secs") ==
      (12, 0, -(23 * H + 3 * 60000000L + 3300000L)))
    assert(p("@ 1 year -23 hours -3 mins -3.30 secs AGO") ==
      (-12, 0, 23 * H + 3 * 60000000L + 3300000L))
    assert(p("@ 1 year -23 hours -3 mins -3 secs -300 msecs AGO") ==
      (-12, 0, 23 * H + 3 * 60000000L + 3300000L))
    // compact form
    assert(p("6 years 5 mons 4 days 03:02:01") ==
      (77, 4, 3 * H + 2 * 60000000L + 1000000L))
    assert(p("1 week") == (0, 7, 0L))
  }

  test("normalization: weeks fold to days, excess time folds to days " +
      "(test_normalization)") {
    // "1y 2mon 3w 763d 1024h 642m 7123s 12ms" → Period(1,2,·,827,4,40,43,12)
    assert(p("1year 2months 3weeks 763days 1024hours 642minutes " +
        "7123seconds 12ms") ==
      (14, 827, 4 * H + 40 * 60000000L + 43000000L + 12000L))
    // tabs + case-insensitivity like the reference's randomized forms
    assert(p("1\tYEAR  2 MONS\t3 W 763 D 1024 H 642 MIN 7123 SEC 12 MS") ==
      (14, 827, 4 * H + 40 * 60000000L + 43000000L + 12000L))
  }

  test("ISO-8601 (joda ISOPeriodFormat cascade leg)") {
    assert(p("P1Y2M3DT4H5M6S") == (14, 3, 4 * H + 5 * 60000000L + 6000000L))
    assert(p("P2W") == (0, 14, 0L))
    assert(p("PT1.5S") == (0, 0, 1500000L))
  }

  test("typed-literal precision (IntervalAnalysisTest ported)") {
    def pp(s: String, a: String = null, b: String = null) =
      GraftInterval.parseParts(s, a, b)
    // string values ROUND to the precision window
    assert(pp("6 years 5 mons 4 days 03:02:01", "year") == (72, 0, 0L))
    assert(pp("2 seconds 200 ms", "minute") == (0, 0, 0L))
    assert(pp("1 day 1 minute 2 seconds 200 ms", "minute") ==
      (0, 1, 60000000L))
    assert(pp("1 minute 2 seconds 200 ms", "minute") == (0, 0, 60000000L))
    assert(pp("6 years 5 mons 4 days 03:02:01", "year", "month") ==
      (77, 0, 0L))
    assert(pp("6 years 5 mons 4 days 03:02:01", "day", "hour") ==
      (77, 4, 3 * H))
    // NUMERIC values take the (start, end) unit directly
    assert(pp("1", "month") == (1, 0, 0L))
    assert(pp("-1", "month") == (-1, 0, 0L))
    assert(pp("1", "hour", "second") == (0, 0, 1000000L))
    assert(pp("100", "day", "second") == (0, 0, 100000000L)) // = 1m40s
    assert(pp("1", "day") == (0, 1, 0L))
    // grammar-level ordering rejection, reference message
    val e = intercept[IllegalArgumentException](pp("1", "month", "year"))
    assert(e.getMessage == "Startfield must be less significant than Endfield")
  }

  test("typed-literal SQL routing: native where identical, graft_interval " +
      "where the reference's semantics differ") {
    graft.functions.GraftFunctions.registerAll(spark)
    def one(sql: String) = Engine.sql(spark, sql).collect()(0)
    // reference: '100' DAY TO SECOND is 100 SECONDS (value takes the
    // end unit) — 2000-01-01 + 100s
    assert(one("SELECT CAST(TIMESTAMP '2000-01-01 00:00:00' " +
      "+ INTERVAL '100' DAY TO SECOND AS STRING) AS t").getString(0)
      .startsWith("2000-01-01 00:01:40"))
    // verbose string + precision rounds: + 6 years exactly
    assert(one("SELECT CAST(TIMESTAMP '2000-01-01 00:00:00' " +
      "+ INTERVAL '6 years 5 mons 4 days 03:02:01' YEAR AS STRING) AS t")
      .getString(0).startsWith("2006-01-01 00:00:00"))
    // signed quoted literal: INTERVAL -'-1' MONTH = +1 month
    assert(one("SELECT CAST(TIMESTAMP '2000-01-01 00:00:00' " +
      "+ INTERVAL -'-1' MONTH AS STRING) AS t").getString(0)
      .startsWith("2000-02-01"))
    // Spark-native forms stay native and correct
    assert(one("SELECT CAST(DATE '2000-01-01' + INTERVAL '60' DAY " +
      "AS STRING) AS t").getString(0).startsWith("2000-03-01"))
    assert(one("SELECT CAST(TIMESTAMP '2000-01-01 00:00:00' " +
      "+ INTERVAL '1-2' YEAR TO MONTH AS STRING) AS t").getString(0)
      .startsWith("2001-03-01"))
  }

  test("display format = the reference PERIOD_FORMATTER doc goldens") {
    import GraftInterval.{formatParts => f}
    // data-types.rst pins these exact renderings
    assert(f(0, 1, 0) == "1 day 00:00:00")
    assert(f(0, -1, 0) == "-1 days 00:00:00") // plural for -1, like joda
    assert(f(0, 0, 1500000L) == "00:00:01.500")
    assert(f(14, 3, (4 * 3600L + 5 * 60 + 6) * 1000000L) ==
      "1 year 2 mons 3 days 04:05:06")
    assert(f(77, 4, (3 * 3600L + 2 * 60 + 1) * 1000000L) ==
      "6 years 5 mons 4 days 03:02:01")
    assert(f(0, 0, 0) == "00:00:00")
    // format ∘ parse round-trips the doc examples
    assert(GraftInterval.formatString(
      org.apache.spark.unsafe.types.UTF8String.fromString("1-2 3 4:05:06"))
      .toString == "1 year 2 mons 3 days 04:05:06")
  }

  test("round-12 review fixes: signed sub-second format, loud overflow") {
    import GraftInterval.{formatParts => f}
    // a negative sub-second value keeps its sign (the seconds+millis
    // field prints as ONE signed value, like joda)
    assert(f(0, 0, -500000L) == "00:00:-00.500")
    assert(p("-0.5") == (0, 0, -500000L))
    // int overflow is LOUD on every leg (the reference's PG leg wraps)
    val e = intercept[ArithmeticException](p("4294967296"))
    assert(e.getMessage.contains("out of range"))
    val e2 = intercept[ArithmeticException](p("9999999999 seconds"))
    assert(e2.getMessage.contains("out of range"))
  }

  test("typed-precision truncation table tail (IntervalAnalysisTest " +
      "DAY/HOUR TO MINUTE/SECOND + seconds_millis + odd vectors)") {
    def pp(s: String, a: String = null, b: String = null) =
      GraftInterval.parseParts(s, a, b)
    val base = "6 years 5 mons 4 days 03:02:01"
    // the full (start, end) truncation table from the analyze tests
    assert(pp(base, "day", "minute") == (77, 4, 3 * H + 2 * 60000000L))
    assert(pp(base, "day", "second") ==
      (77, 4, 3 * H + 2 * 60000000L + 1000000L))
    // HOUR TO MINUTE drops seconds AND the fraction
    assert(pp("6 years 5 mons 4 days 03:02:01.100", "hour", "minute") ==
      (77, 4, 3 * H + 2 * 60000000L))
    assert(pp(base, "hour", "second") ==
      (77, 4, 3 * H + 2 * 60000000L + 1000000L))
    // test_seconds_millis: bare numerics and ms-unit forms normalize
    assert(pp("1") == (0, 0, 1000000L))
    assert(pp("1.1") == (0, 0, 1100000L))
    assert(pp("60.1") == (0, 0, 60100000L)) // 1 min 100 ms
    assert(pp("1000 milliseconds") == (0, 0, 1000000L))
    assert(pp("1 secs 100 ms") == (0, 0, 1100000L))
    assert(pp("60 secs 100 ms") == (0, 0, 60100000L))
    // test_odd: '100.123' SECOND = 1m 40.123s; '101 MILLISECOND' in
    // quotes is 101 ms, numeric '101' with a precision normalizes as
    // seconds
    assert(pp("100.123", "second") == (0, 0, 100123000L))
    assert(pp("101 MILLISECOND") == (0, 0, 101000L))
    assert(pp("101", "second") == (0, 0, 101000000L))
  }

  test("pg wire format (protocols IntervalType): binary triple = the " +
      "parsed (months, days, micros); ordering = toStandardDuration") {
    // writeAsBinary streams exactly (time-micros, weeks*7+days,
    // years*12+months) — the triple graft's parseParts produces; the
    // reference's streaming-round-trip Period(1,2,3,4,5,6,7,8)
    // (y mo w d h mi s ms) therefore IS this triple:
    assert(GraftInterval.parseParts(
      "1 year 2 mons 3 weeks 4 days 05:06:07.008") ==
      (14, 25, 5 * H + 6 * 60000000L + 7000000L + 8000L))
    // test_compare, ported with the same component arithmetic the
    // reference Periods use (months → 30 days, YEARS → 365 days —
    // toStandardDuration's code, IntervalType.java:182-183; ADVICE r13
    // high: graft used to weigh years at 12*30=360 days). The triple
    // carries TOTAL months, so the key re-derives the normalized split
    // (y = m/12, mo = m%12) — both vectors here resolve to the same
    // derived years, so the reference's raw-field sums and graft's
    // normalized sums shift by the SAME constant and every comparison
    // verdict is preserved:
    def key(y: Int, mo: Int, w: Int, d: Int, h: Int, mi: Int, s: Int,
            ms: Int) =
      GraftInterval.orderKey(y * 12 + mo, w * 7 + d,
        (h * 3600L + mi * 60L + s) * 1000000L + ms * 1000L)
    val p1 = key(1, 13, 8, 568, 128, 678, 91234, 1234567)
    val p2 = key(1, 16, 68, 64, 20, 59, 8, 567)
    assert(p1.compare(p2) == 0, s"$p1 != $p2") // wildly different fields, equal duration
    assert(p1.compare(key(1, 17, 68, 64, 20, 59, 8, 567)) < 0)
    assert(key(1, 13, 8, 568, 129, 678, 91234, 1234567).compare(p2) > 0)
    // UNEQUAL-YEARS vectors (the ADVICE r13 gap — the reference test
    // holds years equal on both operands, so the 360-vs-365 bug was
    // invisible to it): '1 year' must outrank '363 days' (365 > 363,
    // where the 360-day formula inverted it) and stay under '366 days'
    def k1(s: String) = GraftInterval.orderKeyString(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(k1("1 year").compare(k1("363 days")) > 0)
    assert(k1("1 year").compare(k1("366 days")) < 0)
    assert(k1("1 year").toBigDecimal.bigDecimal.longValueExact == 31536000000000L)
    // parse normalizes 12 mons into a year (joda normalizedStandard),
    // so '12 mons' == '1 year' == 365 days; 11 mons stays 330 days
    assert(k1("12 mons").compare(k1("1 year")) == 0)
    assert(k1("11 mons").toBigDecimal.bigDecimal.longValueExact == 330L * 86400000000L)
    // negative side mirrors (truncation toward zero on both engines)
    assert(k1("-1 year").compare(k1("-363 days")) < 0)
    assert(k1("-13 mons").toBigDecimal.bigDecimal.longValueExact ==
      -(365L + 30L) * 86400000000L)
    // SQL surface: graft_interval_order on strings and intervals
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT graft_interval_order('1 mon') AS a, " +
        "graft_interval_order('30 days') AS b, " +
        "graft_interval_order('-2:00') AS c, " +
        "graft_interval_order(graft_interval('P1DT-2H')) AS d").collect()(0)
    assert(r.getDecimal(0) == r.getDecimal(1)) // 30-day months
    assert(r.getDecimal(2).longValueExact == -7200000000L)
    assert(r.getDecimal(3).longValueExact == 79200000000L)
  }

  test("round-13 review fixes: mixed-sign day/time normalization, " +
      "precision whitelist blocks codegen injection") {
    // Period.normalizedStandard folds DAYS into the time total before
    // re-splitting, so opposite-sign day/time inputs collapse (ADVICE
    // r12: graft used to keep (1 day, -02:00:00))
    assert(p("1 -2:00") == (0, 0, 22 * H))
    assert(p("P1DT-2H") == (0, 0, 22 * H))
    assert(p("-1 2:00") == (0, 0, -22 * H))
    assert(p("P-1DT26H") == (0, 0, 2 * H))
    assert(p("2 days -30:00:00") == (0, 0, 18 * H))
    assert(GraftInterval.formatParts(0, 0, 22 * H) == "22:00:00")
    // same-sign folds unchanged
    assert(p("1 2:00") == (0, 1, 2 * H))
    // a non-grammar precision string is rejected in the CONSTRUCTOR —
    // before doGenCode could splice it into generated Java (ADVICE r12)
    graft.functions.GraftFunctions.registerAll(spark)
    val e = intercept[Exception](Engine.sql(spark,
      "SELECT graft_interval('1', 'ho\"ur') AS x").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null &&
      m.contains("Invalid interval precision")), msgs(e).mkString(" | "))
    val e2 = intercept[Exception](Engine.sql(spark,
      "SELECT graft_interval_parts('1', 'hour', 'bogus') AS x").collect())
    assert(msgs(e2).exists(m => m != null &&
      m.contains("Invalid interval precision")), msgs(e2).mkString(" | "))
  }

  test("SQL surface: ::interval and CAST AS interval route; ts arithmetic") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT graft_interval_parts('120-1 1 15:30') AS p, " +
        "TIMESTAMP '2000-01-01 00:00:00' + '1-2 3'::interval AS t1, " +
        "CAST('2000-01-01 00:00:00' AS TIMESTAMP) " +
        "  + CAST('@ 1 year 1 mon 1 day 1 hour ago' AS interval) AS t2")
      .collect()(0)
    val parts = r.getStruct(0)
    assert(parts.getInt(0) == 1441 && parts.getInt(1) == 1 &&
      parts.getLong(2) == 15 * H + 30 * 60000000L)
    assert(r.getTimestamp(1).toString.startsWith("2001-03-04 00:00:00"))
    assert(r.getTimestamp(2).toString.startsWith("1998-11-29 23:00:00"))
  }
}
