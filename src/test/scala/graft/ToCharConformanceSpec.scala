package graft

/** The reference's full PG to_char template engine, ported arm-for-arm
  * from ToCharFunctionTest + ToCharFunctionPostgresCompatabilityTest
  * (expression/scalar/formatting): hour/fraction/AM-PM families,
  * year/ISO-year truncations, month/day name casing with PG's
  * fixed-width padding, week/century/Julian/quarter/Roman tokens,
  * TH/th ordinal suffixes with the 11/12/13 special cases, quoted
  * literals, INTERVAL formatting anchored at year 0, lowercase
  * patterns, strict nulls. */
class ToCharConformanceSpec extends SparkTestBase {

  private def tc(args: String): String = {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark, s"SELECT to_char($args) AS a").collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }
  private val T = "timestamp '1970-01-01T17:31:12.12345'"

  test("hours, minutes, seconds, fractions (PG-compat suite)") {
    assert(tc(s"$T, 'HH HH12 HH24'") == "05 05 17")
    assert(tc("timestamp '1970-01-01T03:31:12.12345', 'HH HH12 HH24'") == "03 03 03")
    assert(tc("timestamp '1970-01-01T17:05:12.12345', 'MI'") == "05")
    assert(tc("timestamp '1970-01-01T17:31:05.72345', 'SS'") == "05")
    assert(tc(s"$T, 'MS'") == "123")
    assert(tc("timestamp '1970-01-01T17:31:12.003', 'MS'") == "003")
    assert(tc("timestamp '1970-01-01T17:31:12.0002', 'MS'") == "000")
    // the reference's timestamp TYPE is millis-resolution, so its
    // suite reads "123000"/"000000" here; our timestamps carry micros
    // and the same FORMATTER renders the extra precision — identical
    // output for any value the reference type can hold
    assert(tc(s"$T, 'US'") == "123450")
    assert(tc("timestamp '1970-01-01T17:31:12.00005', 'US'") == "000050")
    assert(tc(s"$T, 'FF1 FF2 FF3 FF4 FF5 FF6'") == "1 12 123 1234 12345 123450")
    assert(tc(s"$T, 'SSSS, SSSSS'") == "63072, 63072")
  }

  test("AM/PM, eras, years, ISO years (PG-compat suite)") {
    assert(tc(s"$T, 'AM am PM pm A.M. a.m. P.M. p.m.'") ==
      "PM pm PM pm P.M. p.m. P.M. p.m.")
    assert(tc("timestamp '1970-01-01T03:31:12.12345', 'AM am'") == "AM am")
    assert(tc(s"$T, 'Y,YYY YYYY YYY YY Y'") == "1,970 1970 970 70 0")
    assert(tc(s"$T, 'IYYY IYY IY I'") == "1970 970 70 0")
    assert(tc("timestamp '1971-01-03T17:31:12.12345', 'IYYY IYY IY I'") ==
      "1970 970 70 0")
    assert(tc("timestamp '1971-01-04T17:31:12.12345', 'IYYY IYY IY I'") ==
      "1971 971 71 1")
    // "B.C." spells pattern B.C + literal '.'
    assert(tc(s"$T, 'BC bc AD ad B.C. b.c. A.D. a.d.'") ==
      "AD ad AD ad A.D. a.d. A.D. a.d.")
  }

  test("month/day names with PG fixed-width padding (PG-compat suite)") {
    assert(tc(s"$T, 'MONTH Month month'") == "JANUARY January january")
    assert(tc(s"$T, 'MON Mon mon'") == "JAN Jan jan")
    assert(tc(s"$T, 'MM'") == "01")
    assert(tc(s"$T, 'DAY Day day'") == "THURSDAY Thursday thursday")
    assert(tc(s"$T, 'DY Dy dy'") == "THU Thu thu")
    // MONTH pads to 7, DAY to 8: May/short names show the fill
    assert(tc("timestamp '1970-05-04T00:00:00', 'MONTH'") == "MAY    ")
    assert(tc("timestamp '1970-05-04T00:00:00', 'DAY'") == "MONDAY  ")
  }

  test("day/week/century/julian/quarter/roman tokens (PG-compat suite)") {
    assert(tc(s"$T, 'DDD IDDD'") == "001 004")
    assert(tc("timestamp '1970-08-01T17:31:12.12345', 'DDD IDDD'") == "213 216")
    assert(tc(s"$T, 'DD'") == "01")
    assert(tc(s"$T, 'D ID'") == "5 4")
    assert(tc("timestamp '1970-01-04T17:31:12.12345', 'D ID'") == "1 7")
    assert(tc("timestamp '1970-01-05T17:31:12.12345', 'D ID'") == "2 1")
    assert(tc("timestamp '1970-01-15T17:31:12.12345', 'W'") == "3")
    assert(tc("timestamp '1970-01-31T17:31:12.12345', 'W'") == "5")
    assert(tc(s"$T, 'WW IW'") == "01 01")
    assert(tc("timestamp '1970-08-01T17:31:12.12345', 'WW IW'") == "31 31")
    assert(tc("timestamp '1971-01-01T17:31:12.12345', 'WW IW'") == "01 53")
    assert(tc(s"$T, 'CC'") == "20")
    assert(tc("timestamp '2024-12-13T00:00:00', 'cc'") == "21")
    assert(tc("timestamp '2024-12-13T00:00:00', 'j'") == "2460658")
    assert(tc("timestamp '2024-12-13T00:00:00', 'q'") == "4")
    assert(tc("timestamp '1970-09-01T00:00:00', 'RM rm'") == "IX   ix  ")
    // century boundaries and Julian anchors (PG-compat suite)
    assert(tc("timestamp '2000-01-01T17:31:12.12345', 'CC'") == "20")
    assert(tc("timestamp '2001-01-01T17:31:12.12345', 'CC'") == "21")
    assert(tc(s"$T, 'J'") == "2440588")
    assert(tc("timestamp '2000-01-01T17:31:12.12345', 'J'") == "2451545")
    assert(tc("timestamp '1970-12-01T00:00:00', 'RM rm'") == "XII  xii ")
    // zone tokens render NOTHING (local datetimes) — literals survive
    assert(tc(s"$T, 'TZ tz'") == " ")
    assert(tc(s"$T, 'TZH TZM'") == " ")
    assert(tc(s"$T, 'OF'") == "")
  }

  test("lowercase patterns and literals (test_lower_case_patterns)") {
    assert(tc("'2024-12-13'::timestamp, 'yyyy-mm-dd'") == "2024-12-13")
    assert(tc("'2024-12-13'::timestamp, 'mm'") == "12")
    assert(tc("'2024-12-13'::timestamp, 'miss-'") == "0000-")
    assert(tc("'2024-12-13'::timestamp, 'd'") == "6")
    assert(tc("'2024-12-13'::timestamp, 'w'") == "2")
    assert(tc("timestamp '1970-01-01T17:31:12.12345', 'Day,  DD  HH12:MI:SS'") ==
      "Thursday,  01  05:31:12")
  }

  test("TH/th ordinal suffixes (testOrdinalSuffixTh)") {
    assert(tc("timestamp '2024-01-15', 'DDth'") == "15th")
    assert(tc("timestamp '2024-01-15', 'DDTH'") == "15TH")
    assert(tc("timestamp '2024-01-11', 'DDth'") == "11th")
    assert(tc("timestamp '2024-01-12', 'DDth'") == "12th")
    assert(tc("timestamp '2024-01-13', 'DDth'") == "13th")
    assert(tc("timestamp '2024-01-21', 'DDth'") == "21st")
    assert(tc("timestamp '2024-01-22', 'DDth'") == "22nd")
    assert(tc("timestamp '2024-01-23', 'DDth'") == "23rd")
  }

  test("quoted literals and the TH-in-THH quirk (quoted-literal arms)") {
    assert(tc("timestamp '2005-05-28T20:57:00', 'YYYY-MM-DD\"T\"HH:MI:SSZ'") ==
      "2005-05-28T08:57:00Z")
    // unquoted T consumes as the TH ordinal token (suffix of DD=28)
    assert(tc("timestamp '2005-05-28T20:57:00', 'YYYY-MM-DDTHH:MI:SSZ'") ==
      "2005-05-28THH:57:00Z")
    // empty quoted literal splits tokens and resets the TH memory
    assert(tc("timestamp '2024-01-15', 'DD\"\"MM'") == "1501")
  }

  test("intervals format anchored at year 0 (testEvaluateInterval)") {
    assert(tc("interval '2 year', 'yyyy'") == "0002")
    assert(tc("INTERVAL '1 year 2 months 3 weeks 5 hours 6 minutes 7 seconds', 'yyyy'") ==
      "0001")
    assert(tc("INTERVAL '1 year 2 months 3 weeks 5 hours 6 minutes 7 seconds', " +
      "'YYYY MM DD HH12:MI:SS'") == "0001 03 22 05:06:07")
    assert(tc("INTERVAL '1 year 2 months 3 weeks 5 hours 6 minutes 7 seconds 334 milliseconds', " +
      "'YYYY MM DD HH12:MI:SS.MS'") == "0001 03 22 05:06:07.334")
    assert(tc("INTERVAL '1 year 2 months 3 weeks 5 hours 6 minutes 7 seconds 1334 milliseconds', " +
      "'YYYY MM DD HH12:MI:SS.MS'") == "0001 03 22 05:06:08.334")
  }

  test("strict nulls (testEvaluateTimestampWithNullPattern)") {
    assert(tc("timestamp '1970-01-01T17:31:12', CAST(NULL AS STRING)") == null)
    assert(tc("CAST(NULL AS TIMESTAMP), 'YYYY'") == null)
  }
}
