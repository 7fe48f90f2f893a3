package graft

import graft.plans.GraftInterval
import org.apache.spark.unsafe.types.CalendarInterval

/** The reference's interval arithmetic surface ported as behavioral
  * goldens (server/src/test/java/io/crate/expression/scalar/arithmetic/
  * IntervalFunctionTest.java + IntervalPercentileAggregationTest.java):
  *  - interval ± interval = joda Period::plus/minus — FIELD-WISE, no
  *    post-normalization (IntervalArithmeticFunctions.java:52);
  *  - interval × integer = Period.multipliedBy + normalizedStandard,
  *    per-field int multiply with joda's exact overflow message;
  *    fractional factors implicit-cast by truncation;
  *  - timestamp − timestamp → interval (SubtractTimestampScalar:
  *    duration split into days + time, no months);
  *  - interval percentile = percentile over the standard-duration
  *    total, back-converted via Period(millis).normalizedStandard.
  * Every vector is value-or-named-divergence; the three documented
  * divergences are LOUD (CalendarInterval's total-months int limit on
  * ×, exact interpolation where the reference's TDigest approximates,
  * and addition display of un-normalized sums — graft's value equals
  * what the reference's own pg WIRE encoding sends, which collapses
  * the time fields into one micros total). */
class IntervalArithmeticConformanceSpec extends SparkTestBase {

  private def p(s: String): CalendarInterval =
    GraftInterval.parse(org.apache.spark.unsafe.types.UTF8String.fromString(s))
  private def t(ci: CalendarInterval): (Int, Int, Long) =
    (ci.months, ci.days, ci.microseconds)
  private val H = 3600000000L

  test("interval + / - interval (test_interval_to_interval)") {
    import GraftInterval.{add, subtract}
    assert(t(add(p("1 second"), p("1 second"))) == (0, 0, 2000000L))
    assert(t(add(p("1000 millisecond"), p("1 second"))) == (0, 0, 2000000L))
    assert(t(add(p("1000 millisecond"), p("1000 millisecond"))) ==
      (0, 0, 2000000L))
    assert(t(add(p("1100 years"), p("2000 years"))) == (3100 * 12, 0, 0L))
    assert(t(add(p("-10 years"), p("1 years"))) == (-9 * 12, 0, 0L))
    assert(t(subtract(p("2 second"), p("1 second"))) == (0, 0, 1000000L))
    assert(t(subtract(p("2 millisecond"), p("1 millisecond"))) ==
      (0, 0, 1000L))
    assert(t(subtract(p("-1 second"), p("-1 second"))) == (0, 0, 0L))
    assert(t(add(p("1 month"), p("1 year"))) == (13, 0, 0L))
    // NO normalization after ± (Period::plus is field-wise): 40 hours
    // stays 40:00:00, and the display agrees
    assert(t(add(p("20 hours"), p("20 hours"))) == (0, 0, 40 * H))
    assert(GraftInterval.formatParts(0, 0, 40 * H) == "40:00:00")
    // mixed-sign field-wise subtraction keeps the fields
    assert(t(subtract(p("1 day"), p("2 hours"))) == (0, 1, -2 * H))
    assert(GraftInterval.formatParts(0, 1, -2 * H) == "1 day -02:00:00")
  }

  test("interval * integer (test_multiply_by_integer + normalization)") {
    import GraftInterval.multiply
    assert(t(multiply(p("2 years 1 month 10 days"), 2)) == (50, 20, 0L))
    assert(t(multiply(p("10 second"), 0)) == (0, 0, 0L))
    assert(t(multiply(p("1 day"), -10)) == (0, -10, 0L))
    // MULTIPLICATION normalizes (unlike ±): 900 × 1s = 15:00, 2 × 20h
    // = 1 day 16:00 (test_normalize_multiplication_result)
    assert(t(multiply(p("1 second"), 900)) == (0, 0, 900000000L))
    assert(GraftInterval.formatParts(0, 0, 900000000L) == "00:15:00")
    assert(t(multiply(p("20 hours"), 2)) == (0, 1, 16 * H))
    assert(t(multiply(p("1000 millisecond"), 900)) == (0, 0, 900000000L))
    // joda's exact per-field overflow message (test_multiplication_
    // overflow): the seconds field is an int even though the micros
    // total would fit a long
    val e = intercept[ArithmeticException](multiply(p("2 second"), 2147483647))
    assert(e.getMessage == "Multiplication overflows an int: 2 * 2147483647")
    val e2 = intercept[ArithmeticException](multiply(p("2 second"), -2147483648))
    assert(e2.getMessage == "Multiplication overflows an int: 2 * -2147483648")
    // DOCUMENTED DIVERGENCE: the reference multiplies years/months as
    // separate int fields, so 2147483647 × '1 year' succeeds there;
    // CalendarInterval carries total months (12 × k overflows) — LOUD
    val e3 = intercept[ArithmeticException](multiply(p("1 year"), 2147483647))
    assert(e3.getMessage == "Multiplication overflows an int: 12 * 2147483647")
  }

  test("fractional multiplier implicit-casts by truncation " +
      "(test_implicit_cast_to_integer_while_multiplying_by_double)") {
    assert(GraftInterval.factorToInt(3.5d) == 3)
    assert(GraftInterval.factorToInt(3.5f) == 3)
    assert(GraftInterval.factorToInt(-2.9d) == -2)
    assert(t(GraftInterval.multiply(p("1 hour"), GraftInterval.factorToInt(3.5d)))
      == (0, 0, 3 * H))
    // IntegerType.implicitCast range semantics (ADVICE r13: Scala's
    // saturating toInt silently turned 1e12 into Int.MaxValue): out of
    // int32 range is LOUD with the reference's message, for doubles,
    // floats, longs, and decimals alike
    for (badVal <- Seq(1e12, 2.2e9, -2.3e9, Double.PositiveInfinity,
        Double.NegativeInfinity)) {
      val e = intercept[IllegalArgumentException](
        GraftInterval.factorToInt(badVal))
      assert(e.getMessage.startsWith("integer value out of range"), badVal)
    }
    intercept[IllegalArgumentException](GraftInterval.factorToInt(1L << 40))
    intercept[IllegalArgumentException](GraftInterval.factorToInt(
      org.apache.spark.sql.types.Decimal("3000000000")))
    assert(GraftInterval.factorToInt(
      org.apache.spark.sql.types.Decimal("3.9")) == 3)
    // faithful corner of the reference's Number.longValue() path:
    // Double.NaN.longValue() is 0 in Java, so a NaN multiplier maps to
    // 0 there — ported as-is, not rejected
    assert(GraftInterval.factorToInt(Double.NaN) == 0)
    // boundary values pass exactly
    assert(GraftInterval.factorToInt(2147483647L) == Int.MaxValue)
    assert(GraftInterval.factorToInt(-2147483648L) == Int.MinValue)
  }

  test("multiply keeps the sub-millisecond remainder (ADVICE r13: " +
      "graft_ts_diff produces micros-precision intervals)") {
    import GraftInterval.multiply
    // 1.000001 s: the reference's joda Period cannot hold sub-ms, but
    // graft's own ts_diff output can — identity must be lossless
    val iv = new org.apache.spark.unsafe.types.CalendarInterval(
      0, 0, 1000001L)
    assert(t(multiply(iv, 1)) == (0, 0, 1000001L))
    assert(t(multiply(iv, 3)) == (0, 0, 3000003L))
    val negIv = new org.apache.spark.unsafe.types.CalendarInterval(
      0, 0, -1500L)
    assert(t(multiply(negIv, 2)) == (0, 0, -3000L))
    // the remainder scales with k and folds into days when it carries
    val dayIv = new org.apache.spark.unsafe.types.CalendarInterval(
      0, 0, 86399999500L) // 1 day minus 500 us
    assert(t(multiply(dayIv, 2)) == (0, 1, 86399999000L))
  }

  test("SQL surface: add/sub/mul/ts_diff + null propagation") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT graft_interval_format(graft_interval_add(" +
        "  graft_interval('1 month'), graft_interval('1 year'))) AS a, " +
        "graft_interval_format(graft_interval_mul(" +
        "  graft_interval('2 years 1 month 10 days'), 2)) AS m, " +
        "graft_interval_format(graft_interval_mul(" +
        "  graft_interval('1 hour'), 3.5)) AS f, " +
        "graft_interval_format(graft_ts_diff(" +
        "  TIMESTAMP '2000-03-02 02:30:00', " +
        "  TIMESTAMP '2000-01-01 00:00:00')) AS d, " +
        "graft_interval_add(NULL, graft_interval('1 second')) AS n1, " +
        "graft_interval_mul(graft_interval('1 second'), " +
        "  CAST(NULL AS INT)) AS n2").collect()(0)
    assert(r.getString(0) == "1 year 1 mon 00:00:00")
    assert(r.getString(1) == "4 years 2 mons 20 days 00:00:00")
    assert(r.getString(2) == "03:00:00")
    // ts − ts: pure duration (61 days + 2:30), NO months
    assert(r.getString(3) == "61 days 02:30:00")
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("timestamp ± interval vectors (test_timestamp_interval, on the " +
      "epoch-millis timestamps the reference casts)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT CAST(timestamp_millis(86400000) + graft_interval('1 second') " +
        "AS STRING) AS a, " +
        "CAST(timestamp_millis(86401000) - graft_interval('1 second') " +
        "AS STRING) AS b, " +
        "CAST(timestamp_millis(86400000) - graft_interval('-1 second') " +
        "AS STRING) AS c, " +
        "CAST(timestamp_millis(86400000) - graft_interval('1000 years') " +
        "AS STRING) AS d").collect()(0)
    assert(r.getString(0).startsWith("1970-01-02 00:00:01"))
    assert(r.getString(1).startsWith("1970-01-02 00:00:00"))
    assert(r.getString(2).startsWith("1970-01-02 00:00:01"))
    // calendar-aware: 1970-01-02 − 1000 years = 0970-01-02 =
    // -31556822400000 ms in the reference's proleptic arithmetic
    assert(r.getString(3).startsWith("0970-01-02 00:00:00"))
  }

  test("interval percentile (IntervalPercentileAggregationTest; exact " +
      "interpolation where the reference's TDigest approximates)") {
    graft.functions.GraftFunctions.registerAll(spark)
    import spark.implicits._
    // reference testPercentileWithDaysAndHours: {1d, 2d12h, 5d6h} p50
    // = 2 days 12:00 — the middle value, identical under TDigest and
    // exact interpolation
    val df = Seq("1 days", "2 days 12:00:00", "5 days 06:00:00")
      .toDF("iv")
    df.createOrReplaceTempView("ivp")
    val r = Engine.sql(spark,
      "SELECT graft_interval_format(graft_interval_from_micros(" +
        "percentile(CAST(graft_interval_order(iv) AS DOUBLE), 0.5))) AS p50 " +
        "FROM ivp").collect()(0)
    assert(r.getString(0) == "2 days 12:00:00")
    // hours 1..10 at p50: the reference's TDigest answers 6:00 —
    // DOCUMENTED DIVERGENCE: exact interpolation answers 5:30 (and is
    // what DuckDB quantile_cont replays); same discipline as q37
    val hrs = (1 to 10).map(i => s"$i hours").toDF("iv")
    hrs.createOrReplaceTempView("ivp2")
    val r2 = Engine.sql(spark,
      "SELECT graft_interval_format(graft_interval_from_micros(" +
        "percentile(CAST(graft_interval_order(iv) AS DOUBLE), 0.5))) AS p50 " +
        "FROM ivp2").collect()(0)
    assert(r2.getString(0) == "05:30:00")
  }
}
